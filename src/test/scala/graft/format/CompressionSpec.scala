package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Per-record zstd compression (`hadro.compress=zstd`, fixed at creation):
  * payloads shrink behind a self-describing flag bit, so every byte-offset
  * structure — split points, the key→offset index, deletion-vector row
  * indices — stays exact, and every read path decompresses transparently
  * inside the frame parser. At 100 TB a text corpus scan moves a fraction
  * of the bytes. */
class CompressionSpec extends SparkSuite {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("compressed collection round-trips exactly and shrinks on disk") {
    val plain = Files.createTempDirectory("zstd_plain").resolve("c").toString
    val comp = Files.createTempDirectory("zstd_comp").resolve("c").toString
    docs.coalesce(1).write.format("hadro").mode("append").save(plain)
    docs.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd").save(comp)

    def dataBytes(p: String): Long =
      CollectionMeta.currentManifest(java.nio.file.Paths.get(p)).segments.map(_.bytes).sum
    assert(dataBytes(comp) < dataBytes(plain),
      s"zstd must shrink text segments: ${dataBytes(comp)} vs ${dataBytes(plain)}")

    val a = spark.read.format("hadro").load(plain).orderBy("doc_id").collect().toSeq
    val b = spark.read.format("hadro").load(comp).orderBy("doc_id").collect().toSeq
    assert(a == b, "compressed read must be byte-identical")
  }

  test("point lookups and splits stay exact over compressed segments") {
    val path = Files.createTempDirectory("zstd_keyed").resolve("c").toString
    docs.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd")
      .option("hadro.key", "doc_id")
      .option("hadro.splitBytes", "65536") // force several split ranges
      .save(path)
    val c = Collection(spark, path)
    val got = c.get(42L).select($"text").as[String].head()
    val want = docs.filter($"doc_id" === 42L).select($"text").as[String].head()
    assert(got == want)
    // split-ranged scan covers everything exactly once
    assert(c.scan().count() == docs.count())
    // mutation paths ride the same writer: tombstone + re-read
    c.delete(7L)
    assert(c.toDF().filter($"doc_id" === 7L).isEmpty)
    assert(c.toDF().count() == docs.count() - 1)
  }

  test("zstd-dict trains a per-segment dictionary and beats plain zstd on small records") {
    val plain = Files.createTempDirectory("zd_plain").resolve("c").toString
    val dict = Files.createTempDirectory("zd_dict").resolve("c").toString
    // small structured records: exactly where a lone zstd frame loses and a
    // shared dictionary wins
    val rows = spark.range(0, 5000, 1, 1).selectExpr("id",
      "concat('user-', cast(id % 97 as string), '@example-corp.com') AS email",
      "concat('GET /api/v2/resource/', cast(id as string), ' HTTP/1.1 200') AS line")
    rows.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd").save(plain)
    rows.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd-dict").save(dict)

    def dataBytes(p: String): Long =
      CollectionMeta.currentManifest(java.nio.file.Paths.get(p)).segments.map(_.bytes).sum
    val (pb, db) = (dataBytes(plain), dataBytes(dict))
    assert(db < pb, s"dictionary must beat plain zstd on small records: $db vs $pb")

    // sidecar recorded in the manifest and present on disk
    val seg = CollectionMeta.currentManifest(java.nio.file.Paths.get(dict)).segments.head
    assert(seg.dict.nonEmpty, "trained segment must record its .zdict sidecar")
    assert(Files.exists(java.nio.file.Paths.get(dict).resolve(seg.dict.get)))

    // mixed plain/dict records (pre-training head) round-trip exactly
    val a = rows.orderBy("id").collect().toSeq
    val b = spark.read.format("hadro").load(dict).orderBy("id").collect().toSeq
    assert(a == b, "dict-compressed read must be byte-identical")

    // clone carries the dictionary sidecar (allFiles contract)
    val cl = Files.createTempDirectory("zd_clone").resolve("c").toString
    Collection(spark, dict).cloneTo(cl)
    val cseg = CollectionMeta.currentManifest(java.nio.file.Paths.get(cl)).segments.head
    assert(cseg.dict.nonEmpty &&
      Files.exists(java.nio.file.Paths.get(cl).resolve(cseg.dict.get)))
    assert(spark.read.format("hadro").load(cl).count() == 5000)
  }

  test("publish keeps dict sidecars live through its GC cycle") {
    // WAP on a dict-compressed collection: the publish's live set must
    // include .zdict sidecars, or a later purge deletes them from under
    // the committed manifest
    val prod = Files.createTempDirectory("zd_pub").resolve("prod").toString
    val rows = spark.range(0, 5000, 1, 1).selectExpr("id",
      "concat('record-', cast(id as string), '-with-shared-template-context-長-') AS v")
    rows.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd-dict").save(prod)
    val stage = Files.createTempDirectory("zd_pub").resolve("stage").toString
    Collection(spark, prod).cloneTo(stage)
    spark.range(5000, 6000, 1, 1)
      .selectExpr("id", "concat('record-', cast(id as string), '-late-') AS v")
      .coalesce(1).write.format("hadro").mode("append").save(stage)

    val c = Collection(spark, prod)
    c.publishFrom(stage)
    c.publishFrom(stage) // second publish purges the first's deferred list
    c.vacuum()
    // every manifest-referenced dict sidecar survived the GC cycles
    val p = java.nio.file.Paths.get(prod)
    CollectionMeta.currentManifest(p).segments.flatMap(_.dict).foreach(d =>
      assert(Files.exists(p.resolve(d)), s"live dict sidecar $d purged"))
    assert(spark.read.format("hadro").load(prod).count() == 6000)
    assert(spark.read.format("hadro").load(prod)
      .selectExpr("max(length(v))").head.getInt(0) > 0)
  }

  test("a tiny zstd-dict segment that never trains stays plain and readable") {
    val path = Files.createTempDirectory("zd_tiny").resolve("c").toString
    docs.limit(20).coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd-dict").save(path)
    val seg = CollectionMeta.currentManifest(java.nio.file.Paths.get(path)).segments.head
    assert(seg.dict.isEmpty, "under the training budget: no sidecar")
    assert(spark.read.format("hadro").load(path).count() == 20)
  }

  test("a dict-compressed segment with a missing sidecar fails loudly") {
    val path = Files.createTempDirectory("zd_missing").resolve("c").toString
    spark.range(0, 5000, 1, 1).selectExpr("id",
      "concat('row-', cast(id as string), " +
        "'-a-much-longer-shared-payload-template-with-enough-context-" +
        "to-clear-the-dictionary-compression-minimum-') AS v")
      .coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd-dict").save(path)
    val p = java.nio.file.Paths.get(path)
    val seg = CollectionMeta.currentManifest(p).segments.head
    assume(seg.dict.nonEmpty) // trained (above the sample budget)
    Files.delete(p.resolve(seg.dict.get))
    val e = intercept[Exception] {
      // a REAL data scan (count() alone is answered from the manifest)
      spark.read.format("hadro").load(path).select("v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(messages(e).exists(_.contains("zdict")),
      s"expected a sidecar error, got: ${messages(e).mkString(" | ")}")
  }

  test("compaction rewrites stay compressed") {
    val path = Files.createTempDirectory("zstd_compact").resolve("c").toString
    val plain = Files.createTempDirectory("zstd_compact_ref").resolve("c").toString
    docs.repartition(3).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd").save(path)
    docs.repartition(3).write.format("hadro").mode("append").save(plain)
    val c = Collection(spark, path)
    c.compact()
    val cp = Collection(spark, plain); cp.compact()
    def bytes(p: String) = CollectionMeta
      .currentManifest(java.nio.file.Paths.get(p)).segments.map(_.bytes).sum
    assert(bytes(path) < bytes(plain),
      "post-compaction segments must still be compressed")
    assert(spark.read.format("hadro").load(path).orderBy("doc_id").collect().toSeq
      == docs.orderBy("doc_id").collect().toSeq)
  }

  test("a corrupt compressed payload fails loudly, not with wrong rows") {
    val path = Files.createTempDirectory("zstd_corrupt").resolve("c").toString
    docs.limit(20).coalesce(1).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd").save(path)
    val seg = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
      .segments.head
    val f = java.nio.file.Paths.get(path).resolve(seg.file)
    val bytes = Files.readAllBytes(f)
    // flip bytes in the middle of the file — inside some record's frame
    val mid = bytes.length / 2
    (mid until math.min(mid + 8, bytes.length)).foreach(i =>
      bytes(i) = (bytes(i) ^ 0x5a).toByte)
    Files.write(f, bytes)
    // the contract is LOUD failure (zstd frame error, bounds check, or
    // framing EOF depending on which bytes the flip hit) — never a
    // silent wrong-rows read
    intercept[Exception] {
      spark.read.format("hadro").load(path).collect()
    }
  }

  test("the codec is fixed at creation and survives evolution") {
    val path = Files.createTempDirectory("zstd_fixed").resolve("c").toString
    docs.limit(10).write.format("hadro").mode("append")
      .option("hadro.compress", "zstd").save(path)
    // silently flipping the codec is refused
    val ex = intercept[Exception] {
      docs.limit(5).write.format("hadro").mode("append")
        .option("hadro.compress", "none").save(path)
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(e => Option(e.getMessage)).exists(_.contains("compression")))
    // plain appends inherit the stored codec; ALTER keeps the property
    docs.limit(5).withColumn("doc_id", $"doc_id" + 100000L)
      .write.format("hadro").mode("append").save(path)
    val c = Collection(spark, path)
    c.addColumn("extra", org.apache.spark.sql.types.StringType)
    val meta = CollectionMeta.readSchema(java.nio.file.Paths.get(path)).get
    assert(meta.compress.contains("zstd"), "evolution must not drop the codec")
    assert(spark.read.format("hadro").load(path).count() == 15)
    // the codec is visible as a table property (DESCRIBE EXTENDED surface)
    val t = new graft.spark.HadroTable(java.nio.file.Paths.get(path),
      spark.read.format("hadro").load(path).schema)
    assert(t.properties().get("compress") == "zstd")
  }
}
