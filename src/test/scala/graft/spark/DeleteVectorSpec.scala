package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Deletion vectors: merge-on-read row-level delete for non-keyed
  * collections (`spark.hadro.delete.mode=dv`). A DELETE writes one bitmap
  * sidecar per affected segment instead of rewriting segment bytes; readers
  * skip vectored rows on both the row and columnar paths; sidecars are
  * immutable so retained versions time-travel exactly. */
class DeleteVectorSpec extends SparkSuite {
  import spark.implicits._

  private def withDvMode[A](body: => A): A = {
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try body finally spark.conf.unset("spark.hadro.delete.mode")
  }

  private def catalogTable(name: String): (String, java.nio.file.Path) = {
    val wh = Files.createTempDirectory("dv_wh").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[HadroCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    (wh, java.nio.file.Paths.get(wh, "db", "t"))
  }

  test("dv delete hides rows without rewriting segments; cow stays default") {
    val (_, dir) = catalogTable("dvcat")
    spark.sql("CREATE TABLE dvcat.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO dvcat.db.t SELECT id, id * 1.0 FROM range(0, 500, 1, 4)")
    val before = CollectionMeta.currentManifest(dir)
    assert(before.segments.nonEmpty)

    withDvMode {
      // a V1-translatable predicate: only SupportsDeleteV2.deleteWhere has
      // the dv hook (untranslatable predicates route to the row-level CoW op)
      spark.sql("DELETE FROM dvcat.db.t WHERE id >= 100 AND id < 150")
    }
    val after = CollectionMeta.currentManifest(dir)
    // same physical segment files — only vectors were added
    assert(after.segments.map(_.file) == before.segments.map(_.file))
    assert(after.segments.exists(_.deleteVector.isDefined))
    assert(after.segments.map(_.dvDeletes).sum == 50L)
    assert(!after.mutated, "dv deletes must not flip the LWW-resolution flag")

    // row results: deleted ids gone, everything else intact (columnar path)
    val left = spark.table("dvcat.db.t")
    assert(left.count() == 450)
    assert(left.filter($"id" >= 100 && $"id" < 150).count() == 0)
    assert(left.agg(sum($"id")).head().getLong(0) ==
      (0L until 500L).filterNot(i => i >= 100 && i < 150).sum)
    // row-reader path (metadata column request) skips the same rows
    val raw = spark.read.format("hadro").load(dir.toString)
      .select($"id", col(HadroTable.SeqCol))
    assert(raw.count() == 450)
    // changefeed view: vectored rows are PHYSICALLY gone (unlike tombstones)
    val feed = spark.read.format("hadro").option("hadro.changefeed", "full")
      .load(dir.toString)
    assert(feed.count() == 450)
    spark.sql("DROP TABLE dvcat.db.t")
  }

  test("second dv delete unions; the delete is idempotent; COUNT(*) stays exact") {
    val (_, dir) = catalogTable("dvcat2")
    spark.sql("CREATE TABLE dvcat2.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO dvcat2.db.t SELECT id, id * 1.0 FROM range(0, 300, 1, 2)")
    withDvMode {
      spark.sql("DELETE FROM dvcat2.db.t WHERE id < 50")
      val v1 = CollectionMeta.currentManifest(dir)
      spark.sql("DELETE FROM dvcat2.db.t WHERE id >= 250")
      val v2 = CollectionMeta.currentManifest(dir)
      assert(v2.segments.map(_.dvDeletes).sum == 100L)
      // a fresh union sidecar per delete — versions stay immutable
      val dv1 = v1.segments.flatMap(_.deleteVector).toSet
      val dv2 = v2.segments.flatMap(_.deleteVector).toSet
      assert(dv1.nonEmpty && (dv2 -- dv1).nonEmpty)
      // idempotent: hidden rows cannot re-match
      spark.sql("DELETE FROM dvcat2.db.t WHERE id < 50")
      assert(CollectionMeta.currentManifest(dir).segments.map(_.dvDeletes).sum == 100L)
    }
    assert(spark.table("dvcat2.db.t").count() == 200)
    // COUNT(*) answers from the manifest (vector cardinality is exact)
    assert(spark.sql("SELECT COUNT(*) FROM dvcat2.db.t").head().getLong(0) == 200)
    // Collection.count() metadata fast path agrees
    assert(Collection(spark, dir.toString).count() == 200)
    spark.sql("DROP TABLE dvcat2.db.t")
  }

  test("time travel sees pre-delete state; compaction folds vectors away") {
    val (_, dir) = catalogTable("dvcat3")
    spark.sql("CREATE TABLE dvcat3.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO dvcat3.db.t SELECT id, id * 1.0 FROM range(0, 200, 1, 2)")
    val v0 = CollectionMeta.currentManifest(dir).version
    withDvMode { spark.sql("DELETE FROM dvcat3.db.t WHERE id >= 150") }

    assert(spark.table("dvcat3.db.t").count() == 150)
    val asOf = spark.read.option("hadro.versionAsOf", v0)
      .format("hadro").load(dir.toString)
    assert(asOf.count() == 200, "pinned pre-delete version must see all rows")

    val c = Collection(spark, dir.toString)
    c.compact()
    val m = CollectionMeta.currentManifest(dir)
    assert(m.segments.forall(_.deleteVector.isEmpty), "compaction clears vectors")
    assert(m.segments.map(_.rows).sum == 150)
    assert(spark.table("dvcat3.db.t").count() == 150)
    spark.sql("DROP TABLE dvcat3.db.t")
  }

  test("concurrent dv deletes all land (conflict detected, retried, unioned)") {
    // Two dv deletes racing on the SAME segment each union against the
    // pre-statement vector; committing both without a base-vector check
    // would let the later replace the earlier's sidecar and resurrect its
    // rows. The commit must detect the moved base and the statement loop
    // must re-plan — every delete lands exactly once.
    val (_, dir) = catalogTable("dvcat5")
    spark.sql("CREATE TABLE dvcat5.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO dvcat5.db.t SELECT id, id * 1.0 FROM range(0, 400, 1, 1)")

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val ranges = Seq((0, 10), (100, 110), (200, 210), (300, 310))
    withDvMode {
      val fs = ranges.map { case (lo, hi) => Future {
        spark.sql(s"DELETE FROM dvcat5.db.t WHERE id >= $lo AND id < $hi")
      }}
      Await.result(Future.sequence(fs), 120.seconds)
    }
    val m = CollectionMeta.currentManifest(dir)
    assert(m.segments.map(_.dvDeletes).sum == 40L,
      s"lost dv delete: ${m.segments.map(_.dvDeletes).sum} of 40 landed")
    assert(spark.table("dvcat5.db.t").count() == 360)
    spark.sql("DROP TABLE dvcat5.db.t")
  }

  test("a delete matching nothing commits nothing") {
    val (_, dir) = catalogTable("dvcat4")
    spark.sql("CREATE TABLE dvcat4.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO dvcat4.db.t SELECT id, id * 1.0 FROM range(0, 100, 1, 1)")
    val v0 = CollectionMeta.currentManifest(dir).version
    withDvMode { spark.sql("DELETE FROM dvcat4.db.t WHERE id > 10000") }
    assert(CollectionMeta.currentManifest(dir).version == v0)
    spark.sql("DROP TABLE dvcat4.db.t")
  }

  test("purge_deletes rewrites only vectored segments, carries the rest by reference") {
    val (_, dir) = catalogTable("dvp1")
    spark.sql("CREATE TABLE dvp1.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO dvp1.db.t SELECT id, id * 1.0 FROM range(0, 500, 1, 4)")
    withDvMode { spark.sql("DELETE FROM dvp1.db.t WHERE id >= 100 AND id < 150") }
    val before = CollectionMeta.currentManifest(dir)
    val vectored = before.segments.filter(_.deleteVector.isDefined).map(_.file)
    val untouched = before.segments.filterNot(_.deleteVector.isDefined).map(_.file)
    assert(vectored.nonEmpty && untouched.nonEmpty)

    val row = spark.sql("CALL dvp1.system.purge_deletes('db.t')").head()
    assert(row.getInt(0) == vectored.size, s"purged ${row.getInt(0)}")

    val after = CollectionMeta.currentManifest(dir)
    // untouched segments: same files, by reference; vectored ones: rewritten
    assert(untouched.forall(after.segments.map(_.file).contains))
    assert(vectored.forall(f => !after.segments.map(_.file).contains(f)))
    assert(after.segments.forall(_.deleteVector.isEmpty))
    assert(after.segments.forall(_.dvDeletes == 0L))
    assert(after.segments.map(_.rows).sum == 450L)
    assert(!after.mutated)
    // data exact, manifest fast paths agree
    assert(spark.table("dvp1.db.t").count() == 450)
    assert(spark.table("dvp1.db.t").agg(sum($"id")).head().getLong(0) ==
      (0L until 500L).filterNot(i => i >= 100 && i < 150).sum)
    assert(graft.api.Collection(spark, dir.toString).count() == 450)
    // a second purge is a no-op: nothing vectored remains
    assert(spark.sql("CALL dvp1.system.purge_deletes('db.t')").head().getInt(0) == 0)
    spark.sql("DROP TABLE dvp1.db.t")
  }

  test("purge min_fraction gates the rewrite to heavily-deleted segments") {
    val (_, dir) = catalogTable("dvp2")
    spark.sql("CREATE TABLE dvp2.db.t (id BIGINT, v DOUBLE) USING hadro")
    // two 100-row segments: ids 0..99 and 100..199
    spark.sql("INSERT INTO dvp2.db.t SELECT id, id * 1.0 FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO dvp2.db.t SELECT id, id * 1.0 FROM range(100, 200, 1, 1)")
    withDvMode {
      spark.sql("DELETE FROM dvp2.db.t WHERE id = 7") // 1% of segment 1
      spark.sql("DELETE FROM dvp2.db.t WHERE id >= 150") // 50% of segment 2
    }
    val c = graft.api.Collection(spark, dir.toString)
    assert(c.purgeDeletes(0.3) == 1, "only the 50%-dead segment qualifies")
    val mid = CollectionMeta.currentManifest(dir)
    assert(mid.segments.count(_.deleteVector.isDefined) == 1,
      "the 1%-dead segment keeps its vector under the gate")
    assert(spark.table("dvp2.db.t").count() == 149)
    assert(c.purgeDeletes() == 1, "fraction 0 reclaims the rest")
    assert(CollectionMeta.currentManifest(dir).segments
      .forall(_.deleteVector.isEmpty))
    assert(spark.table("dvp2.db.t").count() == 149)
    spark.sql("DROP TABLE dvp2.db.t")
  }

  test("purge drops a fully-vectored segment via the zero-segment replace") {
    val (_, dir) = catalogTable("dvp3")
    spark.sql("CREATE TABLE dvp3.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO dvp3.db.t SELECT id, id * 1.0 FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO dvp3.db.t SELECT id, id * 1.0 FROM range(100, 200, 1, 1)")
    withDvMode { spark.sql("DELETE FROM dvp3.db.t WHERE id >= 100") }
    assert(CollectionMeta.currentManifest(dir).segments.length == 2)
    assert(graft.api.Collection(spark, dir.toString).purgeDeletes() == 1)
    val m = CollectionMeta.currentManifest(dir)
    assert(m.segments.length == 1, "the all-dead segment is gone, not rewritten")
    assert(m.segments.head.deleteVector.isEmpty)
    assert(spark.table("dvp3.db.t").count() == 100)
    spark.sql("DROP TABLE dvp3.db.t")
  }

  test("purge preserves LWW + tombstones on a collection mutated after its DVs") {
    // The one seam where a MUTATED collection carries deletion vectors: a
    // keyed-but-never-mutated (row-bag) collection takes a rowlevel
    // REPLACE WHERE (DV on the straddling segment), then a later upsert
    // flips `mutated`. The purge must rewrite through the changefeed view
    // in sequence order — tombstone records included — so last-write-wins
    // resolution is identical before and after.
    val w = Files.createTempDirectory("dvp4").resolve("c").toString
    Seq((1L, "a1"), (2L, "b1")).toDF("id", "s").coalesce(1)
      .write.format("hadro").mode("overwrite").option("hadro.key", "id").save(w)
    Seq((1L, "a2"), (3L, "c1")).toDF("id", "s").coalesce(1)
      .write.format("hadro").mode("append").save(w)
    // region-delete the a2 row: segment 2 straddles -> deletion vector
    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    try spark.emptyDataFrame
      .select(lit(0L).as("id"), lit("").as("s")).limit(0)
      .write.format("hadro").mode("overwrite")
      .option("hadro.replaceWhere", "s = 'a2'").save(w)
    finally spark.conf.unset("spark.hadro.overwrite.mode")
    val dir = java.nio.file.Paths.get(w)
    val m0 = CollectionMeta.currentManifest(dir)
    assert(m0.segments.exists(_.deleteVector.isDefined) && !m0.mutated)

    val c = graft.api.Collection(spark, w)
    c.set(Seq((2L, "b2")).toDF("id", "s")) // flips mutated
    c.delete(3L) // tombstone record for key 3
    assert(CollectionMeta.currentManifest(dir).mutated)

    assert(c.purgeDeletes() >= 1)
    val m1 = CollectionMeta.currentManifest(dir)
    assert(m1.segments.forall(_.deleteVector.isEmpty))
    // resolved view: 1 -> a1 (a2 was DV'd), 2 -> b2 (upsert), 3 gone
    // (tombstone); the raw row-bag scan still shows the shadowed b1/c1
    val got = c.toDF().orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a1"), (2L, "b2")), got.mkString(","))
    val raw = spark.read.format("hadro").load(w).orderBy($"id", $"s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(raw == Seq((1L, "a1"), (2L, "b1"), (2L, "b2"), (3L, "c1")),
      raw.mkString(","))
    assert(c.count() == 2)
    // the tombstone survived the purge physically (changefeed carries it)
    val feed = spark.read.format("hadro").option("hadro.changefeed", "full")
      .load(w)
    assert(feed.filter(col(HadroTable.DeletedCol) && $"id" === 3L).count() == 1)
  }

  test("purge keeps the physical sort declaration and rewrites in sort order") {
    val (_, dir) = catalogTable("dvp5")
    spark.range(0, 200).select($"id", ($"id" % 7).cast("long").as("k"))
      .orderBy($"id").coalesce(1)
      .write.format("hadro").mode("overwrite")
      .option("hadro.sortedBy", "id").save(dir.toString)
    // the dv-mode DELETE is a manifest-only commit: the sort declaration
    // survives it (nothing was rewritten out of order)
    withDvMode { spark.sql("DELETE FROM dvp5.db.t WHERE id >= 50 AND id < 60") }
    val m0 = CollectionMeta.currentManifest(dir)
    assert(m0.sortedBy.contains("id") &&
      m0.segments.exists(_.deleteVector.isDefined))
    assert(graft.api.Collection(spark, dir.toString).purgeDeletes() == 1)
    val m = CollectionMeta.currentManifest(dir)
    assert(m.sortedBy.contains("id"), "sort declaration survives the purge")
    assert(m.segments.forall(_.deleteVector.isEmpty))
    val got = spark.read.format("hadro").load(dir.toString).select($"id")
      .collect().map(_.getLong(0))
    assert(got.toSeq == (0L until 200L).filterNot(i => i >= 50 && i < 60),
      "file order stays the declared sort order")
    spark.sql("DROP TABLE dvp5.db.t")
  }
}
