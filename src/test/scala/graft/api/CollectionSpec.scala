package graft.api

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Ported behavioral specs from the reference's legacy CaskDB suite
  * (`/root/reference/tests/#test_disk_store_original.py`): persistence
  * across reopen (:78-98), last-write-wins + delete-by-overwrite (:101-125),
  * get-with-default (:48-53), missing key (:64-68) — plus the Collection
  * verbs from INTERFACE.md. */
class CollectionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"col_$name").resolve("c").toString

  // the "books" fixture, reference tests/#test_disk_store_original.py:81-89
  private def books = Seq(
    ("crime and punishment", "dostoevsky"), ("anna karenina", "tolstoy"),
    ("war and peace", "tolstoy"), ("hamlet", "shakespeare"),
    ("othello", "shakespeare"), ("brave new world", "huxley"),
    ("dune", "frank herbert")).toDF("title", "author")

  test("persistence across reopen") {
    val path = tmp("reopen")
    Collection.create(spark, path, books, key = Some("title"))
    // fresh handle = reopen (reference :78-98)
    val reopened = Collection(spark, path)
    assert(reopened.count() == 7)
    assert(reopened.get("dune").select("author").as[String].head() == "frank herbert")
  }

  test("missing key yields empty result and contains=false") {
    val path = tmp("missing")
    val c = Collection.create(spark, path, books, key = Some("title"))
    assert(c.get("no such book").isEmpty)       // reference :64-68
    assert(!c.contains("no such book"))
    assert(c.contains("hamlet"))
  }

  test("last-write-wins upsert and delete-by-tombstone across reopen") {
    val path = tmp("lww")
    val c = Collection.create(spark, path, books, key = Some("title"))
    c.set(Seq(("dune", "herbert, frank")).toDF("title", "author"))
    c.delete("hamlet")
    val re = Collection(spark, path) // reopen, reference :101-125
    assert(re.get("dune").select("author").as[String].head() == "herbert, frank")
    assert(!re.contains("hamlet"))
    assert(re.count() == 6)
    // shadowed + tombstoned versions still in the raw log
    assert(re.scan().count() == 8) // 7 + 1 upsert (tombstone rows excluded from scan)
  }

  test("add() returns generated ids and persists rows") {
    val path = tmp("add")
    val seed = Seq("first doc").toDF("body").withColumn("_id", lit("seed"))
    val c = Collection.create(spark, path, seed, key = Some("_id"))
    val added = c.add(Seq("second", "third").toDF("body"))
    val ids = added.select("_id").as[String].collect()
    assert(ids.length == 2 && ids.forall(_.length == 36)) // INTERFACE.md:13
    assert(c.count() == 3)
    assert(c.get(ids(0)).select("body").as[String].head() == "second")
  }

  test("single-document set(id, doc) and add(doc) match the literal interface") {
    val path = tmp("singledoc")
    val c = Collection.create(spark, path, books, key = Some("title"))
    c.set("dune", Map("author" -> "f. herbert"))          // hadro.set(id, doc)
    assert(c.get("dune").select("author").as[String].head() == "f. herbert")
    c.set("new book", Map("author" -> "somebody"))        // upsert-new
    assert(c.count() == 8)
    intercept[IllegalArgumentException](c.set("x", Map("mystery" -> 1)))

    val path2 = tmp("singleadd")
    val seed = Seq("seed").toDF("body").withColumn("_id", lit("seed-id"))
    val c2 = Collection.create(spark, path2, seed, key = Some("_id"))
    val id = c2.add(Map("body" -> "second doc"))          // id = hadro.add(doc)
    assert(id.length == 36)
    assert(c2.get(id).select("body").as[String].head() == "second doc")
  }

  test("schema validation rejects wrong types and missing non-nullable fields") {
    val path = tmp("validate")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    Collection.create(spark, path, src, key = Some("r_regionkey"))
    // wrong type for an existing field (intended semantics of schema.py:65-79)
    val wrongType = Seq((9.5, "X")).toDF("r_regionkey", "r_name")
    val e1 = intercept[Exception] {
      wrongType.write.format("hadro").mode("append").save(path)
    }
    assert(e1.getMessage.contains("type"))
    // unknown field
    val unknown = Seq((9, "X", "boom")).toDF("r_regionkey", "r_name", "mystery")
    val e2 = intercept[Exception] {
      unknown.write.format("hadro").mode("append").save(path)
    }
    assert(e2.getMessage.contains("mystery"))
  }

  test("count() fast path equals resolved count") {
    val path = tmp("count")
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
    val c = Collection.create(spark, path, src, key = Some("c_custkey"), numSegments = 4)
    assert(c.count() == src.count()) // manifest fast path (no mutations)
    c.delete(1L, 2L, 3L)
    assert(c.count() == src.count() - 3) // resolved path
  }

  test("transaction commits multiple staged writes as one manifest version") {
    val path = tmp("tx")
    val c = Collection.create(spark, path, books, key = Some("title"))
    val v0 = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path)).version
    c.transaction { batch =>
      batch.add(Seq(("moby dick", "melville")).toDF("title", "author"))
      batch.add(Seq(("ulysses", "joyce")).toDF("title", "author"))
      batch.set(Seq(("dune", "f. herbert")).toDF("title", "author"))
    }
    val m = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.version == v0 + 1) // exactly ONE new manifest version
    assert(c.count() == 9)
    assert(c.get("dune").select("author").as[String].head() == "f. herbert")
    // empty transaction commits nothing
    c.transaction { _ => () }
    assert(graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path)).version == m.version)
  }

  test("indexes facade reports stats coverage and rebuild compacts") {
    val path = tmp("idx")
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = Collection.create(spark, path, src, key = Some("n_nationkey"), numSegments = 3)
    assert(c.indexes.list() == Seq("n_name", "n_nationkey", "n_regionkey"))
    val desc = c.indexes.describe()
    assert(desc.columns.toSeq == Seq("column", "segment", "min", "max", "null_count"))
    assert(desc.count() == 3 * 3) // 3 segments x 3 columns
    c.delete(0, 1)
    c.indexes.rebuild()
    assert(c.scan().count() == src.count() - 2) // rebuilt to live rows only
  }

  test("where() composes with pushdown and compaction preserves the view") {
    val path = tmp("compact")
    val src = spark.read.parquet(s"$sf0001/supplier.parquet")
    val c = Collection.create(spark, path, src, key = Some("s_suppkey"), numSegments = 4)
    c.delete(src.filter($"s_suppkey" % 3 === 0).select($"s_suppkey"))
    val before = c.toDF().orderBy("s_suppkey").collect()
    c.compact()
    val after = c.toDF().orderBy("s_suppkey").collect()
    assert(before.sameElements(after))
    assert(c.scan().count() == before.length) // raw log holds only live rows
  }

  test("restoreVersion rewinds to a retained snapshot, metadata-only") {
    val path = tmp("restore")
    val c = Collection.create(spark, path, books, key = Some("title")) // v1
    val v1 = c.version
    c.set(Seq(("dune", "wrong author")).toDF("title", "author"))       // v2
    c.delete("hamlet")                                                 // v3
    assert(c.count() == 6)
    val filesBefore = graft.meta.CollectionMeta.currentManifest(
      java.nio.file.Paths.get(path)).segments.map(_.file).toSet

    c.restoreVersion(v1)
    assert(c.count() == 7, "restore must rewind the visible state")
    assert(c.get("dune").select("author").as[String].head() == "frank herbert")
    assert(c.contains("hamlet"))
    val m = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.generation == 1L, "a rewind is a log discontinuity")
    assert(!m.mutated, "v1 predates all mutations")
    // no data was rewritten: restored segments are the original files
    assert(m.segments.map(_.file).toSet.subsetOf(filesBefore))
    // restoring a GC'd version fails fast with the documented error
    intercept[IllegalArgumentException](c.restoreVersion(999L))
  }

  test("history() reports retained commits with operations and totals") {
    val path = tmp("history")
    val c = Collection.create(spark, path, books, key = Some("title")) // v1
    c.set(Seq(("dune", "f. herbert")).toDF("title", "author"))         // v2
    c.append(Seq(("new grub street", "gissing")).toDF("title", "author")) // v3
    val pre = c.history().collect()
    assert(pre.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L), "newest first")
    assert(pre.take(2).forall(_.getString(1) == "write"))
    assert(pre.head.getBoolean(5), "mutated after the upsert")
    // n_rows counts raw live records (shadowed versions included)
    assert(pre.head.getLong(3) == c.scan().count())

    c.compact() // v4: rewrite — superseded manifests stay RETAINED
    // (metadata outlives the rewrite so audit history and changes-window
    // chain walks keep working; only the segment FILES defer to GC)
    val h = c.history().collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(4L, 3L, 2L, 1L))
    assert(h.head.getLong(3) == c.count())
    assert(h.head.getBoolean(5) == false) // compaction resolved all mutations
    assert(h.head.getLong(6) == 1L)       // one rewrite => generation 1

    c.append(Seq(("middlemarch", "eliot")).toDF("title", "author")) // v5
    val ops = c.history().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(5L) == "write")
  }

  test("orderStable: narrow deterministic plans stable, shuffles/rand unstable") {
    val df = Seq(1, 2, 3).toDF("x")
    def plan(d: org.apache.spark.sql.DataFrame) = d.queryExecution.analyzed
    assert(Collection.orderStable(plan(df.filter(col("x") > 1).select(col("x") * 2 as "y"))))
    assert(Collection.orderStable(plan(df.unionByName(df).limit(4))))
    assert(!Collection.orderStable(plan(df.repartition(4))))
    assert(!Collection.orderStable(plan(df.groupBy(col("x")).count())))
    assert(!Collection.orderStable(plan(df.orderBy(col("x")))))
    assert(!Collection.orderStable(plan(df.withColumn("r", rand()))))
    assert(!Collection.orderStable(plan(df.join(df.withColumnRenamed("x", "y"),
      col("x") === col("y")))))
  }

  test("add() on a shuffled input returns exactly the ids it wrote") {
    val path = tmp("addshuffle")
    val seed = Seq("seedbody").toDF("body").withColumn("_id", lit("seed"))
    val c = Collection.create(spark, path, seed, key = Some("_id"))
    // repartition = order-unstable plan: position-derived ids would be free
    // to differ between the write and the returned frame without the
    // localCheckpoint pin that orderStable() triggers
    val added = c.add((1 to 50).map(i => s"doc $i").toDF("body").repartition(7))
    val returned = added.select("_id", "body").as[(String, String)].collect().toMap
    assert(returned.size == 50)
    val stored = c.where(col("_id") =!= "seed")
      .select("_id", "body").as[(String, String)].collect().toMap
    assert(stored == returned, "returned frame must be the written rows, id-for-id")
  }
}
