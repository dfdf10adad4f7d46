package graft.api

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.meta.CollectionMeta

/** CDC merge: one changeset of mixed upserts + deletes commits atomically
  * as a single manifest version via per-record tombstone flags. */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"merge_$name").resolve("c").toString

  test("merge applies updates, inserts, and deletes in one manifest version") {
    val path = tmp("basic")
    val src = Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("k", "v")
    val c = Collection.create(spark, path, src, key = Some("k"), numSegments = 4)
    val v0 = c.version

    val changes = Seq(
      (5L, "v5_updated", false),  // update
      (200L, "v200_new", false),  // insert
      (7L, "ignored", true),      // delete (payload irrelevant)
      (9L, "ignored", true))      // delete
      .toDF("k", "v", "is_del")
    c.merge(changes, $"is_del")

    assert(c.version == v0 + 1, "the whole changeset must be ONE commit")
    assert(c.count() == 99) // 100 - 2 deletes + 1 insert
    assert(c.get(5L).select($"v").as[String].head() == "v5_updated")
    assert(c.get(200L).select($"v").as[String].head() == "v200_new")
    assert(c.get(7L).isEmpty && c.get(9L).isEmpty)
    assert(!c.contains(7L))
    // untouched keys unaffected
    assert(c.get(6L).select($"v").as[String].head() == "v6")
  }

  test("merge delete wins when a later merge tombstones an updated key") {
    val path = tmp("seq")
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val c = Collection.create(spark, path, src, key = Some("k"))
    c.merge(Seq((1L, "a2", false)).toDF("k", "v", "d"), $"d")
    c.merge(Seq((1L, "x", true)).toDF("k", "v", "d"), $"d")
    assert(c.get(1L).isEmpty)
    assert(c.count() == 1)
    // and a re-insert after delete resurfaces the key (log order wins)
    c.merge(Seq((1L, "a3", false)).toDF("k", "v", "d"), $"d")
    assert(c.get(1L).select($"v").as[String].head() == "a3")
  }

  test("empty writes are no-ops: no version churn, no mutated flip") {
    val path = tmp("empty")
    val src = Seq.tabulate(10)(i => (i.toLong, s"v$i")).toDF("k", "v")
    val c = Collection.create(spark, path, src, key = Some("k"))
    val m0 = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(!m0.mutated)
    // empty merge: zero change rows — must not mark the collection mutated
    c.merge(src.filter($"k" < 0).withColumn("d", lit(false)), $"d")
    // empty append: no version churn
    c.append(src.filter($"k" < 0))
    val m1 = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m1.version == m0.version, "empty writes must not publish versions")
    assert(!m1.mutated, "an empty upsert must not flip the mutated fast-path bit")
    assert(c.count() == 10)
  }

  test("merge validates: unkeyed collections and fresh paths are rejected") {
    val pathUnkeyed = tmp("unkeyed")
    val c = Collection.create(spark, pathUnkeyed, Seq((1, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException](
      c.merge(Seq((1, "a", false)).toDF("k", "v", "d"), $"d"))
    // deleteCol on a collection that does not exist yet must fail fast
    val fresh = tmp("fresh")
    val e = intercept[Exception] {
      Seq((1, "a", false)).toDF("k", "v", "d")
        .write.format("hadro").mode("append")
        .option("hadro.deleteCol", "d").save(fresh)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(x =>
      Option(x.getMessage).exists(_.contains("requires an existing collection"))))
  }

  test("tombstones from merge are invisible to plain scans but drive resolution") {
    val path = tmp("scan")
    val src = Seq.tabulate(10)(i => (i.toLong, s"v$i")).toDF("k", "v")
    val c = Collection.create(spark, path, src, key = Some("k"))
    c.merge(Seq((3L, "x", true)).toDF("k", "v", "d"), $"d")
    // raw scan (tombstones skipped) still shows the ORIGINAL row for k=3
    assert(spark.read.format("hadro").load(path)
      .filter($"k" === 3L).count() == 1)
    // resolved view: deleted
    assert(c.toDF().filter($"k" === 3L).isEmpty)
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.mutated, "merge must mark the collection mutated")
    assert(m.segments.map(_.tombstones).sum == 1)
  }
}
