package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Z-order layout: after clustering on two columns, manifest min/max stats
  * must prune segments for narrow filters on EITHER column — the property
  * a single-column sort cannot provide. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("z-order gives segment pruning on both clustered dimensions") {
    val path = Files.createTempDirectory("zorder").resolve("c").toString
    // uniform 2-D grid: 64x64 points, both dims equally spread
    val src = spark.range(0, 4096).select(
      ($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"), $"id".as("v"))
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.cluster(Seq("x", "y"), numSegments = 16)

    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.segments.size == 16)

    // the rewrite is lossless
    assert(c.scan().count() == 4096)
    assert(c.scan().agg(sum($"v")).head().getLong(0) == (0L until 4096L).sum)

    // a narrow slice on EITHER dimension touches a minority of segments
    def tasks(p: org.apache.spark.sql.DataFrame) = p.rdd.getNumPartitions
    val onX = tasks(c.scan().filter($"x" < 8))
    val onY = tasks(c.scan().filter($"y" < 8))
    assert(onX <= 8, s"x-slice touched $onX of 16 segments")
    assert(onY <= 8, s"y-slice touched $onY of 16 segments")
    // and the slices are exact
    assert(c.scan().filter($"x" < 8).count() == 8 * 64)
    assert(c.scan().filter($"y" < 8).count() == 8 * 64)

    // contrast: a LINEAR sort on x prunes x but cannot prune y
    val linPath = Files.createTempDirectory("linear").resolve("c").toString
    val lin = Collection.create(spark, linPath,
      src.repartitionByRange(16, $"x"), numSegments = 0)
    assert(tasks(lin.scan().filter($"x" < 8)) <= 8)
    assert(tasks(lin.scan().filter($"y" < 8)) == 16,
      "linear layout should NOT prune on the non-sorted dimension")
  }

  test("lexicographic multi-column cluster: composite bounds, full ordering " +
      "report, straddler-free two-column pruning") {
    val path = Files.createTempDirectory("lexclu").resolve("c").toString
    // two tenants, interleaved arrival order
    val src = spark.range(0, 4096).select(
      (when($"id" % 2 === 0, "A").otherwise("B")).as("t"),
      ($"id" / 2).cast("long").as("ts"), $"id".as("v"))
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.cluster(Seq("t", "ts"), numSegments = 16, lex = true)
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    // composite bounds recorded + writer-verified on every segment; the
    // manifest declares the LEADING column only (uniform invariant)
    assert(m.sortedBy.contains("t"), m.sortedBy.toString)
    assert(m.segments.forall(_.sortCols.contains("t,ts")))
    // lossless
    assert(c.scan().count() == 4096)
    // (t = 'B', narrow ts range): prunes to the lex interval — a z-order
    // layout can do this too, but lex additionally yields the ORDERING
    def tasks(p: org.apache.spark.sql.DataFrame) = p.rdd.getNumPartitions
    val pruned = c.scan().filter($"t" === "B" && $"ts" < 128L)
    assert(tasks(pruned) <= 2, s"touched ${tasks(pruned)} of 16 segments")
    assert(pruned.count() == 128L)
    // the full composite ordering is reported: (t, ts) sort planned away
    val sorted = c.scan().sortWithinPartitions("t", "ts")
    sorted.collect()
    val plan = sorted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Sort ["), s"redundant (t, ts) sort survived:\n$plan")
  }

  test("z-order over a STRING dimension prunes on lang AND the numeric dim") {
    val path = Files.createTempDirectory("zstring").resolve("c").toString
    // realistic narrow band: ascii-lowercase lang tags — the min/max
    // rescale of the monotone byte-prefix value must spread them over the
    // full bucket range or the interleave wastes bits on shared prefixes
    val langs = Seq("de", "en", "es", "fr", "ja", "ko", "ru", "zh")
    val src = spark.range(0, 4096).select(
      element_at(typedlit(langs), ($"id" % 8 + 1).cast("int")).as("lang"),
      ($"id" / 8).cast("long").as("n"), $"id".as("v"))
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.cluster(Seq("lang", "n"), numSegments = 16)

    // the rewrite is lossless
    assert(c.scan().count() == 4096)
    assert(c.scan().agg(sum($"v")).head().getLong(0) == (0L until 4096L).sum)

    def tasks(p: org.apache.spark.sql.DataFrame) = p.rdd.getNumPartitions
    val onLang = tasks(c.scan().filter($"lang" === "zh"))
    val onN = tasks(c.scan().filter($"n" < 64))
    assert(onLang <= 8, s"lang-slice touched $onLang of 16 segments")
    assert(onN <= 8, s"n-slice touched $onN of 16 segments")
    // and the slices are exact
    assert(c.scan().filter($"lang" === "zh").count() == 512)
    assert(c.scan().filter($"n" < 64).count() == 512)
  }

  test("single-column cluster reports ordering and sorts are planned away") {
    val path = Files.createTempDirectory("zsorted").resolve("c").toString
    val src = spark.range(0, 2000).select(
      (($"id" * 37) % 2000).as("k"), $"id".as("v"))
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.cluster(Seq("k"), numSegments = 8)
    assert(CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
      .sortedBy.contains("k"), "single-column cluster must record sortedBy")

    // rows really are sorted within every partition
    val perPart = c.scan().select($"k")
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect()
    perPart.foreach(s => assert(s == s.sorted, "partition not sorted by k"))

    // a redundant per-partition sort on k is REMOVED from the plan
    val sorted = c.scan().sortWithinPartitions("k")
    sorted.collect()
    val plan = sorted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Sort ["), s"redundant sort survived:\n$plan")

    // contrast: without the declared sort the plan keeps the Sort node
    val fresh = Collection.create(spark,
      Files.createTempDirectory("zunsorted").resolve("c").toString,
      src, numSegments = 4)
    val unsorted = fresh.scan().sortWithinPartitions("k")
    unsorted.collect()
    assert(unsorted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.contains("Sort ["),
      "control plan should keep its sort")

    // an append that does not re-declare the sort clears the flag
    c.append(src.limit(5))
    assert(CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
      .sortedBy.isEmpty, "unsorted append must clear sortedBy")
  }

  test("restoreVersion reverts layout declarations with their segments") {
    val path = Files.createTempDirectory("zrestore").resolve("c").toString
    val src = spark.range(0, 500).select(
      (($"id" * 37) % 500).as("k"), $"id".as("v"))
    val c = Collection.create(spark, path, src, numSegments = 2)
    c.cluster(Seq("k"), numSegments = 4)
    val vSorted = c.version
    // an unsorted append clears the declaration...
    c.append(src.limit(5))
    assert(CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
      .sortedBy.isEmpty)
    // ...and a restore must bring it BACK with the segments it describes —
    // restoring segments but keeping the cleared (or, worse, a later
    // re-declared) flag would let scans report an ordering the files
    // don't have.
    c.restoreVersion(vSorted)
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.sortedBy.contains("k"),
      "restore must revert sortedBy with the segment list")
    assert(c.scan().count() == 500, "the unsorted append must be gone")
    val sorted = c.scan().sortWithinPartitions("k")
    sorted.collect()
    assert(!sorted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.contains("Sort ["),
      "restored declared sort must plan sorts away again")
  }

  test("cluster validates columns and preserves keyed resolution") {
    val path = Files.createTempDirectory("zkeyed").resolve("c").toString
    val src = Seq.tabulate(100)(i => (i.toLong, i * 2L, s"v$i")).toDF("k", "m", "v")
    val c = Collection.create(spark, path, src, key = Some("k"), numSegments = 4)
    c.set(Seq((5L, 10L, "v5_new")).toDF("k", "m", "v"))
    c.delete(7L)
    intercept[IllegalArgumentException](c.cluster(Seq("nope")))
    c.cluster(Seq("k", "m"), numSegments = 4)
    // clustering rewrites the RESOLVED view: upsert kept, delete gone
    assert(c.count() == 99)
    assert(c.get(5L).select($"v").as[String].head() == "v5_new")
    assert(c.get(7L).isEmpty)
  }
}
