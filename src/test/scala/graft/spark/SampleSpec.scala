package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.plans.logical.Sample
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** TABLESAMPLE pushdown (`SupportsPushDownTableSample`): the scan emits the
  * sampled subset itself (Spark's Sample operator is deleted), decided by a
  * seeded XXH64 over each record's stable `_hadro_seq` — so the sample is a
  * deterministic function of (layout, seed), independent of read
  * parallelism, and composes with filters, deletion vectors, and
  * stratified disjoint ranges exactly like Spark's own sampler contract. */
class SampleSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"hadro_sample_$tag")
    Files.delete(d)
    d.toString
  }

  /** The reader's decision function, replicated: seq = ordinal<<40 | row. */
  private def keep(seq: Long, seed: Long, lo: Double, hi: Double): Boolean = {
    val u = (XXH64.hashLong(seq, seed) >>> 11) * (1.0 / 9007199254740992.0)
    u >= lo && u < hi
  }

  test("pushed sample removes Spark's Sample node and matches the hash oracle") {
    val w = freshDir("basic")
    spark.range(0, 1000).select($"id", ($"id" * 3).as("v"))
      .repartition(1).sortWithinPartitions($"id")
      .write.format("hadro").mode("overwrite").save(w)

    val df = spark.read.format("hadro").load(w).sample(0.3, 77L)
    assert(df.queryExecution.optimizedPlan.collect { case s: Sample => s }.isEmpty,
      "Sample node must be deleted when the scan accepts the pushdown")
    assert(df.queryExecution.executedPlan.toString.contains("PushedSample"))

    val got = df.select($"id").collect().map(_.getLong(0)).toSet
    // single segment, ordinal 0, written in id order: seq == id rank == id
    val expect = (0L until 1000L).filter(keep(_, 77L, 0.0, 0.3)).toSet
    assert(got == expect, s"got ${got.size}, expect ${expect.size}")
    assert(got.size > 200 && got.size < 400, "fraction plausibility")
  }

  test("sample is stable across read parallelism and repeated reads") {
    val w = freshDir("stable")
    spark.range(0, 2000).select($"id", ($"id" % 17).as("k"))
      .repartition(4) // several segments, several ordinals
      .write.format("hadro").mode("overwrite").save(w)
    def readIds(): Set[Long] =
      spark.read.format("hadro").load(w).sample(0.5, 9L)
        .select($"id").collect().map(_.getLong(0)).toSet
    val a = readIds()
    val b = readIds()
    assert(a == b, "same layout + seed must draw the same rows")
    // seq-hash decision from the metadata column: the engine's own seq
    // values drive the same predicate the reader used
    val seqs = spark.read.format("hadro").load(w)
      .select($"id", col("_hadro_seq")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = seqs.collect {
      case (id, seq) if keep(seq, 9L, 0.0, 0.5) => id
    }.toSet
    assert(a == expect)
  }

  test("disjoint sample ranges from one seed partition the collection") {
    val w = freshDir("strata")
    spark.range(0, 1000).toDF("id")
      .repartition(1).write.format("hadro").mode("overwrite").save(w)
    val base = spark.read.format("hadro").load(w)
    // randomSplit compiles to adjacent [lo, hi) Sample ranges on one seed —
    // each pushes independently and the union must be exact and disjoint
    val Array(s1, s2, s3) = base.randomSplit(Array(0.2, 0.3, 0.5), 123L)
    val (a, b, c) = (s1.select("id").collect().map(_.getLong(0)).toSet,
      s2.select("id").collect().map(_.getLong(0)).toSet,
      s3.select("id").collect().map(_.getLong(0)).toSet)
    assert((a & b).isEmpty && (a & c).isEmpty && (b & c).isEmpty)
    assert((a | b | c) == (0L until 1000L).toSet,
      "splits must cover every row exactly once")
  }

  test("sample composes with pushed filters and skips DV'd rows") {
    val w = freshDir("compose")
    spark.range(0, 500).select($"id", ($"id" % 5).cast("long").as("m"))
      .repartition(1).sortWithinPartitions($"id")
      .write.format("hadro").mode("overwrite").save(w)
    // region-delete ids 100..199 via deletion vectors (rowlevel overwrite)
    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    try spark.emptyDataFrame
      .select(lit(0L).as("id"), lit(0L).as("m")).limit(0)
      .write.format("hadro").mode("overwrite")
      .option("hadro.replaceWhere", "id >= 100 AND id < 200").save(w)
    finally spark.conf.unset("spark.hadro.overwrite.mode")

    val df = spark.read.format("hadro").load(w)
      .sample(0.4, 5L).filter($"m" === 2L)
    assert(df.queryExecution.executedPlan.toString.contains("PushedSample"))
    val got = df.select($"id").collect().map(_.getLong(0)).toSet
    val expect = (0L until 500L)
      .filterNot(i => i >= 100 && i < 200) // DV'd rows never sampled
      .filter(_ % 5 == 2)
      .filter(keep(_, 5L, 0.0, 0.4)) // seq == id: single ordered segment
      .toSet
    assert(got == expect)
  }

  test("sample declines manifest fast paths: COUNT, LIMIT prefix, aggregate") {
    val w = freshDir("decline")
    spark.range(0, 1000).select($"id", ($"id" * 2).as("v"))
      .repartition(1).write.format("hadro").mode("overwrite").save(w)
    val base = spark.read.format("hadro").load(w)
    // COUNT over a sample must NOT answer 1000 from the manifest
    val n = base.sample(0.25, 11L).count()
    assert(n < 1000 && n > 0, s"sampled count $n must come from the scan")
    val nExpect = (0L until 1000L).count(keep(_, 11L, 0.0, 0.25))
    assert(n == nExpect)
    // LIMIT over a sample: global limit still yields exactly k rows
    val k = base.sample(0.5, 3L).limit(10).collect().length
    assert(k == 10)
    // un-sampled scans keep the manifest fast path (regression guard)
    val full = base.count()
    assert(full == 1000)
  }

  test("replacement sampling and stream-window scans decline the pushdown") {
    val w = freshDir("withrepl")
    spark.range(0, 300).toDF("id")
      .repartition(1).write.format("hadro").mode("overwrite").save(w)
    val df = spark.read.format("hadro").load(w).sample(true, 0.5, 7L)
    // Spark keeps its own Sample operator; results still correct-ish
    assert(df.queryExecution.optimizedPlan.collect { case s: Sample => s }.nonEmpty,
      "withReplacement must keep Spark's Sample")
    assert(df.count() > 0)
  }
}
