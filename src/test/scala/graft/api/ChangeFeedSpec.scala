package graft.api

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[ChangeFeed.updateImages]]: Delta-CDF-style typed change rows for a
  * keyed collection's changes window, plus the pruning-stability seam it
  * exposed (changefeed row membership must not depend on projection). */
class ChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  private def setup(): (String, Long, Long) = {
    val w = Files.createTempDirectory("uimg").resolve("c").toString
    Collection.create(spark, w,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (4L, "d", 40.0))
        .toDF("k", "s", "v"), key = Some("k"))
    val c = Collection(spark, w)
    val v1 = c.version
    // upsert existing key 1, insert new keys 7 and 9
    c.set(Seq((1L, "a", 99.0), (7L, "g", 70.0), (9L, "i", 90.0))
      .toDF("k", "s", "v"))
    // delete existing key 2 and in-window key 9 (nets out)
    c.merge(Seq((2L, "b", 20.0, true), (9L, "i", 90.0, true))
      .toDF("k", "s", "v", "d"), $"d")
    // delete-then-reinsert is not tested here; h92 covers it at corpus size
    (w, v1, c.version)
  }

  test("updateImages classifies net per-key changes against the pre-window snapshot") {
    val (w, v1, v2) = setup()
    val out = ChangeFeed.updateImages(spark, w, v1, v2)
      .as[(Long, String, Double, String)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, "a", 10.0, "update_preimage"),
      (1L, "a", 99.0, "update_postimage"),
      (2L, "b", 20.0, "delete"),
      (7L, "g", 70.0, "insert")), out.toString)
    // key 9 (created AND destroyed inside the window) appears nowhere
  }

  test("updateImages pre-images resolve shadowed versions: a key updated " +
      "in an EARLIER window contributes exactly one pre-image") {
    val w = Files.createTempDirectory("uimg2").resolve("c").toString
    Collection.create(spark, w, Seq((1L, "a", 1.0)).toDF("k", "s", "v"),
      key = Some("k"))
    val c = Collection(spark, w)
    c.set(Seq((1L, "a", 2.0)).toDF("k", "s", "v")) // window 1 (consumed)
    val v2 = c.version
    c.set(Seq((1L, "a", 3.0)).toDF("k", "s", "v")) // window 2
    val out = ChangeFeed.updateImages(spark, w, v2, c.version)
      .as[(Long, String, Double, String)].collect().sorted.toSeq
    // the raw v2 log holds TWO versions of k=1 (1.0 shadowed by 2.0);
    // the pre-image must be the RESOLVED one — exactly one pair emitted
    assert(out == Seq((1L, "a", 2.0, "update_preimage"),
      (1L, "a", 3.0, "update_postimage")), out.toString)
  }

  test("delete-then-reinsert inside one window is an update pair whose " +
      "pre-image is the ORIGINAL value") {
    val w = Files.createTempDirectory("uimg3").resolve("c").toString
    Collection.create(spark, w, Seq((4L, "d", 40.0)).toDF("k", "s", "v"),
      key = Some("k"))
    val c = Collection(spark, w)
    val v1 = c.version
    c.merge(Seq((4L, "d", 40.0, true)).toDF("k", "s", "v", "d"), $"d")
    c.set(Seq((4L, "d", 44.0)).toDF("k", "s", "v"))
    val out = ChangeFeed.updateImages(spark, w, v1, c.version)
      .as[(Long, String, Double, String)].collect().sorted.toSeq
    // the window's NET action for key 4 is an upsert of an existing key:
    // the interim tombstone is invisible to a net-per-key consumer
    assert(out == Seq((4L, "d", 40.0, "update_preimage"),
      (4L, "d", 44.0, "update_postimage")), out.toString)
  }

  test("updateImages refuses unkeyed collections") {
    val w = Files.createTempDirectory("uimgu").resolve("c").toString
    Collection.create(spark, w, Seq((1L, "a")).toDF("k", "s"))
    val e = intercept[IllegalArgumentException](
      ChangeFeed.updateImages(spark, w, 0L, 1L))
    assert(e.getMessage.contains("KEYED"), e.getMessage)
  }

  test("pre-image side is window-proportional: touched keys push into the " +
      "start-snapshot scan (segment pruning) and nothing table-sized " +
      "crosses an exchange") {
    val w = Files.createTempDirectory("uimgscale").resolve("c").toString
    // 4000 keys across 8 range-clustered segments, with a fat payload so
    // a table-sized shuffle is unmissable in exchange dataSize
    val pad = "x" * 200
    val base = (0L until 4000L).map(i => (i, s"s${i % 5}", i.toDouble, pad))
      .toDF("k", "s", "v", "p")
    Collection.create(spark, w, base.repartitionByRange(8, col("k")),
      key = Some("k"))
    val c = Collection(spark, w)
    val v1 = c.version
    // the window touches 3 keys, all in the first range segment
    c.set(Seq((5L, "s0", 5000.0, pad), (6L, "s1", 6000.0, pad),
      (7L, "s2", 7000.0, pad)).toDF("k", "s", "v", "p"))
    val out = ChangeFeed.updateImages(spark, w, v1, c.version)
    val rows = out.collect()
    assert(rows.length == 6, s"3 updates -> 3 pre + 3 post, got ${rows.length}")

    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val nodes = walk(out.queryExecution.executedPlan)
    // (a) the pre-image snapshot scan PRUNES: the touched-key IN
    // predicate reaches the v1 scan, whose range stats keep 1 of 8
    // segments — at least one executed scan must report that pruning
    val scans = nodes.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "no BatchScanExec executed")
    val pruned = scans.flatMap(_.metrics.get("hadroSegmentsPruned"))
      .map(_.value)
    assert(pruned.exists(_ >= 7L),
      s"no scan pruned the start snapshot (pruned per scan: $pruned)")
    // (b) no exchange carries the table: the base is ~4000 x >200 B
    // (~850 KB); with restrict-below-the-LWW-window every shuffle is
    // touched-keys-proportional
    val shuffled = nodes
      .collect { case s: ShuffleExchangeExec => s.metrics("dataSize").value }
      .sum
    val tableBytes = 4000L * 210
    assert(shuffled < tableBytes / 4,
      s"shuffled $shuffled bytes — the start snapshot is crossing an " +
        s"exchange table-sized (~$tableBytes)")
  }

  test("pre-image restriction holds on the semi-join branch too (> " +
      "MaxKeyPushdown touched keys): the LWW window never sees the table") {
    val w = Files.createTempDirectory("uimgsemi").resolve("c").toString
    val base = (0L until 4000L).map(i => (i, s"s${i % 5}", i.toDouble))
      .toDF("k", "s", "v")
    Collection.create(spark, w, base.repartitionByRange(4, col("k")),
      key = Some("k"))
    val c = Collection(spark, w)
    val v1 = c.version
    // touch 1200 keys — past the IN-pushdown bound, so the restriction
    // must ride the semi join BELOW the window
    c.set((0L until 1200L).map(i => (i, "u", i * 2.0)).toDF("k", "s", "v"))
    val out = ChangeFeed.updateImages(spark, w, v1, c.version)
    assert(out.count() == 2400) // 1200 pre + 1200 post
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val recs = walk(out.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec =>
        s.metrics("shuffleRecordsWritten").value }
    assert(recs.nonEmpty, "expected at least one exchange to execute")
    // a table-sized LWW resolve would push >= 4000 snapshot rows through
    // its exchange; restricted-below-the-window every exchange stays
    // touched-keys-proportional (1200 pre + 1200 window rows, plus agg
    // residue — well under the 4000-row table)
    assert(recs.max < 4000,
      s"an exchange carried ${recs.max} rows — table-sized, not " +
        s"touched-keys-proportional (per exchange: ${recs.sorted.reverse})")
  }

  test("changefeed row membership survives column pruning (tombstones stay)") {
    val (w, v1, v2) = setup()
    // selecting ONLY the key must still see the tombstone rows — pruning
    // _hadro_deleted away must not flip the scan to live-rows-only
    val keys = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", v1.toString)
      .option("hadro.changesEnd", v2.toString).load(w)
      .select("k").as[Long].collect().sorted.toSeq
    assert(keys == Seq(1L, 2L, 7L, 9L, 9L), keys.toString)
    // count() over the same frame agrees (no projection at all)
    val n = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", v1.toString)
      .option("hadro.changesEnd", v2.toString).load(w).count()
    assert(n == 5L, n.toString)
    // and the plain (non-changefeed) window keeps reference semantics:
    // tombstones skipped regardless of projection
    val plain = spark.read.format("hadro")
      .option("hadro.changesStart", v1.toString)
      .option("hadro.changesEnd", v2.toString).load(w)
      .select("k").as[Long].collect().sorted.toSeq
    assert(plain == Seq(1L, 7L, 9L), plain.toString)
  }
}
