package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSuite
import graft.api.Collection

/** Manifest-driven scan statistics and the extensions entry point. */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"stats_$name").resolve("c").toString

  test("scan reports exact manifest statistics, reduced by pruning") {
    val path = tmp("exact")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .repartitionByRange(8, $"o_orderkey")
    Collection.create(spark, path, src)

    def statsFor(filters: Array[Filter]) = {
      val b = new HadroScanBuilder(Paths.get(path),
        spark.read.format("hadro").load(path).schema)
      b.pushFilters(filters)
      b.build().asInstanceOf[HadroScan].estimateStatistics()
    }
    val all = statsFor(Array.empty)
    assert(all.numRows().getAsLong == src.count())
    assert(all.sizeInBytes().getAsLong > 0)
    // a selective key filter prunes segments -> smaller reported stats
    val some = statsFor(Array(EqualTo("o_orderkey", 1L)))
    assert(some.sizeInBytes().getAsLong < all.sizeInBytes().getAsLong)
    assert(some.numRows().getAsLong < all.numRows().getAsLong)
  }

  test("analyze publishes column stats the optimizer can see") {
    val path = tmp("analyze")
    val src = spark.read.parquet(s"$sf0001/supplier.parquet")
    Collection.create(spark, path, src)
    val c = Collection(spark, path)
    val stats = c.analyze(exact = true).toMap
    // exact ndv/nulls/minmax for a key column match the data
    val key = stats("s_suppkey")
    assert(key.distinctCount == src.count())
    assert(key.nullCount == 0L)
    assert(key.minLong.contains(
      src.agg(min($"s_suppkey")).head().getLong(0)))
    assert(key.maxLong.contains(
      src.agg(max($"s_suppkey")).head().getLong(0)))
    val name = stats("s_name")
    assert(name.maxLen >= name.avgLen && name.avgLen > 0)
    // the scan reports them as V2 column statistics...
    val b = new HadroScanBuilder(Paths.get(path),
      spark.read.format("hadro").load(path).schema)
    val v2 = b.build().asInstanceOf[HadroScan].estimateStatistics()
    assert(!v2.columnStats().isEmpty)
    val ks = v2.columnStats().entrySet().iterator()
    var sawKey = false
    while (ks.hasNext) {
      val e = ks.next()
      if (e.getKey.describe() == "s_suppkey") {
        sawKey = true
        assert(e.getValue.distinctCount().getAsLong == src.count())
        assert(e.getValue.min().isPresent && e.getValue.max().isPresent)
      }
    }
    assert(sawKey)
    // ...and the optimizer's scan relation carries per-attribute stats
    // (leaf node: non-leaf propagation needs CBO, asserted next)
    val leaf = spark.read.format("hadro").load(path)
      .filter($"s_suppkey" > -1).queryExecution.optimizedPlan.collectLeaves().head
    val attrStats = leaf.stats.attributeStats
    assert(attrStats.nonEmpty, "optimizer saw no attribute stats")
    val a = attrStats.find(_._1.name == "s_suppkey").map(_._2)
    assert(a.exists(_.distinctCount.exists(_.toLong == src.count())))
    // with CBO on, a filter's row estimate uses the published ndv/min/max
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val filtered = spark.read.format("hadro").load(path)
        .filter($"s_suppkey" > -1).queryExecution.optimizedPlan
      val top = filtered.stats
      assert(top.attributeStats.nonEmpty,
        "CBO did not propagate attribute stats through the filter")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("analyze histograms reach the optimizer's attribute stats") {
    val path = tmp("histo")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    Collection.create(spark, path, src)
    val c = Collection(spark, path)
    val stats = c.analyze(exact = true, histogramBins = 8).toMap
    val hb = stats("o_totalprice").histogram
    assert(hb.size == 8)
    // bins tile min..max in order, each with some ndv
    assert(hb.head.lo <= hb.head.hi && hb.forall(b => b.ndv > 0))
    hb.sliding(2).foreach { case Seq(a, b) => assert(a.hi == b.lo); case _ => () }
    assert(hb.head.lo == stats("o_totalprice").minDouble.get)
    assert(hb.last.hi == stats("o_totalprice").maxDouble.get)
    // the optimizer-facing catalyst stats carry the histogram
    val leaf = spark.read.format("hadro").load(path)
      .filter($"o_totalprice" > 0.0).queryExecution.optimizedPlan
      .collectLeaves().head
    val a = leaf.stats.attributeStats.find(_._1.name == "o_totalprice").map(_._2)
    assert(a.exists(_.histogram.isDefined), "histogram missing from catalyst stats")
    assert(a.flatMap(_.histogram).exists(_.bins.length == 8))
  }

  test("analyze measures the RESOLVED view of a keyed collection") {
    val path = tmp("analyzekeyed")
    val base = spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    Collection.create(spark, path, base.toDF(), key = Some("id"))
    val c = Collection(spark, path)
    // shadow half the keys with new versions and delete a quarter
    c.set(spark.range(0, 50).selectExpr("id", "CAST(id * 10 AS DOUBLE) AS v").toDF())
    c.delete(spark.range(75, 100).toDF("id"))
    val stats = c.analyze(exact = true).toMap
    // ndv/nulls reflect the post-LWW, post-tombstone view, not the raw log
    assert(stats("id").distinctCount == 75L)
    assert(stats("id").maxLong.contains(74L))
    assert(stats("v").distinctCount ==
      c.toDF().select($"v").distinct().count())
  }

  test("long string bounds truncate in the manifest yet stay conservative") {
    val path = tmp("strbounds")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    Collection.create(spark, path, docs, numSegments = 4)
    val m = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    m.segments.foreach { s =>
      val st = s.stats("text")
      assert(st.min.forall(_.length <= 64), "min bound must be truncated")
      assert(st.max.forall(_.length <= 64), "max bound must be truncated")
      assert(!st.exact, "truncated bounds must be marked inexact")
      assert(s.stats("lang").exact, "short strings keep exact bounds")
    }
    // equality over the long column still finds its row (bounds widened,
    // never narrowed)
    val t = docs.orderBy($"doc_id").select($"text").head().getString(0)
    assert(spark.read.format("hadro").load(path)
      .filter($"text" === t).count() >= 1)
    // MIN over the truncated column declines metadata answering but is
    // still correct from the scan; the exact short column stays metadata
    val longAgg = spark.read.format("hadro").load(path).agg(min($"text"))
    assert(longAgg.queryExecution.executedPlan.toString.contains("BatchScan"),
      "inexact bounds must not answer MIN from metadata")
    assert(longAgg.head().getString(0) ==
      docs.agg(min($"text")).head().getString(0))
    val shortAgg = spark.read.format("hadro").load(path).agg(min($"lang"))
    assert(!shortAgg.queryExecution.executedPlan.toString.contains("BatchScan"),
      "exact bounds must keep the metadata fast path")
    assert(shortAgg.head().getString(0) ==
      docs.agg(min($"lang")).head().getString(0))
  }

  test("small hadro dimension is broadcast without a hint") {
    val path = tmp("bcast")
    val dim = spark.read.parquet(s"$sf0001/nation.parquet")
    Collection.create(spark, path, dim)
    val fact = spark.read.parquet(s"$sf0001/customer.parquet")
    val joined = fact.join(
      spark.read.format("hadro").load(path),
      $"c_nationkey" === $"n_nationkey")
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast, got:\n$plan")
  }

  test("GraftExtensions registers SQL functions in a new session") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      try {
        s2.read.parquet(s"$sf0001/embeddings.parquet")
          .createOrReplaceTempView("ext_embs")
        val self = s2.sql(
          "SELECT cosine_similarity(embedding, embedding) AS c FROM ext_embs LIMIT 3")
          .collect().map(_.getDouble(0))
        assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
        val sig = s2.sql(
          "SELECT minhash_signature(split(text, ' '), 8) AS s FROM " +
            s"parquet.`$sf0001/documents.parquet` LIMIT 2")
          .collect().map(_.getSeq[Long](0))
        assert(sig.forall(_.length == 8))
      } finally {
        // s2 shares the SparkContext — never stop it; just restore sessions
      }
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
