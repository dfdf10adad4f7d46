package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection

/** Top-N pushdown (`SupportsPushDownTopN`): ORDER BY + LIMIT plans only the
  * segments whose min/max range can intersect the true top n. On a
  * range-clustered collection that is a handful of segments out of the whole
  * corpus — the 100 TB "show me the most recent / cheapest k" shape. Spark
  * keeps the authoritative sort+limit (partial pushdown), so pruning is only
  * ever an optimization; these cases pin both the savings and the
  * conservative keeps. */
class TopNPushdownSpec extends SparkSuite {
  import spark.implicits._

  private def scanNode(df: DataFrame): BatchScanExec = {
    val plan = df.queryExecution.executedPlan
    val found = plan.collectFirst { case b: BatchScanExec => b }
      .orElse(plan.collectLeaves().collectFirst { case b: BatchScanExec => b })
    assert(found.nonEmpty, s"no BatchScanExec in:\n$plan")
    found.get
  }

  private def segmentsRead(df: DataFrame): Long = {
    df.collect()
    scanNode(df).metrics("hadroSegmentsRead").value
  }

  test("ascending top-n on a range-clustered collection reads a segment prefix") {
    val path = Files.createTempDirectory("topn").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.cluster(Seq("o_totalprice"), numSegments = 8)

    val df = c.scan().select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice", $"o_orderkey").limit(10)
    val expected = src.select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice", $"o_orderkey").limit(10).collect()

    assert(scanNode(df).schema != null) // force planning before metrics
    val read = segmentsRead(df)
    assert(read < 8, s"expected a pruned prefix, read $read of 8 segments")
    assert(df.collect().toSeq == expected.toSeq)
    assert(scanNode(df).scan.description().contains("PushedTopN"),
      scanNode(df).scan.description())
  }

  test("descending top-n reads the suffix segments instead") {
    val path = Files.createTempDirectory("topnd").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.cluster(Seq("o_totalprice"), numSegments = 8)

    val df = c.scan().select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey").limit(10)
    val expected = src.select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey").limit(10).collect()

    val read = segmentsRead(df)
    assert(read < 8, s"expected a pruned suffix, read $read of 8 segments")
    assert(df.collect().toSeq == expected.toSeq)
  }

  test("overlapping (unclustered) segments stay correct under top-n") {
    val path = Files.createTempDirectory("topno").resolve("c").toString
    // round-robin layout: every segment spans nearly the full value range,
    // so pruning finds nothing to drop — correctness must not depend on it
    val src = spark.read.parquet(s"$sf0001/orders.parquet").repartition(6)
    val c = Collection.create(spark, path, src, numSegments = 0)

    val got = c.scan().select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice", $"o_orderkey").limit(25).collect()
    val expected = src.select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice", $"o_orderkey").limit(25).collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("mutated collections prune nothing — LWW could hollow out the prefix") {
    val path = Files.createTempDirectory("topnm").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
    val c = Collection.create(spark, path, src, key = Some("o_orderkey"),
      numSegments = 4)
    c.cluster(Seq("o_totalprice"), numSegments = 8)
    // shadow one row: the collection is now `mutated`
    c.set(spark.createDataFrame(Seq((1L, 999999.0d)))
      .toDF("o_orderkey", "o_totalprice"))

    val df = c.scan().select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice", $"o_orderkey").limit(10)
    val expected = src.filter($"o_orderkey" =!= 1L)
      .union(spark.createDataFrame(Seq((1L, 999999.0d)))
        .toDF("o_orderkey", "o_totalprice"))
      .orderBy($"o_totalprice", $"o_orderkey").limit(10).collect()

    val read = segmentsRead(df)
    assert(read == 9, s"mutated collection must plan all segments, read $read")
    assert(df.collect().toSeq == expected.toSeq)
  }

  test("null values in the sort column keep their segments planned") {
    val path = Files.createTempDirectory("topnn").resolve("c").toString
    val withNulls = (1 to 100).map(i => (i.toLong, if (i % 10 == 0) null
      else java.lang.Double.valueOf(i.toDouble))).toDF("id", "v")
      .repartitionByRange(5, $"v")
    val c = Collection.create(spark, path, withNulls, numSegments = 0)

    // ascending NULLS FIRST: the top 5 are all nulls — they must survive
    val got = c.scan().orderBy($"v", $"id").limit(5).collect()
    val expected = withNulls.orderBy($"v", $"id").limit(5).collect()
    assert(got.toSeq == expected.toSeq)
    assert(got.forall(_.isNullAt(1)))
  }
}
