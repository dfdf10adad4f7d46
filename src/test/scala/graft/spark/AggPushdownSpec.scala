package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection

/** Aggregate pushdown (`SupportsPushDownAggregates`): global COUNT/MIN/MAX
  * over a never-mutated collection are answered from manifest statistics —
  * the physical plan is a LocalTableScan with ZERO data-file input
  * partitions, the 100 TB metadata-only fast path. */
class AggPushdownSpec extends SparkSuite {
  import spark.implicits._

  // String checks see through AQE wrapping (AdaptiveSparkPlanExec is a leaf).
  private def isLocal(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  private def hasDataScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("BatchScan")

  test("count/min/max answered from the manifest with no data-file scan") {
    val path = Files.createTempDirectory("aggpush").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    Collection.create(spark, path, src, numSegments = 4)
    val df = spark.read.format("hadro").load(path)
      .agg(count(lit(1)).as("n"), count($"o_orderpriority").as("nc"),
        min($"o_orderkey").as("mn"), max($"o_orderkey").as("mx"),
        min($"o_orderstatus").as("smn"), max($"o_orderdate").as("dmx"))
    assert(isLocal(df), "expected LocalTableScan, got:\n" +
      df.queryExecution.executedPlan.toString)
    val got = df.head()
    val want = src.agg(count(lit(1)), count($"o_orderpriority"), min($"o_orderkey"),
      max($"o_orderkey"), min($"o_orderstatus"), max($"o_orderdate")).head()
    assert(got == want)
  }

  test("integral SUM answered from per-segment sums with no data-file scan") {
    val path = Files.createTempDirectory("aggsum").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    Collection.create(spark, path, src, numSegments = 4)
    val df = spark.read.format("hadro").load(path)
      .agg(sum($"o_orderkey").as("s"), sum($"o_custkey").as("sc"),
        count(lit(1)).as("n"))
    assert(isLocal(df), "expected LocalTableScan, got:\n" +
      df.queryExecution.executedPlan.toString)
    val got = df.head()
    val want = src.agg(sum($"o_orderkey"), sum($"o_custkey"), count(lit(1))).head()
    assert(got == want)
    // double SUM is order-dependent — must take the scan path
    val dbl = spark.read.format("hadro").load(path).agg(sum($"o_totalprice"))
    assert(hasDataScan(dbl), "double sum must not be answered from metadata")
  }

  test("integral AVG answered exactly from metadata sum/count") {
    val path = Files.createTempDirectory("aggavg").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    Collection.create(spark, path, src, numSegments = 4)
    val df = spark.read.format("hadro").load(path).agg(avg($"o_orderkey").as("a"))
    assert(isLocal(df), "expected LocalTableScan, got:\n" +
      df.queryExecution.executedPlan.toString)
    assert(df.head() == src.agg(avg($"o_orderkey")).head(), "avg must be bit-equal")
  }

  test("SUM over an all-null integral column is NULL, from metadata") {
    val path = Files.createTempDirectory("aggsumnull").resolve("c").toString
    val src = spark.range(0, 50).select($"id",
      lit(null).cast("long").as("hole"))
    Collection.create(spark, path, src.toDF())
    val df = spark.read.format("hadro").load(path).agg(sum($"hole").as("s"))
    assert(isLocal(df))
    assert(df.head().isNullAt(0))
  }

  test("empty collection answers count 0 and null min/max") {
    val path = Files.createTempDirectory("aggpush0").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    Collection.create(spark, path, src.limit(0))
    val df = spark.read.format("hadro").load(path)
      .agg(count(lit(1)).as("n"), min($"r_regionkey").as("mn"))
    assert(isLocal(df))
    val r = df.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("pushdown declined for filters, mutation, groupBy, distinct, doubles") {
    val path = Files.createTempDirectory("aggpushno").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
    val c = Collection.create(spark, path, src, key = Some("c_custkey"))
    def load() = spark.read.format("hadro").load(path)

    // filter present -> real scan, result still correct
    val f = load().filter($"c_nationkey" === 3).agg(count(lit(1)))
    assert(hasDataScan(f))
    assert(f.head().getLong(0) == src.filter($"c_nationkey" === 3).count())
    // double min/max -> real scan (exactness not provable from stats)
    assert(hasDataScan(load().agg(min($"c_acctbal"))))
    // group by -> real scan
    assert(hasDataScan(load().groupBy($"c_nationkey").agg(count(lit(1)))))
    // distinct count -> real scan
    assert(hasDataScan(load().agg(countDistinct($"c_mktsegment"))))

    // un-mutated keyed collection still pushes...
    val before = load().agg(count(lit(1)))
    assert(isLocal(before) && before.head().getLong(0) == src.count())
    // ...but after a delete (mutation) the manifest is no longer authoritative
    c.delete(1L)
    val after = load().agg(count(lit(1)))
    assert(hasDataScan(after))
  }

  test("schema evolution: appended column counts as all-null in old segments") {
    val path = Files.createTempDirectory("aggpushevo").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    val c = Collection.create(spark, path, src)
    c.addColumn("note", org.apache.spark.sql.types.StringType)
    c.append(src.withColumn("r_regionkey", $"r_regionkey" + 100)
      .withColumn("note", concat(lit("n"), $"r_regionkey".cast("string"))))
    val df = spark.read.format("hadro").load(path)
      .agg(count($"note").as("n"), min($"note").as("mn"), count(lit(1)).as("all"))
    assert(isLocal(df))
    val r = df.head()
    assert(r.getLong(0) == src.count(), "old segments contribute 0 to count(note)")
    assert(r.getString(1) == "n100")
    assert(r.getLong(2) == 2 * src.count())
  }

  test("time travel: pinned version aggregates that version's manifest") {
    val path = Files.createTempDirectory("aggpushtt").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = Collection.create(spark, path, src)
    val v1 = c.version
    c.append(src.withColumn("n_nationkey", $"n_nationkey" + 1000))
    val pinned = spark.read.format("hadro").option("hadro.versionAsOf", v1).load(path)
      .agg(count(lit(1)).as("n"), max($"n_nationkey").as("mx"))
    assert(isLocal(pinned))
    val r = pinned.head()
    assert(r.getLong(0) == src.count() && String.valueOf(r.get(1)) == "24")
  }

  test("supportCompletePushDown probe alone never latches the agg scan") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar}
    val path = Files.createTempDirectory("aggprobe").resolve("c").toString
    Collection.create(spark, path, spark.read.parquet(s"$sf0001/nation.parquet"))
    val schema = spark.read.format("hadro").load(path).schema
    val countStar = new Aggregation(
      Array[AggregateFunc](new CountStar()), Array.empty)
    val grouped = new Aggregation(
      Array[AggregateFunc](new CountStar()), Array(Expressions.column("n_name")))

    // Probe-only: Spark is free to call supportCompletePushDown without a
    // matching pushAggregation — build() must then plan the NORMAL scan.
    val probeOnly = new HadroScanBuilder(java.nio.file.Paths.get(path), schema)
    assert(probeOnly.supportCompletePushDown(countStar), "pushdown is possible")
    assert(!probeOnly.build().isInstanceOf[HadroLocalAggScan],
      "probe must be side-effect-free")

    // A failed pushAggregation must RESET an earlier successful latch.
    val rePushed = new HadroScanBuilder(java.nio.file.Paths.get(path), schema)
    assert(rePushed.pushAggregation(countStar))
    assert(!rePushed.pushAggregation(grouped), "grouped agg is not manifest-answerable")
    assert(!rePushed.build().isInstanceOf[HadroLocalAggScan],
      "failed re-push must clear the previous aggregate")

    // The paired probe+push path still yields the manifest-only scan.
    val pushed = new HadroScanBuilder(java.nio.file.Paths.get(path), schema)
    assert(pushed.supportCompletePushDown(countStar) && pushed.pushAggregation(countStar))
    assert(pushed.build().isInstanceOf[HadroLocalAggScan])
  }
}
