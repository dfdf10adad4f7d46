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
    // group by a NON-single-valued-per-segment column -> real scan
    // (grouped pushdown needs exact min == max proof on every segment)
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

  test("GROUP BY a single-valued-per-segment column answers from the manifest") {
    val w = Files.createTempDirectory("agggrp").toString
    spark.conf.set("spark.sql.catalog.agggrp", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.agggrp.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS agggrp.db")
    spark.sql("""CREATE TABLE agggrp.db.t (id BIGINT, region STRING, v INT)
      USING hadro PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO agggrp.db.t
      SELECT id, CASE WHEN id % 3 = 0 THEN 'emea' WHEN id % 3 = 1 THEN 'apac'
        ELSE 'amer' END, CAST(id % 100 AS INT) FROM range(0, 3000)""")
    // second insert: several segments per region (per-group fold, not 1:1)
    spark.sql("""INSERT INTO agggrp.db.t
      SELECT id + 3000, CASE WHEN id % 3 = 0 THEN 'emea' ELSE 'apac' END,
        CAST(7 AS INT) FROM range(0, 300)""")

    val df = spark.table("agggrp.db.t").groupBy($"region")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        min($"id").as("mn"), max($"id").as("mx"), avg($"v").as("av"))
    assert(isLocal(df), "expected manifest-answered GROUP BY, got:\n" +
      df.queryExecution.executedPlan.toString)
    val got = df.orderBy($"region").collect().map(_.toSeq).toSeq
    // ground truth from a forced full scan (sampling declines agg pushdown
    // is unrelated; use a filter-shaped no-op to keep the real scan)
    val want = spark.table("agggrp.db.t").filter(length($"region") >= 0)
      .groupBy($"region")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        min($"id").as("mn"), max($"id").as("mx"), avg($"v").as("av"))
      .orderBy($"region").collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got\nwant $want")

    // even a PATH-based append routes one segment per value (the h65
    // writer invariant) — the single-valued proof survives any write path
    val dir = java.nio.file.Paths.get(w, "db", "t")
    Seq((9000L, "emea", 1), (9001L, "apac", 2)).toDF("id", "region", "v")
      .coalesce(1).write.format("hadro").mode("append").save(dir.toString)
    val after = spark.table("agggrp.db.t").groupBy($"region")
      .agg(count(lit(1)).as("n"))
    assert(isLocal(after), "writer routing must keep the grouped pushdown")
    assert(after.orderBy($"region").collect().map(_.getLong(1)).toSeq ==
      Seq(1000L, 1200L + 1L, 1100L + 1L))
    spark.sql("DROP TABLE agggrp.db.t")
  }

  test("multi-column GROUP BY answers from the manifest when every group " +
      "column is single-valued per segment") {
    // no partition spec at all: the proof is stats-based, so ANY layout
    // whose segments happen to be exactly clustered qualifies — here,
    // constant-per-batch appends (one coalesced segment per batch)
    val path = Files.createTempDirectory("aggmc").resolve("c").toString
    val batches = for {
      region <- Seq("emea", "apac"); tier <- Seq(1, 2)
      rep <- Seq(0, 1) // two segments per (region, tier): per-group fold
    } yield (region, tier, rep)
    batches.zipWithIndex.foreach { case ((region, tier, rep), i) =>
      val rows = (0 until 50).map(j =>
        (i * 1000L + j, region, tier, (j + rep).toLong))
      val df = rows.toDF("id", "region", "tier", "v").coalesce(1)
      if (i == 0) df.write.format("hadro").mode("overwrite").save(path)
      else df.write.format("hadro").mode("append").save(path)
    }
    val df = spark.read.format("hadro").load(path)
      .groupBy($"region", $"tier")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        min($"id").as("mn"), max($"id").as("mx"))
    assert(isLocal(df), "expected manifest-answered multi-col GROUP BY:\n" +
      df.queryExecution.executedPlan.toString)
    val got = df.orderBy($"region", $"tier").collect().map(_.toSeq).toSeq
    val want = spark.read.format("hadro").load(path)
      .filter(length($"region") >= 0) // keeps the real scan for ground truth
      .groupBy($"region", $"tier")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        min($"id").as("mn"), max($"id").as("mx"))
      .orderBy($"region", $"tier").collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got\nwant $want")
    assert(got.size == 4)

    // one segment multi-valued on ONE of the group columns -> real scan
    Seq((90000L, "emea", 1, 0L), (90001L, "emea", 2, 0L))
      .toDF("id", "region", "tier", "v")
      .coalesce(1).write.format("hadro").mode("append").save(path)
    val mixed = spark.read.format("hadro").load(path)
      .groupBy($"region", $"tier").agg(count(lit(1)).as("n"))
    assert(hasDataScan(mixed),
      "a segment spanning two tiers must decline the grouped pushdown")
  }

  test("grouped pushdown: int group keys, DV presence declines, empty table") {
    val w = Files.createTempDirectory("agggrp2").toString
    spark.conf.set("spark.sql.catalog.agggrp2", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.agggrp2.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS agggrp2.db")
    spark.sql("""CREATE TABLE agggrp2.db.t (id BIGINT, bucket BIGINT)
      USING hadro PARTITIONED BY (bucket)""")
    // empty table: zero groups, still manifest-answered
    val empty = spark.table("agggrp2.db.t").groupBy($"bucket").agg(count(lit(1)))
    assert(isLocal(empty) && empty.count() == 0)

    spark.sql("""INSERT INTO agggrp2.db.t
      SELECT id, id % 4 FROM range(0, 400)""")
    val df = spark.table("agggrp2.db.t").groupBy($"bucket")
      .agg(count(lit(1)).as("n"), sum($"id").as("s"))
    assert(isLocal(df))
    val got = df.orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = (0L until 4L).map(b =>
      (b, 100L, (0L until 400L).filter(_ % 4 == b).sum))
    assert(got == want, got.mkString(","))

    // deletion vectors: COUNT(*) stays exact (vector cardinality is
    // exact; a single-valued segment's remaining rows keep the value)...
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM agggrp2.db.t WHERE id = 5")
    finally spark.conf.unset("spark.hadro.delete.mode")
    val dv = spark.table("agggrp2.db.t").groupBy($"bucket")
      .agg(count(lit(1)).as("n"))
    assert(isLocal(dv), "grouped COUNT(*) under DVs is still manifest-exact")
    assert(dv.filter($"bucket" === 1L).head().getLong(1) == 99L)
    // ...but per-column stats are stale -> SUM/MIN/COUNT(col) decline
    val dvSum = spark.table("agggrp2.db.t").groupBy($"bucket")
      .agg(sum($"id").as("s"))
    assert(hasDataScan(dvSum), "DV'd segments must scan for column aggs")
    assert(dvSum.filter($"bucket" === 1L).head().getLong(1) ==
      (0L until 400L).filter(i => i % 4 == 1 && i != 5).sum)
    // a FULLY-deleted partition must vanish from the grouped result —
    // SQL GROUP BY never emits an empty group
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM agggrp2.db.t WHERE bucket = 2")
    finally spark.conf.unset("spark.hadro.delete.mode")
    val gone = spark.table("agggrp2.db.t").groupBy($"bucket")
      .agg(count(lit(1)).as("n"))
    assert(isLocal(gone))
    assert(gone.orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 100L), (1L, 99L), (3L, 100L)),
      "the all-deleted bucket 2 group must be absent, not zero")
    spark.sql("DROP TABLE agggrp2.db.t")
  }
}
