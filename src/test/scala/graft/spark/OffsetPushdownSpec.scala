package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection

/** Offset pushdown (`SupportsPushDownOffset`): `OFFSET m` is FULLY pushed —
  * Spark deletes its Offset operator — so the scan itself plans past whole
  * leading segments (manifest live counts are exact) and the boundary
  * segment's reader drops the residual rows. At 100 TB a deep pagination
  * offset never opens the skipped terabytes. These cases pin the exact-count
  * contract (with deletion vectors in play), the composition with a pushed
  * LIMIT, and the declines. */
class OffsetPushdownSpec extends SparkSuite {
  import spark.implicits._

  private def scanNode(df: DataFrame): BatchScanExec = {
    val plan = df.queryExecution.executedPlan
    val found = plan.collectFirst { case b: BatchScanExec => b }
      .orElse(plan.collectLeaves().collectFirst { case b: BatchScanExec => b })
    assert(found.nonEmpty, s"no BatchScanExec in:\n$plan")
    found.get
  }

  private def build(name: String): (String, Seq[Long]) = {
    val path = Files.createTempDirectory(s"offset_$name").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
    Collection.create(spark, path, src, numSegments = 4)
    (path, src.select($"o_orderkey").as[Long].collect().toSeq)
  }

  test("offset is fully pushed, drops exactly m rows, and composes with limit") {
    val (path, all) = build("basic")
    val df = spark.read.format("hadro").load(path).select($"o_orderkey")
    val m = all.size / 3 + 7

    val out = df.offset(m)
    assert(scanNode(out).scan.description().contains(s"PushedOffset: $m"),
      s"offset not pushed:\n${scanNode(out).scan.description()}")
    val rows = out.as[Long].collect().toSeq
    assert(rows.size == all.size - m, "must drop exactly m rows")
    // sub-multiset of the full scan (drops are real rows, no invention)
    val counts = all.groupBy(identity).view.mapValues(_.size)
    rows.groupBy(identity).foreach { case (k, v) =>
      assert(counts.getOrElse(k, 0) >= v.size, s"row $k appeared from nowhere")
    }
    // pagination: offset + limit yields a full page of surviving rows
    // (Spark pushes LIMIT n+m alongside, so the planned prefix covers both)
    val page = df.offset(m).limit(5)
    assert(scanNode(page).scan.description()
      .contains(s"PushedLimit: ${m + 5}, PushedOffset: $m"))
    assert(page.as[Long].collect().length == 5)
    // beyond-the-end offset is an empty result, not an error
    assert(df.offset(all.size + 10).count() == 0L)
  }

  test("offset skips whole leading segments at planning") {
    val (path, all) = build("prune")
    val df = spark.read.format("hadro").load(path).select($"o_orderkey")
    // past the first segment boundary: at least one segment never planned
    val out = df.offset(all.size / 2)
    out.collect()
    val pruned = scanNode(out).metrics("hadroSegmentsPruned").value
    assert(pruned >= 1, s"expected leading segments pruned, got $pruned")
  }

  test("offset accounting stays exact across deletion vectors") {
    val wh = Files.createTempDirectory("offset_dv_wh").toString
    spark.conf.set("spark.sql.catalog.offdv", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.offdv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS offdv.db")
    spark.sql("CREATE TABLE offdv.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO offdv.db.t SELECT id, id * 1.0 FROM range(0, 400, 1, 4)")
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM offdv.db.t WHERE id % 4 = 0")
    finally spark.conf.unset("spark.hadro.delete.mode")
    val df = spark.table("offdv.db.t").select($"id")
    val live = df.as[Long].collect().toSeq
    assert(live.size == 300)
    val m = live.size / 2 + 3
    val rows = df.offset(m).as[Long].collect().toSeq
    assert(rows.size == live.size - m,
      "offset must count live rows only once vectors hide deletes")
    assert(rows.forall(_ % 4 != 0))
  }

  test("offset with a filter is NOT pushed (residuals re-apply above)") {
    val (path, _) = build("decline")
    val df = spark.read.format("hadro").load(path)
      .filter($"o_orderkey" > 10L).select($"o_orderkey")
    val out = df.offset(3)
    assert(!scanNode(out).scan.description().contains("PushedOffset"),
      "offset over a pushed filter must stay in Spark")
    // Spark still applies it — result contract unchanged
    val base = df.as[Long].collect()
    assert(out.as[Long].collect().length == base.length - 3)
  }
}
