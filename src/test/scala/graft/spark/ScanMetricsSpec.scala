package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection

/** DSv2 custom scan metrics: pruning effectiveness (segments read vs
  * pruned, bytes planned) must surface on the physical scan node — the
  * operability signal a 100 TB deployment watches in the SQL UI. */
class ScanMetricsSpec extends SparkSuite {
  import spark.implicits._

  private def scanNode(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    val plan = df.queryExecution.executedPlan
    val found = plan.collectFirst { case b: BatchScanExec => b }
      .orElse(plan.collectLeaves().collectFirst { case b: BatchScanExec => b })
    assert(found.nonEmpty, s"no BatchScanExec in:\n$plan")
    found.get
  }

  test("filtered scan reports segments read/pruned and bytes planned") {
    val path = Files.createTempDirectory("metrics").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
      .repartitionByRange(8, $"c_custkey")
    Collection.create(spark, path, src)

    val df = spark.read.format("hadro").load(path).filter($"c_custkey" === 42L)
    df.collect()
    val node = scanNode(df)
    val m = node.metrics
    assert(m.contains("hadroSegmentsRead") && m.contains("hadroSegmentsPruned")
      && m.contains("hadroBytesPlanned"), m.keys.mkString(", "))
    // range-clustered segments: a point filter plans 1 of 8
    assert(m("hadroSegmentsRead").value == 1L, m("hadroSegmentsRead").value)
    assert(m("hadroSegmentsPruned").value == 7L, m("hadroSegmentsPruned").value)
    assert(m("hadroBytesPlanned").value > 0L)
  }

  test("writes report rows/bytes/segments via DSv2 custom write metrics") {
    val w = Files.createTempDirectory("wmetrics").toString
    spark.conf.set("spark.sql.catalog.wmet", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.wmet.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wmet.db")
    spark.sql("CREATE TABLE wmet.db.t (id BIGINT) USING hadro")
    val df = spark.sql("INSERT INTO wmet.db.t SELECT id FROM range(0, 1000, 1, 4)")
    // eager commands wrap their physical plan in CommandResultExec
    val plan0 = df.queryExecution.executedPlan
    val phys = plan0.collectFirst {
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        c.commandPhysicalPlan
    }.getOrElse(plan0)
    val node = phys.collectFirst {
      case a: org.apache.spark.sql.execution.datasources.v2.AppendDataExec => a
    }
    assert(node.nonEmpty, df.queryExecution.executedPlan.toString)
    val m = node.get.metrics
    assert(m.contains("hadroRowsWritten"), m.keys.mkString(", "))
    assert(m("hadroRowsWritten").value == 1000L, m("hadroRowsWritten").value)
    assert(m("hadroBytesWritten").value > 0L)
    assert(m("hadroSegmentsWritten").value == 4L, m("hadroSegmentsWritten").value)
    spark.sql("DROP TABLE wmet.db.t")
  }

  test("unfiltered scan reports zero pruned") {
    val path = Files.createTempDirectory("metrics0").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet").repartition(4)
    Collection.create(spark, path, src)
    val df = spark.read.format("hadro").load(path)
    df.collect()
    val m = scanNode(df).metrics
    assert(m("hadroSegmentsRead").value == 4L)
    assert(m("hadroSegmentsPruned").value == 0L)
  }
}
