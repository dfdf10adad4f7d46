package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: simulate the driver calling entry()/queries on a BARE session
  * (no nanosAsLong, default shuffle partitions) — the contract surface must
  * self-configure. */
object ScratchEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"== entry rows: ${SparkEntry.entry(spark).count()}")
    // events-based query exercises the nanosAsLong runtime toggle
    val df = SparkEntry.queries("q11_events_hourly")(spark, "/root/testdata/sf0.001")
    println(s"== q11 on bare session: ${df.count()} rows")
    val st = SparkEntry.queries("st01_streaming_hourly")(spark, "/root/testdata/sf0.001")
    println(s"== st01 on bare session: ${st.count()} rows")
    // time-travel error path: unavailable version
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val c = graft.api.Collection.create(spark, "/tmp/graft_tt_probe/c", src)
    try c.scanVersion(999).count()
    catch { case e: Exception =>
      println(s"== tt probe: ${e.getMessage.linesIterator.find(_.contains("version")).getOrElse(e.getMessage.take(80))}") }
    println(s"== tt current: v${c.version} rows=${c.scanVersion(c.version).count()}")
    spark.stop()
  }
}
