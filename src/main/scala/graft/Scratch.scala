package graft
import org.apache.spark.sql.SparkSession

/** Dev-only scratchpad: print schemas of the driver testdata. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"== entry rows: ${SparkEntry.entry(spark).count()}")
    SparkEntry.entry(spark).show(10, false)
    spark.stop()
  }
}
