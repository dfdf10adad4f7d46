package graft
import org.apache.spark.sql.SparkSession

/** Dev-only scratchpad: print schemas of the driver testdata. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (q <- Seq("t03_lang_id", "t02_quality_score")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(s"== $q: $n rows in ${(System.nanoTime() - t0) / 1e9}s")
      val t1 = System.nanoTime()
      val n2 = SparkEntry.queries(q)(spark, dir).count()
      println(s"== $q again: $n2 rows in ${(System.nanoTime() - t1) / 1e9}s")
    }
    spark.stop()
  }
}
