package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: formatted explain of representative queries. */
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg_pricing", "q02_join_star_broadcast", "q03_join_fact_fact",
        "h02_filter_pushdown", "a01_asof_join", "q04_window_topn")
    for (n <- names) {
      println(s"######## $n")
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect() // finalize AQE so transitions (ColumnarToRow) are visible
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
