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
    // probe 1: reading a nonexistent collection
    try { spark.read.format("hadro").load("/tmp/graft_probe_nonexistent").count() }
    catch { case e: Exception => println(s"== probe nonexistent: ${e.getMessage.linesIterator.next()}") }
    // probe 2: roundtrip then re-open and re-read through the public surface
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    graft.api.Collection.create(spark, "/tmp/graft_probe_rt/c", src, key = Some("r_regionkey"))
    val re = graft.api.Collection(spark, "/tmp/graft_probe_rt/c")
    println(s"== probe reopen count: ${re.count()}")
    re.set(src.limit(1).withColumn("r_name", org.apache.spark.sql.functions.lit("PATCHED")))
    println(s"== probe after upsert get(0): ${re.get(0).collect().mkString}")
    println(s"== probe explain: ${re.where("r_regionkey = 3").queryExecution.executedPlan.toString.linesIterator.find(_.contains("PushedFilters")).getOrElse("<none>")}")
    println(s"== entry rows: ${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
