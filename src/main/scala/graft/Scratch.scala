package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratchpad: BASELINE.md measurements at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.length > 1) {
      for (q <- args.tail) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        println(f"== $q: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val nRows = li.count()
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $what: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warm JIT
    graft.api.Collection.create(spark, "/tmp/graft_bl/warm", li.limit(1000))

    // 1. ingest throughput, relaxed vs aggressive
    timed(s"ingest $nRows rows RELAXED (8 segments)") {
      graft.api.Collection.create(spark, "/tmp/graft_bl/relaxed", li, numSegments = 32)
    }
    timed(s"ingest $nRows rows AGGRESSIVE (8 segments)") {
      graft.api.Collection.create(spark, "/tmp/graft_bl/aggressive", li,
        numSegments = 8, consistency = "aggressive")
    }
    // 2. full scan: hadro vs parquet
    val h = graft.api.Collection(spark, "/tmp/graft_bl/relaxed")
    timed("hadro count only") { h.scan().count() }
    timed("hadro count only again") { h.scan().count() }
    timed("full scan hadro (count+sum)") {
      h.scan().agg(count(lit(1)), sum($"l_quantity")).collect()
    }
    timed("full scan hadro ALL columns (sum of 4)") {
      h.scan().agg(sum($"l_quantity"), sum($"l_extendedprice"), sum($"l_discount"), sum($"l_tax"),
        count($"l_returnflag"), count($"l_shipdate")).collect()
    }
    timed("full scan parquet (count+sum)") {
      li.agg(count(lit(1)), sum($"l_quantity")).collect()
    }
    // 3. filter scan with segment skipping (range-clustered on orderkey)
    graft.api.Collection.create(spark, "/tmp/graft_bl/ranged",
      li.repartitionByRange(16, $"l_orderkey"))
    val hr = graft.api.Collection(spark, "/tmp/graft_bl/ranged")
    timed("filtered scan (l_orderkey < 100, 16 ranged segments)") {
      println("   rows: " + hr.scan().filter($"l_orderkey" < 100).count())
    }
    timed("same filter over parquet") {
      println("   rows: " + li.filter($"l_orderkey" < 100).count())
    }
    // 4. keyed point lookup
    graft.api.Collection.create(spark, "/tmp/graft_bl/keyed",
      spark.read.parquet(s"$dir/customer.parquet").repartitionByRange(16, $"c_custkey"),
      key = Some("c_custkey"))
    val hk = graft.api.Collection(spark, "/tmp/graft_bl/keyed")
    timed("point get(42) warm1") { hk.get(42L).collect() }
    timed("point get(4242) warm2") { hk.get(4242L).collect() }
    spark.stop()
  }
}
