package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Runtime Bloom-filter join pruning: with a selective dim-side filter and
  * broadcast disabled, Catalyst must inject a bloom_filter_agg subquery
  * whose might_contain() predicate sits on the fact side BEFORE the join
  * shuffle — and the filtered result must equal the unfiltered plan's. */
class RuntimeFilterSpec extends SparkSuite {
  import spark.implicits._

  test("bloom filter is injected on the fact side and preserves results") {
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val o = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter($"o_totalprice" > 200000.0)
      val j = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n${plan.take(2000)}")
      val filtered = j.orderBy("o_orderstatus").collect()

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect()
      assert(filtered.sameElements(plain), "bloom pruning must not change results")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
