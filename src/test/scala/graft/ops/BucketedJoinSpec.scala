package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.AdvancedQueries

/** Bucketed co-located join (a09): with both sides bucketed AND sorted on
  * the join key, the SortMergeJoin must plan with ZERO shuffle exchanges
  * and zero sorts — bucket i merges against bucket i directly. This is the
  * plan contract that makes the layout pay for itself at 100 TB. */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed-bucketed join plans no exchange and no sort, same results") {
    val (o, c) = AdvancedQueries.bucketedOrdersCustomer(spark, sf0001)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(o).join(spark.table(c),
        $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("Sort ("),
        s"bucket-sorted tables must not re-sort:\n$plan")
      // results equal the plain (unbucketed) join
      val expected = spark.read.parquet(s"$sf0001/orders.parquet")
        .join(spark.read.parquet(s"$sf0001/customer.parquet"),
          $"o_custkey" === $"c_custkey")
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
