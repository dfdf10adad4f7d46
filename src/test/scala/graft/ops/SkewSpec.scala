package graft.ops

import graft.SparkSuite

/** AQE runtime skew handling: the synthetically skewed join must actually
  * trigger a skew-split in the executed plan, and produce exactly the plain
  * join's results — AQE changes scheduling, never semantics. */
class SkewSpec extends SparkSuite {

  test("AQE splits the skewed partition and results equal the plain join") {
    val tuned = SkewOps.skewTunedSession(spark)
    val df = SkewOps.skewedJoinDemo(tuned, sf0001)
    val got = df.collect()

    val want = SkewOps.skewedJoinDemo(spark, sf0001).collect()
    assert(got.sameElements(want))

    // after execution, AQE's final plan marks the split sort-merge join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected an AQE skew-split SortMergeJoin in the executed plan:\n$plan")
  }

  test("skew-tuned session leaks nothing into the parent session") {
    SkewOps.skewTunedSession(spark)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }
}
