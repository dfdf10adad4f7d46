package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` exercising the UDAF surface (SURVEY §2.3): a PRODUCT
  * aggregate, which Spark lacks as a builtin. Null inputs are ignored
  * (SQL-aggregate convention); an all-null/empty group yields null.
  *
  * Buffer is (product, sawValue) so merge stays associative and partial
  * (map-side) aggregation works — the property that makes any Aggregator
  * scale: combiners run per-partition, only tiny buffers shuffle.
  */
object ProductAgg extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
  override def zero: (Double, Boolean) = (1.0, false)
  override def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
    if (a == null) b else (b._1 * a, true)
  override def merge(b1: (Double, Boolean), b2: (Double, Boolean)): (Double, Boolean) =
    (b1._1 * b2._1, b1._2 || b2._2)
  override def finish(r: (Double, Boolean)): java.lang.Double =
    if (r._2) r._1 else null
  override def bufferEncoder: Encoder[(Double, Boolean)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Column-world handle: `df.agg(ProductAgg.column($"x"))`. */
  def column: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(ProductAgg)

  /** SQL registration: `SELECT product_agg(x) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("product_agg", udaf(ProductAgg))
}
