package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Range-clustering a collection on ONE column gives its segments narrow
  * min/max on that column only — filters on any other column prune
  * nothing. Interleaving the bits of several columns' normalized values
  * produces a single sort key whose ranges are small HYPER-RECTANGLES:
  * every clustered column gets usably narrow per-segment min/max, so
  * manifest stats prune segments for filters on ANY of them. This is the
  * standard lakehouse layout tool (Delta/Iceberg OPTIMIZE ZORDER BY) for
  * multi-predicate workloads at scale.
  *
  * The z-value is pure per-row expression work over broadcast min/max
  * literals (one tiny agg job to fetch them); the only shuffle is the
  * final range repartition — exactly what any layout rewrite pays.
  */
object LayoutOps {

  private val Bits = 16 // 16 bits per dimension, up to 4 dims in one long

  /** Normalized [0, 2^16) bucket of a numeric column given global min/max. */
  private def bucket(c: Column, mn: Double, mx: Double): Column = {
    val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
    least(greatest((c.cast("double") - lit(mn)) / lit(span) * lit(65535.0),
      lit(0.0)), lit(65535.0)).cast("long")
  }

  /** Morton-interleave up to 4 columns into one long: bit i of column j
    * lands at position i*n + j, so consecutive z values stay inside small
    * axis-aligned boxes of the value space. */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double]): Column = {
    require(cols.nonEmpty && cols.length <= 4, "z-order supports 1-4 columns")
    val n = cols.length
    cols.zipWithIndex.map { case (c, j) =>
      val b = bucket(c, mins(j), maxs(j))
      aggregate(sequence(lit(0), lit(Bits - 1)), lit(0L),
        (acc, i) => acc.bitwiseOR(
          call_function("shiftleft",
            call_function("shiftright", b, i).bitwiseAND(lit(1L)),
            i * n + j)))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into a z-ordered layout frame: range-partitioned and
    * sorted by the interleaved key (dropped before returning — it is
    * transport, not data). Null cluster values sort first, together. */
  def zOrderBy(df: DataFrame, colNames: Seq[String], numPartitions: Int): DataFrame = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // min/max are NULL for an empty frame or an all-NULL column; getDouble
    // would throw a bare NPE from inside Collection.cluster(). Name the
    // offending column instead.
    colNames.zipWithIndex.foreach { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"z-order column '$c' has no non-null values (empty collection?)")
    }
    val mins = colNames.indices.map(i => row.getDouble(2 * i))
    val maxs = colNames.indices.map(i => row.getDouble(2 * i + 1))
    df.withColumn("__z", zValue(colNames.map(col), mins, maxs))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
