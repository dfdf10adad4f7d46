package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward temporal) join: for every left row, attach the single
  * most recent right row with the same key and right.ts <= left.ts.
  *
  * Implemented by composition (SURVEY §2.3 preference (a)): tag both
  * sides, union, then a single `last_value(ignoreNulls)` window ordered by
  * (ts, side) within each key. This is the scale-correct shape — ONE
  * shuffle on the key, no range-join explosion, no per-key driver work —
  * the same sort-merge structure a native as-of operator would use.
  * Equivalent to DuckDB/QuestDB `ASOF JOIN` semantics.
  */
object AsOfJoin {

  /** @param left      probe side (e.g. events)
    * @param right     reference side (e.g. price updates)
    * @param key       equality key column name (present on both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightVals right value columns to attach (null when no right row
    *                  at or before the left timestamp exists)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Union layout: key, ts, side (0=right so it sorts before a left row
    // with the same ts — "at or before"), left payload, right payload.
    val l = left.select(
      col(key).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        (leftCols.map(c => col(c).as(s"__l_$c")) ++
          rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
          rightVals.map(c => col(c).as(s"__r_$c"))): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .select(col("*") +: rightVals.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__rv_$c")): _*)
      .filter(col("__side") === 1) // keep left rows only
    joined.select(
      leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightVals.map(c => col(s"__rv_$c").as(c)): _*)
  }
}
