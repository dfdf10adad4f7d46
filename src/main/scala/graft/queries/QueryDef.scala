package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** One named query: a Spark DataFrame program over the driver testdata plus
  * (where SQL-expressible) an equivalent DuckDB oracle statement over the same
  * parquet tables. Column names/types must line up between the two — the
  * driver sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Load a driver testdata table (see /root/repo/TESTDATA.md).
    *
    * `events.ts` is normalized to epoch-NANOS BIGINT regardless of the
    * file's physical type. Earlier testdata generations wrote
    * TIMESTAMP(NANOS) (readable only as epoch-nano longs via
    * `spark.sql.legacy.parquet.nanosAsLong`); the 2026-08-13 regeneration
    * writes TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ. Every
    * query (and every shipped DuckDB oracle — `epoch_ns(ts)` works on both
    * generations) computes on epoch-nano longs, so the conversion lives
    * here, once. Session timezone is pinned to UTC, making the NTZ→TZ cast
    * an epoch-identity.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        // The NTZ→TZ cast is only an epoch-identity under a UTC session —
        // fail loudly here instead of silently shifting every ts by the
        // local offset when a caller skipped SparkEntry.configure.
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "graft: events.ts conversion requires spark.sql.session.timeZone=UTC " +
            "(call SparkEntry.configure, or set the conf before loading)")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df // LongType already (legacy nanosAsLong read) or absent
    }
  }
}
