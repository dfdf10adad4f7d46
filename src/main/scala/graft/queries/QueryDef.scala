package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** Load a driver testdata table (see /root/repo/TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
