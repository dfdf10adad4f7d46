package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ProductAgg
import graft.ops.AsOfJoin

/** Advanced relational surface: as-of join, UDAF, CUBE, JSON functions. */
object AdvancedQueries {
  import QueryDef.table

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- a01
    // As-of join: for each click, the value of the user's most recent
    // purchase at or before the click. Composed as one shuffle + window
    // (see AsOfJoin); the oracle uses DuckDB's native ASOF LEFT JOIN.
    // Both sides order on µs-truncated timestamps (DuckDB reads the ns
    // parquet column as µs).
    QueryDef(
      "a01_asof_join",
      (s, dir) => {
        val ev = table(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), col("value"))
        AsOfJoin.backward(clicks, purchases, key = "user_id",
          leftTs = "ts_us", rightTs = "ts_us", rightVals = Seq("value"))
          .select(col("event_id"), col("user_id"),
            col("value").as("last_purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT l.event_id, l.user_id, r.value AS last_purchase_value
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND r.ts_us <= l.ts_us
        ORDER BY l.event_id""")),

    // ---------------------------------------------------------------- a02
    // Typed Aggregator (UDAF): PRODUCT aggregate, which Spark lacks.
    // Product of per-lineitem (1+tax) per order — compounded tax factor.
    QueryDef(
      "a02_product_udaf",
      (s, dir) => {
        val li = table(s, dir, "lineitem").filter(col("l_orderkey") < 500)
        li.groupBy(col("l_orderkey"))
          .agg(round(ProductAgg.column(lit(1.0) + col("l_tax")), 6).as("tax_factor"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, ROUND(product(1.0 + l_tax), 6) AS tax_factor
        FROM lineitem WHERE l_orderkey < 500
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---------------------------------------------------------------- a03
    // CUBE grouping sets over two dimensions (region × market segment).
    QueryDef(
      "a03_cube",
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val nat = table(s, dir, "nation")
        val reg = table(s, dir, "region")
        cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .cube(col("r_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region_name"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("n"))
          .orderBy(col("region_name"), col("segment"))
      },
      Some("""SELECT COALESCE(r_name, 'ALL') AS region_name,
          COALESCE(c_mktsegment, 'ALL') AS segment,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, c_mktsegment)
        ORDER BY region_name, segment""")),

    // ---------------------------------------------------------------- a04
    // JSON scalar functions: extract a field from the events props JSON.
    QueryDef(
      "a04_json_extract",
      (s, dir) => {
        table(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k").cast(LongType)).as("sum_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
          CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
