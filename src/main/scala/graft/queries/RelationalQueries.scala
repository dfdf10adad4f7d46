package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The relational operator battery (SURVEY.md §2.3): every standard operator
  * category absent from the reference, provided Spark-first via Catalyst.
  * Each query is deterministic (full ORDER BY) and float-safe: double
  * aggregates are summed through DECIMAL(18,x) casts — exact and
  * order-independent — then cast back to double, so Spark and the DuckDB
  * oracle produce bit-identical values regardless of partitioning.
  */
object RelationalQueries {
  import QueryDef.table

  /** Exact, order-independent sum of a double column: cast each value to
    * DECIMAL (exact for 2-dp money data), sum exactly, return as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** SQL-side twin of [[dsum]]. */
  private def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"

  private val cnt = "CAST(COUNT(*) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- q01
    // TPC-H Q1-style pricing summary: scan + filter + hash aggregate.
    // Partial (map-side) aggregation comes free from Catalyst; only 4
    // groups survive the shuffle.
    QueryDef(
      "q01_agg_pricing",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit(java.time.LocalDateTime.parse("1998-09-02T00:00:00")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            sum($"l_extendedprice".cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2))))
              .cast(DoubleType).as("sum_disc_price"),
            (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
            (dsum($"l_extendedprice") / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
        ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price,
        $cnt AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---------------------------------------------------------------- q02
    // Star-schema join: two broadcast dims (region, nation) into customer.
    // Both dims are tiny at any SF — explicit broadcast() keeps the plan
    // shuffle-free on the probe side even at 100 TB fact scale.
    QueryDef(
      "q02_join_star_broadcast",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer")
        val nat = table(s, dir, "nation")
        val reg = table(s, dir, "region")
        cust
          .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
          .orderBy($"r_name")
      },
      Some(s"""SELECT r_name, $cnt AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // ---------------------------------------------------------------- q03
    // Fact-to-fact shuffle join (orders ⋈ lineitem on orderkey) + distinct
    // count. At scale both sides shuffle on the join key once; AQE picks
    // SMJ/shuffled-hash by size.
    QueryDef(
      "q03_join_fact_fact",
      (s, dir) => {
        import s.implicits._
        val o = table(s, dir, "orders").filter($"o_orderstatus" =!= "F")
        val li = table(s, dir, "lineitem")
        o.join(li, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderpriority")
          .agg(
            countDistinct($"o_orderkey").as("n_orders"),
            sum($"l_extendedprice".cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2))))
              .cast(DoubleType).as("revenue"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---------------------------------------------------------------- q04
    // Window: top-3 orders per customer (row_number, fully-tiebroken order
    // for determinism). Becomes a single shuffle on o_custkey.
    QueryDef(
      "q04_window_topn",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        table(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) t
        WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---------------------------------------------------------------- q05
    // Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    // per-partition heaps + driver merge, no full sort at scale.
    QueryDef(
      "q05_sort_topk",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // ---------------------------------------------------------------- q06
    // Set operations: EXCEPT / INTERSECT over distinct key sets, tagged and
    // unioned into one deterministic result.
    QueryDef(
      "q06_setops",
      (s, dir) => {
        import s.implicits._
        val cn = table(s, dir, "customer").select($"c_nationkey".as("nationkey")).distinct()
        val sn = table(s, dir, "supplier").select($"s_nationkey".as("nationkey")).distinct()
        cn.except(sn).withColumn("tag", lit("customer_only"))
          .unionByName(sn.except(cn).withColumn("tag", lit("supplier_only")))
          .unionByName(cn.intersect(sn).withColumn("tag", lit("both")))
          .orderBy($"tag", $"nationkey")
      },
      Some("""SELECT nationkey, tag FROM (
          SELECT nationkey, 'customer_only' AS tag FROM
            (SELECT DISTINCT c_nationkey AS nationkey FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier) a
          UNION ALL
          SELECT nationkey, 'supplier_only' AS tag FROM
            (SELECT DISTINCT s_nationkey AS nationkey FROM supplier EXCEPT SELECT DISTINCT c_nationkey FROM customer) b
          UNION ALL
          SELECT nationkey, 'both' AS tag FROM
            (SELECT DISTINCT c_nationkey AS nationkey FROM customer INTERSECT SELECT DISTINCT s_nationkey FROM supplier) c
        ) u ORDER BY tag, nationkey""")),

    // ---------------------------------------------------------------- q07
    // Scalar function battery: string/date/math built-ins (all codegen'd —
    // no UDFs). Avoids libm-divergent fns (pow/exp/log) for oracle parity.
    QueryDef(
      "q07_scalar_functions",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "part")
          .filter($"p_partkey" % 10 === 0)
          .select(
            $"p_partkey",
            upper($"p_brand").as("brand_u"),
            length($"p_name").as("name_len"),
            substring($"p_type", 1, 5).as("type_pfx"),
            concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
            ($"p_partkey" % 7).as("key_mod7"),
            abs($"p_retailprice" - 1000.0).as("price_dist"),
            sqrt($"p_size".cast(DoubleType)).as("size_sqrt"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
          UPPER(p_brand) AS brand_u,
          CAST(LENGTH(p_name) AS INT) AS name_len,
          SUBSTRING(p_type, 1, 5) AS type_pfx,
          p_brand || '/' || p_type AS brand_type,
          p_partkey % 7 AS key_mod7,
          ABS(p_retailprice - 1000.0) AS price_dist,
          SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt
        FROM part WHERE p_partkey % 10 = 0 ORDER BY p_partkey""")),

    // ---------------------------------------------------------------- q08
    // ROLLUP (grouping sets): region → nation → grand total, subtotal rows
    // disambiguated via COALESCE (names are never null in the data).
    QueryDef(
      "q08_rollup",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(table(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
          .select(
            coalesce($"r_name", lit("ALL")).as("region_name"),
            coalesce($"n_name", lit("ALL")).as("nation_name"),
            $"n_cust", $"sum_bal")
          .orderBy($"region_name", $"nation_name")
      },
      Some(s"""SELECT COALESCE(r_name, 'ALL') AS region_name,
          COALESCE(n_name, 'ALL') AS nation_name,
          $cnt AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region_name, nation_name""")),

    // ---------------------------------------------------------------- q09
    // Semi/anti joins (EXISTS / NOT EXISTS). left_semi/left_anti never
    // materialize the probe payload — the scalable form of EXISTS.
    QueryDef(
      "q09_semi_anti_join",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer")
        val ordKeys = table(s, dir, "orders").select($"o_custkey")
        val semi = cust.join(ordKeys, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", lit("has_orders").as("tag"))
        val anti = cust.join(ordKeys, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", lit("no_orders").as("tag"))
        semi.unionByName(anti).orderBy($"tag", $"c_custkey")
      },
      Some("""SELECT c_custkey, tag FROM (
          SELECT c_custkey, 'has_orders' AS tag FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          UNION ALL
          SELECT c_custkey, 'no_orders' AS tag FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ) u ORDER BY tag, c_custkey""")),

    // ---------------------------------------------------------------- q10
    // Multi-column DISTINCT aggregation (expands to two aggregate passes
    // under Catalyst's RewriteDistinctAggregates).
    QueryDef(
      "q10_distinct_agg",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_suppkey").as("n_supp"),
            countDistinct($"l_partkey").as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some(s"""SELECT l_returnflag,
          CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
          CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
          $cnt AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---------------------------------------------------------------- q11
    // Time-bucketed event aggregation. events.ts is read as epoch-nanos
    // bigint (Spark can't ingest parquet TIMESTAMP(NANOS) natively —
    // spark.sql.legacy.parquet.nanosAsLong=true); integer `div` keeps the
    // bucket arithmetic exact in both engines.
    QueryDef(
      "q11_events_hourly",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "events")
          .groupBy(expr("ts div 3600000000000").as("hour_bucket"), $"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
          .orderBy($"hour_bucket", $"event_type")
      },
      Some(s"""SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
          $cnt AS n, ${sqlDsum("value")} AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---------------------------------------------------------------- q12
    // Correlated-subquery semantics (customers above their nation's mean
    // balance) expressed as a co-grouped self-join — the decorrelated,
    // shuffle-once form Catalyst would target anyway.
    QueryDef(
      "q12_above_nation_avg",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer")
        val navg = cust.groupBy($"c_nationkey".as("nk"))
          .agg((dsum($"c_acctbal") / count(lit(1))).as("nation_avg"))
        cust.join(navg, $"c_nationkey" === $"nk")
          .filter($"c_acctbal" > $"nation_avg")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_above"), min($"c_custkey").as("min_custkey"))
          .orderBy($"c_nationkey")
      },
      Some(s"""SELECT c_nationkey, $cnt AS n_above,
          CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
        FROM customer c
        JOIN (SELECT c_nationkey AS nk,
                ${sqlDsum("c_acctbal")} / COUNT(*) AS nation_avg
              FROM customer GROUP BY c_nationkey) a ON c.c_nationkey = a.nk
        WHERE c_acctbal > nation_avg
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ---------------------------------------------------------------- q13
    // CASE expression + conditional aggregation (pivot-style counting).
    QueryDef(
      "q13_case_conditional_agg",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "part")
          .withColumn("price_band",
            when($"p_retailprice" < 500.0, "low")
              .when($"p_retailprice" < 1500.0, "mid")
              .otherwise("high"))
          .groupBy($"p_brand")
          .agg(
            count(lit(1)).as("n_parts"),
            sum(when($"price_band" === "low", 1L).otherwise(0L)).as("n_low"),
            sum(when($"price_band" === "mid", 1L).otherwise(0L)).as("n_mid"),
            sum(when($"price_band" === "high", 1L).otherwise(0L)).as("n_high"))
          .orderBy($"p_brand")
      },
      Some(s"""SELECT p_brand, $cnt AS n_parts,
          CAST(SUM(CASE WHEN p_retailprice < 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
          CAST(SUM(CASE WHEN p_retailprice >= 500.0 AND p_retailprice < 1500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
          CAST(SUM(CASE WHEN p_retailprice >= 1500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // ---------------------------------------------------------------- q14
    // HAVING (post-aggregation filter).
    QueryDef(
      "q14_having",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "supplier")
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n_supp"), dsum($"s_acctbal").as("sum_bal"))
          .filter($"n_supp" >= 2)
          .orderBy($"s_nationkey")
      },
      Some(s"""SELECT s_nationkey, $cnt AS n_supp, ${sqlDsum("s_acctbal")} AS sum_bal
        FROM supplier GROUP BY s_nationkey HAVING COUNT(*) >= 2
        ORDER BY s_nationkey""")),

    // ---------------------------------------------------------------- q15
    // Running window aggregate (cumulative revenue per supplier over a
    // fully-tiebroken ordering; decimal-summed for cross-engine parity).
    QueryDef(
      "q15_window_running_sum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "lineitem")
          .filter($"l_suppkey" % 50 === 0)
          .withColumn("running_qty",
            sum($"l_quantity".cast(DecimalType(18, 2))).over(w).cast(DoubleType))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        FROM lineitem WHERE l_suppkey % 50 = 0
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // ---------------------------------------------------------------- q16
    // LAG window: inter-event gap per user. Computed at MICROsecond
    // precision on both sides — DuckDB (the oracle) truncates parquet
    // TIMESTAMP(NANOS) to µs on read, so the window ordering and the gap
    // must use the same truncation to agree bit-for-bit.
    QueryDef(
      "q16_window_lag",
      (s, dir) => {
        import s.implicits._
        val tsUs = expr("ts div 1000")
        val w = Window.partitionBy($"user_id").orderBy(tsUs, $"event_id")
        table(s, dir, "events")
          .filter($"user_id" % 10 === 0)
          .withColumn("ts_us", tsUs)
          .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
          .select($"user_id", $"event_id", $"gap_us")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
          epoch_us(ts) - LAG(epoch_us(ts), 1)
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        FROM events WHERE user_id % 10 = 0
        ORDER BY user_id, event_id""")),

    // ---------------------------------------------------------------- q17
    // Correlated EXISTS / NOT EXISTS — Catalyst rewrites both to semi/anti
    // joins (one shuffle each), never a per-row subquery execution.
    QueryDef(
      "q17_exists_subquery",
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("q17_customer")
        table(s, dir, "orders").createOrReplaceTempView("q17_orders")
        s.sql("""
          SELECT c_custkey, c_name FROM q17_customer c
          WHERE EXISTS (SELECT 1 FROM q17_orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
            AND NOT EXISTS (SELECT 1 FROM q17_orders o2
                            WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q18
    // Correlated scalar subquery — decorrelated by Catalyst into an
    // aggregate + left outer join, not N executions.
    QueryDef(
      "q18_scalar_subquery",
      (s, dir) => {
        table(s, dir, "nation").createOrReplaceTempView("q18_nation")
        table(s, dir, "supplier").createOrReplaceTempView("q18_supplier")
        s.sql("""
          SELECT n_name,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM q18_supplier s
             WHERE s.s_nationkey = n.n_nationkey) AS n_suppliers
          FROM q18_nation n ORDER BY n_name""")
      },
      Some("""SELECT n_name,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier s
           WHERE s.s_nationkey = n.n_nationkey) AS n_suppliers
        FROM nation n ORDER BY n_name""")),

    // ---------------------------------------------------------------- q19
    // Approximate distinct (HLL++): sketch values are engine-specific, so
    // the oracle-checkable contract is the exact count plus a bound: the
    // approximation must land within 5% of exact (rsd configured at 2%).
    QueryDef(
      "q19_approx_distinct",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders")
          .agg(
            countDistinct($"o_custkey").as("exact_custkeys"),
            approx_count_distinct($"o_custkey", 0.02).as("approx"))
          .select($"exact_custkeys",
            (abs($"approx" - $"exact_custkeys") <=
              $"exact_custkeys" * 0.05).as("approx_within_5pct"))
      },
      Some("""SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
          TRUE AS approx_within_5pct FROM orders""")),

    // ---------------------------------------------------------------- q20
    // Bag-semantics set ops: INTERSECT ALL (multiplicity = min of counts)
    // and EXCEPT ALL (left count minus right count, floored at 0) — the
    // variants q06's distinct set ops don't cover.
    QueryDef(
      "q20_setops_all",
      (s, dir) => {
        import s.implicits._
        val co = table(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        val so = table(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
        co.intersectAll(so).withColumn("tag", lit("intersect_all"))
          .unionByName(co.exceptAll(so).withColumn("tag", lit("except_all")))
          .groupBy($"tag", $"nationkey").agg(count(lit(1)).as("n"))
          .orderBy($"tag", $"nationkey")
      },
      Some("""WITH co AS (SELECT c_nationkey AS nationkey FROM customer),
          so AS (SELECT s_nationkey AS nationkey FROM supplier),
          tagged AS (
            SELECT 'intersect_all' AS tag, nationkey
            FROM (SELECT nationkey FROM co INTERSECT ALL SELECT nationkey FROM so)
            UNION ALL
            SELECT 'except_all' AS tag, nationkey
            FROM (SELECT nationkey FROM co EXCEPT ALL SELECT nationkey FROM so))
        SELECT tag, nationkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM tagged GROUP BY tag, nationkey ORDER BY tag, nationkey""")),

    // ---------------------------------------------------------------- q21
    // Value-based window frame (RANGE BETWEEN N PRECEDING): sums over a
    // sliding KEY RANGE, not a row count — q15's rows-frame sibling.
    QueryDef(
      "q21_window_range_frame",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus").orderBy($"o_orderkey")
          .rangeBetween(-100L, Window.currentRow)
        table(s, dir, "orders").filter($"o_orderkey" < 5000)
          .select($"o_orderkey", $"o_orderstatus",
            sum($"o_totalprice".cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType).as("sum_nearby"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_nearby
        FROM orders WHERE o_orderkey < 5000
        ORDER BY o_orderkey""")),

    // ---------------------------------------------------------------- q22
    // Sessionization: per-user event streams split at 30-minute silence
    // gaps (lag + conditional cumsum — the canonical window-function
    // pattern; one shuffle on user_id). Timestamps compared at µs on both
    // engines (the parquet column is ns; DuckDB truncates to µs).
    QueryDef(
      "q22_sessionize",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        table(s, dir, "events")
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
          .withColumn("new_session",
            when($"gap_us".isNull || $"gap_us" > 30L * 60 * 1000000, 1L).otherwise(0L))
          .groupBy($"user_id")
          .agg(sum($"new_session").as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""WITH gaps AS (
          SELECT user_id,
            epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap_us
          FROM events)
        SELECT user_id,
          CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM gaps GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q23
    // RECURSIVE CTE (Spark 4.x WITH RECURSIVE): hierarchical rollup over
    // the implicit binary tree parent(k) = k div 2 on customer keys —
    // per root < 8: descendant count and exact-decimal balance sum. The
    // recursion is the declarative form of iterative joins; Catalyst
    // plans each step as a join on the frontier (same scale shape as the
    // CC loops, but expressed in pure SQL).
    QueryDef(
      "q23_recursive_cte",
      (s, dir) => {
        // Examined for r19 (profiled, left alone): the 2 s at sf0.1 is
        // ~55 sub-10ms jobs plus ~2 s of DRIVER time — UnionLoop
        // re-plans and re-optimizes each of the ~14 recursion steps; no
        // stage exceeds 10 ms of executor run time. A cached/projected
        // view with a precomputed `parent` key was measured (2.07 →
        // 2.26 s best-of-3: cache-write cost, zero scan savings) and
        // reverted. The residual cost is the recursion's per-iteration
        // planning floor, which only a closed-form rewrite could remove
        // — and that would stop exercising WITH RECURSIVE at all.
        QueryDef.table(s, dir, "customer").createOrReplaceTempView("q23_customer")
        s.sql("""WITH RECURSIVE reach(root, node) AS (
            SELECT c_custkey, c_custkey FROM q23_customer WHERE c_custkey < 8
            UNION ALL
            SELECT r.root, c.c_custkey
            FROM reach r JOIN q23_customer c ON c.c_custkey DIV 2 = r.node
              AND c.c_custkey >= 8)
          SELECT r.root, CAST(COUNT(*) AS BIGINT) AS n_desc,
            CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
          FROM reach r JOIN q23_customer c ON c.c_custkey = r.node
          GROUP BY r.root ORDER BY r.root""")
      },
      Some("""WITH RECURSIVE reach(root, node) AS (
          SELECT c_custkey, c_custkey FROM customer WHERE c_custkey < 8
          UNION ALL
          SELECT r.root, c.c_custkey
          FROM reach r JOIN customer c ON c.c_custkey // 2 = r.node
            AND c.c_custkey >= 8)
        SELECT r.root, CAST(COUNT(*) AS BIGINT) AS n_desc,
          CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM reach r JOIN customer c ON c.c_custkey = r.node
        GROUP BY r.root ORDER BY r.root"""))
    ,

    // ---------------------------------------------------------------- q24
    // LATERAL correlated subquery join — per-outer-row top-N without a
    // window over the whole table: for each nation, the lateral subquery
    // computes its own ORDER BY ... LIMIT 2 over that nation's suppliers.
    // Catalyst decorrelates this into a ranked join (same physical shape
    // as q04's window top-N) — the declarative form survives optimization
    // rather than forcing a per-row loop.
    QueryDef(
      "q24_lateral_join",
      (s, dir) => {
        QueryDef.table(s, dir, "nation").createOrReplaceTempView("q24_nation")
        QueryDef.table(s, dir, "supplier").createOrReplaceTempView("q24_supplier")
        s.sql("""SELECT n.n_name, t.s_name, t.s_acctbal
          FROM q24_nation n,
          LATERAL (SELECT s_name, s_acctbal FROM q24_supplier s
                   WHERE s.s_nationkey = n.n_nationkey
                   ORDER BY s_acctbal DESC, s_name LIMIT 2) t
          ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""")
      },
      Some("""SELECT n.n_name, t.s_name, t.s_acctbal
        FROM nation n,
        LATERAL (SELECT s_name, s_acctbal FROM supplier s
                 WHERE s.s_nationkey = n.n_nationkey
                 ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""")),

    // ---------------------------------------------------------------- q25
    // VALUE-RANGE window frame: per-user trailing one-hour sum over the
    // event stream — RANGE BETWEEN <interval> PRECEDING, the time-window
    // frame ROWS frames can't express (peers by VALUE distance, not row
    // count). Sums ride DECIMAL on both engines (FP frame-order trap).
    QueryDef(
      "q25_range_frame_window",
      (s, dir) => {
        QueryDef.table(s, dir, "events").createOrReplaceTempView("q25_events")
        s.sql("""SELECT user_id, ts,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS win_sum
          FROM q25_events WHERE user_id % 20 = 0
          ORDER BY user_id, ts""")
      },
      Some("""SELECT user_id, epoch_ns(ts) AS ts,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
            PARTITION BY user_id ORDER BY epoch_ns(ts)
            RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS win_sum
        FROM events WHERE user_id % 20 = 0
        ORDER BY user_id, ts""")),

    // ---------------------------------------------------------------- q26
    // Rank-family windows: ntile / percent_rank / cume_dist plus
    // first_value IGNORE NULLS — the remaining ranked-analytics quartet
    // (quartile bucketing, relative standing, null-skipping carry-forward)
    // over per-customer order histories. Total orderings everywhere
    // (orderkey tiebreaks) so both engines rank identically; the
    // rank-fraction doubles are exact dyadic rationals, no rounding trap.
    QueryDef(
      "q26_window_rank_family",
      (s, dir) => {
        QueryDef.table(s, dir, "orders").createOrReplaceTempView("q26_orders")
        s.sql("""SELECT o_custkey, o_orderkey,
            NTILE(4) OVER w AS price_quartile,
            ROUND(PERCENT_RANK() OVER w, 6) AS pr,
            ROUND(CUME_DIST() OVER w, 6) AS cd,
            FIRST_VALUE(CASE WHEN o_totalprice > 200000 THEN o_orderkey END)
              IGNORE NULLS OVER
              (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
              AS first_big
          FROM q26_orders WHERE o_custkey % 50 = 0
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
          ORDER BY o_custkey, o_orderkey""")
      },
      Some("""SELECT o_custkey, o_orderkey,
          NTILE(4) OVER w AS price_quartile,
          ROUND(PERCENT_RANK() OVER w, 6) AS pr,
          ROUND(CUME_DIST() OVER w, 6) AS cd,
          FIRST_VALUE(CASE WHEN o_totalprice > 200000 THEN o_orderkey END
            IGNORE NULLS) OVER
            (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
            AS first_big
        FROM orders WHERE o_custkey % 50 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey"""))
  )
}
