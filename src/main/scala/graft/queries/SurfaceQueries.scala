package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** API-surface round-out: pivot, generators (explode — the UDTF surface),
  * exact median/percentile, and the typed Dataset API. */
object SurfaceQueries {
  import QueryDef.table

  /** Typed view of the subset of lineitem the typed query uses. */
  final case class LineSlim(l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- p01
    // DataFrame pivot: market segments as columns per region. The oracle
    // spells the pivot as conditional aggregation (engine-portable form).
    QueryDef(
      "p01_pivot",
      (s, dir) => {
        import s.implicits._
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .pivot("c_mktsegment", segs)
          .agg(count(lit(1)))
          .na.fill(0L, segs)
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
          CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
          CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
          CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
          CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
          CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---------------------------------------------------------------- p02
    // Generator / lateral-view surface: posexplode the embedding arrays and
    // aggregate per dimension index. Oracle: UNNEST WITH ORDINALITY.
    QueryDef(
      "p02_explode_lateral",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "embeddings")
          .filter($"vec_id" < 50)
          .select($"vec_id", posexplode($"embedding"))
          // float -> double is exact; scale to micro-units and round to a
          // long so the cross-engine sum is integer-exact (float->decimal
          // casts round differently between engines).
          .withColumn("micros", round($"col".cast(DoubleType) * 1e6).cast(LongType))
          .groupBy($"pos")
          .agg(count(lit(1)).as("n"), sum($"micros").as("sum_micros"))
          .orderBy($"pos")
      },
      Some("""SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros
        FROM (SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                UNNEST(embedding) AS val
              FROM embeddings WHERE vec_id < 50)
        GROUP BY pos ORDER BY pos""")),

    // ---------------------------------------------------------------- p03
    // Exact median + interpolated percentile per group. Both engines
    // compute type-1/interpolated quantiles over doubles identically.
    QueryDef(
      "p03_median_percentile",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            median($"o_totalprice").as("med_price"),
            percentile_approx($"o_totalprice", lit(0.5), lit(100000)).as("p50_approx"),
            count(lit(1)).as("n"))
          .select($"o_orderstatus", $"med_price", $"n") // approx col: no oracle
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, MEDIAN(o_totalprice) AS med_price,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---------------------------------------------------------------- p04
    // Typed Dataset API (Dataset[T] + groupByKey): same answer as the
    // untyped plan — Catalyst compiles both to the same aggregate.
    QueryDef(
      "p04_typed_dataset",
      (s, dir) => {
        import s.implicits._
        val ds = table(s, dir, "lineitem")
          .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
          .as[LineSlim]
        // Typed Aggregators (not mapGroups) so map-side partial aggregation
        // still happens — the scalable shape of typed aggregation.
        import org.apache.spark.sql.{Encoder, Encoders}
        import org.apache.spark.sql.expressions.Aggregator
        val qtyCents = new Aggregator[LineSlim, Long, Long] {
          def zero = 0L
          def reduce(b: Long, l: LineSlim) = b + math.round(l.l_quantity * 100)
          def merge(a: Long, b: Long) = a + b
          def finish(r: Long) = r
          def bufferEncoder: Encoder[Long] = Encoders.scalaLong
          def outputEncoder: Encoder[Long] = Encoders.scalaLong
        }.toColumn.name("qty_cents")
        val nRows = new Aggregator[LineSlim, Long, Long] {
          def zero = 0L
          def reduce(b: Long, l: LineSlim) = b + 1
          def merge(a: Long, b: Long) = a + b
          def finish(r: Long) = r
          def bufferEncoder: Encoder[Long] = Encoders.scalaLong
          def outputEncoder: Encoder[Long] = Encoders.scalaLong
        }.toColumn.name("n")
        ds.groupByKey(_.l_returnflag)
          .agg(qtyCents, nRows)
          .toDF("l_returnflag", "qty_cents", "n")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---------------------------------------------------------------- p05
    // GROUPING SETS with GROUPING() markers — the general form rollup/cube
    // specialize. One Expand + one aggregate, not one pass per set.
    // ORDER BY pins NULLS FIRST explicitly: Spark and DuckDB default
    // opposite null orderings.
    QueryDef(
      "p05_grouping_sets",
      (s, dir) => {
        table(s, dir, "orders").createOrReplaceTempView("p05_orders")
        s.sql("""
          SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(grouping(o_orderstatus) AS INT) AS g_status,
            CAST(grouping(o_orderpriority) AS INT) AS g_prio
          FROM p05_orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY g_status, g_prio,
            o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(grouping(o_orderstatus) AS INT) AS g_status,
          CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio,
          o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // ---------------------------------------------------------------- p06
    // UNPIVOT (wide -> long): the inverse of p01's pivot, spelled as a
    // UNION of per-column projections in the oracle (engine-portable form).
    QueryDef(
      "p06_unpivot",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "supplier")
          .select($"s_suppkey", $"s_nationkey".cast(DoubleType), $"s_acctbal")
          .unpivot(
            ids = Array($"s_suppkey"),
            values = Array($"s_nationkey", $"s_acctbal"),
            variableColumnName = "metric",
            valueColumnName = "value")
          .orderBy($"s_suppkey", $"metric")
      },
      Some("""SELECT s_suppkey, metric, value FROM (
          SELECT s_suppkey, 's_nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value FROM supplier
          UNION ALL
          SELECT s_suppkey, 's_acctbal' AS metric, s_acctbal AS value FROM supplier)
        ORDER BY s_suppkey, metric""")),

    // ---------------------------------------------------------------- p07
    // Date/time function battery over event timestamps: truncation,
    // field extraction, day arithmetic — everything at µs-or-coarser
    // precision (DuckDB truncates the ns parquet column to µs).
    QueryDef(
      "p07_datetime_functions",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "events")
          .filter($"event_id" < 500)
          .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
          .select($"event_id",
            date_trunc("day", $"ts_ts").cast(LongType).as("day_start_s"),
            year($"ts_ts").as("y"),
            month($"ts_ts").as("m"),
            dayofweek($"ts_ts").as("dow"),
            hour($"ts_ts").as("h"),
            datediff($"ts_ts".cast(DateType),
              lit(java.sql.Date.valueOf("2024-01-01"))).as("days_since"))
          .orderBy($"event_id")
      },
      // Spark dayofweek: 1 = Sunday; DuckDB dayofweek: 0 = Sunday
      Some("""SELECT event_id,
          CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start_s,
          CAST(year(ts) AS INT) AS y,
          CAST(month(ts) AS INT) AS m,
          CAST(dayofweek(ts) + 1 AS INT) AS dow,
          CAST(hour(ts) AS INT) AS h,
          CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since
        FROM events WHERE event_id < 500
        ORDER BY event_id""")),

    // ---------------------------------------------------------------- p08
    // Data-profiling summary: per-column row/null/distinct counts and
    // min/max — the first pass any pipeline runs over a new 100 TB drop.
    // One aggregation job per column over only that column (column-pruned
    // scans), unioned into a tall report; no driver-side iteration over
    // data. Long/string columns only: double→string rendering differs
    // across engines, so doubles would break the byte-exact oracle.
    QueryDef(
      "p08_profile_columns",
      (s, dir) => {
        val o = table(s, dir, "orders")
        def prof(c: String) = o
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_val"),
            max(col(c)).cast("string").as("max_val"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_val"), col("max_val"))
        prof("o_orderkey").unionByName(prof("o_custkey"))
          .unionByName(prof("o_orderstatus"))
          .orderBy("column_name")
      },
      Some("""SELECT * FROM (
          SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            COUNT(DISTINCT o_orderkey) AS n_distinct,
            CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
            CAST(MAX(o_orderkey) AS VARCHAR) AS max_val FROM orders
          UNION ALL
          SELECT 'o_custkey', COUNT(*),
            CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            COUNT(DISTINCT o_custkey),
            CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
            FROM orders
          UNION ALL
          SELECT 'o_orderstatus', COUNT(*),
            CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            COUNT(DISTINCT o_orderstatus),
            CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
            FROM orders
        ) ORDER BY column_name""")),

    // ---------------------------------------------------------------- p09
    // Robust outlier profiling (median absolute deviation): per priority
    // class, count orders whose total price deviates more than 3 MADs
    // from the class median — the robust data-quality screen that, unlike
    // z-scores, one whale order cannot drag. Both engines interpolate the
    // median identically (p03 established the percentile twin), and every
    // derived value is IEEE-deterministic from there.
    QueryDef(
      "p09_mad_outliers",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val med = o.groupBy(col("o_orderpriority"))
          .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
        val withDev = o.join(med, Seq("o_orderpriority"))
          .withColumn("adev", abs(col("o_totalprice") - col("med")))
        val mad = withDev.groupBy(col("o_orderpriority"))
          .agg(expr("percentile(adev, 0.5)").as("mad"),
            first(col("med")).as("med"))
        withDev.drop("med").join(mad, Seq("o_orderpriority"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("adev") > col("mad") * 3, 1L).otherwise(0L))
              .as("n_outliers"),
            round(first(col("med")), 2).as("med"),
            round(first(col("mad")), 2).as("mad"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH med AS (
          SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
          FROM orders GROUP BY o_orderpriority),
        dev AS (
          SELECT o.o_orderpriority, ABS(o.o_totalprice - m.med) AS adev, m.med
          FROM orders o JOIN med m USING (o_orderpriority)),
        mad AS (
          SELECT o_orderpriority, quantile_cont(adev, 0.5) AS mad
          FROM dev GROUP BY o_orderpriority)
        SELECT d.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN d.adev > ma.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_outliers,
          ROUND(ANY_VALUE(d.med), 2) AS med,
          ROUND(ANY_VALUE(ma.mad), 2) AS mad
        FROM dev d JOIN mad ma USING (o_orderpriority)
        GROUP BY d.o_orderpriority ORDER BY d.o_orderpriority""")),

    // ---------------------------------------------------------------- p10
    // Higher-order array functions — filter / aggregate (fold) / transform
    // + slice, the lambda surface pipelines lean on for array columns.
    // All codegen'd builtins; the oracle is DuckDB's list_* family over
    // identical token arrays.
    QueryDef(
      "p10_higher_order_functions",
      (s, dir) => {
        QueryDef.table(s, dir, "documents").createOrReplaceTempView("p10_docs")
        s.sql("""SELECT doc_id,
            size(filter(split(text, ' '), t -> length(t) > 5)) AS n_long,
            aggregate(split(text, ' '), 0, (acc, t) -> acc + length(t)) AS chars,
            array_join(transform(slice(split(text, ' '), 1, 3), t -> upper(t)), '_')
              AS head3
          FROM p10_docs ORDER BY doc_id""")
      },
      Some("""SELECT doc_id,
          CAST(len(list_filter(str_split(text, ' '), t -> length(t) > 5)) AS INT)
            AS n_long,
          CAST(list_sum(list_transform(str_split(text, ' '), t -> length(t))) AS INT)
            AS chars,
          array_to_string(list_transform(str_split(text, ' ')[1:3], t -> upper(t)), '_')
            AS head3
        FROM documents ORDER BY doc_id"""))
  )
}
