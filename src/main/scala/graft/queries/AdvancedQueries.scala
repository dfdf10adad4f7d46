package graft.queries

import org.apache.spark.sql.SparkSession
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
      "a04b_variant_extract",
      (s, dir) => {
        // Spark 4 VARIANT: parse once into the binary semi-structured
        // type, extract TYPED with variant_get — the shredded-JSON path
        // that replaces per-access string re-parsing (at 100 TB, parse
        // cost is per-row-once instead of per-extraction). Same analytic
        // answer as a04's string-path twin, so the two queries
        // cross-check each other through the oracle.
        table(s, dir, "events")
          .withColumn("v", parse_json(col("props")))
          .withColumn("k", try_variant_get(col("v"), "$.k", "int"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k").cast(LongType)).as("sum_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
          CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

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
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---------------------------------------------------------------- a05
    // Range (theta) join: parts priced into non-equi bands. The band table
    // is tiny, so the planner uses a broadcast nested-loop join — the right
    // physical shape (never a shuffled cartesian) at any fact-side scale.
    QueryDef(
      "a05_range_join",
      (s, dir) => {
        import s.implicits._
        val bands = Seq(
          (0.0, 500.0, "budget"), (500.0, 1200.0, "standard"),
          (1200.0, 1800.0, "premium"), (1800.0, 1e9, "luxury"))
          .toDF("lo", "hi", "band")
        table(s, dir, "part")
          .join(broadcast(bands),
            col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_parts"),
            min(col("p_partkey")).as("min_key"))
          .orderBy(col("band"))
      },
      Some("""SELECT band, CAST(COUNT(*) AS BIGINT) AS n_parts,
          CAST(MIN(p_partkey) AS BIGINT) AS min_key
        FROM part
        JOIN (VALUES (0.0, 500.0, 'budget'), (500.0, 1200.0, 'standard'),
                     (1200.0, 1800.0, 'premium'), (1800.0, 1e9, 'luxury')) b(lo, hi, band)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band ORDER BY band""")),

    // ---------------------------------------------------------------- a06
    // Skew-handling salted join: result must equal the plain equi-join
    // (here: lineitem x nation via supplier-nation mapping is synthetic, so
    // use orders⋈customer on custkey with salt from orderkey). The oracle
    // is the PLAIN join — proving salting changes the physical distribution
    // only, never the result.
    QueryDef(
      "a06_salted_join",
      (s, dir) => {
        import s.implicits._
        val orders = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
        val cust = table(s, dir, "customer")
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        graft.ops.SkewOps.saltedJoin(orders, cust, "custkey",
            saltFactor = 8, saltSource = col("o_orderkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast(org.apache.spark.sql.types.DoubleType).as("sum_price"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---------------------------------------------------------------- a07
    // AQE runtime skew-join split: ~99% of rows collapse onto one hot key;
    // an isolated skew-tuned session (thresholds scaled to test size) lets
    // AQE split the hot partition at runtime. The oracle is the plain join —
    // AQE changes scheduling, never results. Plan asserted in SkewSpec.
    QueryDef(
      "a07_aqe_skew_join",
      (s, dir) =>
        graft.ops.SkewOps.skewedJoinDemo(graft.ops.SkewOps.skewTunedSession(s), dir),
      // The generated dim is a key superset, so the inner join is row-neutral
      // and the oracle reduces to the plain aggregation — making "AQE changed
      // scheduling, not results" directly checkable.
      Some("""WITH l AS (
          SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS k,
                 l_quantity
          FROM lineitem WHERE l_orderkey % 4 = 0)
        SELECT 'grp_' || CAST(k % 7 AS VARCHAR) AS tag,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM l GROUP BY tag ORDER BY tag""")),

    // ---------------------------------------------------------------- a08
    // Runtime Bloom-filter join pruning: a selective filter on the DIM
    // side is turned by Catalyst into a bloom_filter_agg subquery whose
    // might_contain() predicate drops non-joining FACT rows BEFORE the
    // join shuffle — at 100 TB this is the difference between shuffling
    // the whole fact table and shuffling only rows that can match.
    // Broadcast is disabled in scope to force the shuffle join the
    // optimization targets; plan shape asserted in RuntimeFilterSpec.
    QueryDef(
      "a08_runtime_filter_join",
      (s, dir) => {
        import s.implicits._
        val saved = Seq(
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.optimizer.runtime.bloomFilter.enabled",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
          .map(k => k -> (try Some(s.conf.get(k)) catch { case _: Exception => None })).toMap
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        try {
          val li = table(s, dir, "lineitem")
          val o = table(s, dir, "orders").filter($"o_totalprice" > 400000.0)
          li.join(o, $"l_orderkey" === $"o_orderkey")
            .groupBy($"o_orderstatus")
            .agg(count(lit(1)).as("n"),
              sum($"l_quantity".cast(DecimalType(18, 2))).cast(DoubleType).as("qty"))
            .orderBy($"o_orderstatus")
            // EAGER checkpoint: plans resolve at action time, so the join
            // must execute while the scoped confs are live — the few
            // aggregated rows materialize here and downstream actions
            // replay the checkpoint, not the join
            .localCheckpoint(true)
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 400000.0
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
  ,

    // ---------------------------------------------------------------- a09
    // Bucketed co-located join: both sides pre-bucketed (8 buckets, sorted)
    // on the join key, so the SortMergeJoin reads bucket i against bucket i
    // with NO shuffle and NO sort — the layout investment that turns every
    // repeated big-big join into a map-side merge at 100 TB. Broadcast is
    // disabled to prove the shuffle elimination (BucketedJoinSpec asserts
    // zero exchanges in the plan); the oracle checks the join itself.
    QueryDef(
      "a09_bucketed_join",
      (s, dir) => {
        import s.implicits._
        val (o, c) = AdvancedQueries.bucketedOrdersCustomer(s, dir)
        val saved =
          try Some(s.conf.get("spark.sql.autoBroadcastJoinThreshold"))
          catch { case _: Exception => None }
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          s.table(o).join(s.table(c), $"o_custkey" === $"c_custkey")
            .groupBy($"c_mktsegment")
            .agg(count(lit(1)).as("n"),
              sum($"o_totalprice".cast(DecimalType(18, 2))).cast(DoubleType)
                .as("total"))
            .orderBy($"c_mktsegment")
            // EAGER checkpoint: the join must plan (and thus skip broadcast)
            // while the scoped conf is live
            .localCheckpoint(true)
        } finally saved match {
          case Some(v) => s.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
          case None => s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
      },
      Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  )

  /** (Re)create the bucketed twin tables for `dir`'s orders/customer —
    * 8 buckets, sorted, on the join keys — and return their names. Shared
    * by the a09 query and BucketedJoinSpec. Bucket files live under
    * /tmp/graft_bucketed; the in-memory catalog entry is rebuilt per
    * session (mode=overwrite), reused within one (bench repeats). */
  def bucketedOrdersCustomer(s: SparkSession, dir: String): (String, String) = {
    // no dots: the tag is used as a SQL table identifier
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    def ensure(name: String, key: String): String = {
      val tbl = s"${name}_bkt_$tag"
      if (!s.catalog.tableExists(tbl)) {
        table(s, dir, name).write
          .bucketBy(8, key).sortBy(key)
          .option("path", s"/tmp/graft_bucketed/$tag/$name")
          .mode("overwrite").saveAsTable(tbl)
      }
      tbl
    }
    (ensure("orders", "o_custkey"), ensure("customer", "c_custkey"))
  }
}
