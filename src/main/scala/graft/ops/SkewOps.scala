package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utility: salted equi-join.
  *
  * When a join key is heavily skewed (one key holds a large fraction of the
  * build side), a plain shuffle join sends the hot key's rows to ONE
  * reducer. Salting splits each hot key into `saltFactor` sub-keys: the
  * probe side gets a deterministic salt from a secondary column's hash, the
  * build side is replicated once per salt value, and the join runs on
  * (key, salt) — spreading the hot key over `saltFactor` reducers.
  *
  * Results are exactly the plain join's rows. AQE's skew-join handles many
  * cases automatically; explicit salting remains the tool when AQE can't
  * split (e.g. a single monster key inside one unsplittable partition).
  */
object SkewOps {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, saltSource: Column): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** A session tuned so AQE's runtime skew-join split actually fires at
    * test scale: isolated SQLConf via `newSession()` (shared SparkContext,
    * nothing leaks into the caller's session), sort-merge forced (a
    * broadcast join has no skew problem to demonstrate), and the skew
    * thresholds lowered from their cluster-scale defaults (256 MB) to
    * values a local dataset reaches. At 100 TB the DEFAULTS fire the same
    * mechanism — this tuning only scales the demo down, it does not change
    * the plan shape. */
  def skewTunedSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "UTC")
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256B")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256B")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2
  }

  /** A synthetically skewed fact⋈dim join: ~99% of lineitem rows collapse
    * onto hot key 0, the dim side is a generated superset of the keys
    * (inner-join-neutral: dim keys absent from the fact produce nothing, so
    * results equal the plain aggregation) — the shape AQE's skew-join split
    * exists for. The dim is generated rather than `distinct()`-derived
    * because OptimizeSkewedJoin only matches SMJ(Sort(Shuffle),
    * Sort(Shuffle)): an aggregation between shuffle and join defeats it.
    * Returns the aggregated join result (tiny, deterministic) so
    * correctness is oracle-checkable while the interesting part — the
    * runtime-split sort-merge join — shows in the executed plan. */
  def skewedJoinDemo(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // repartition(8) guarantees the join shuffle has MULTIPLE map tasks:
    // AQE splits a skewed reduce partition by mapper ranges, so a hot key
    // written by a single mapper (one small parquet file locally) is
    // unsplittable no matter its size. On a cluster the scan itself has
    // many mappers; this models that shape at test scale.
    // Column-prune to the two needed columns and keep a deterministic 1/4
    // of the rows BEFORE the repartition shuffle: the demo proves the same
    // AQE split (hot key still ~96% of kept rows, far above the lowered
    // thresholds) at a quarter of the shuffle volume.
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .filter(pmod(col("l_orderkey"), lit(4)) === 0)
      .repartition(8)
      .withColumn("k",
        when(pmod(col("l_orderkey"), lit(100)) === 0, col("l_orderkey")).otherwise(lit(0L)))
    val maxK = l.agg(max(col("k"))).head().getLong(0)
    val dim = spark.range(0, maxK / 100 + 1)
      .select((col("id") * 100).as("k"))
      .withColumn("tag", concat(lit("grp_"), pmod(col("k"), lit(7))))
    l.join(dim, "k")
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("qty"))
      .orderBy(col("tag"))
  }
}
