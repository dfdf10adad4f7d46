package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * `sample()`/`TABLESAMPLE` are seed-dependent and engine-specific — two
  * runs (or two engines) disagree on membership. Content-hash sampling
  * instead derives membership from a stable hash of the row's id, so the
  * same document lands in the same split on every run, on any engine, at
  * any parallelism: the property that makes train/held-out splits and
  * cross-run ablations reproducible at 100 TB. Pure per-row codegen'd
  * expression work — no shuffle, no driver participation.
  */
object SampleOps {

  /** Stable hex bucket in "00".."ff" for a row id: the first byte of
    * md5(id). md5 (not xxhash64) because every engine agrees on it —
    * membership can be recomputed by any downstream system. */
  def hashBucket(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2)

  /** Keep rows whose bucket sorts below `hexBoundExclusive` ("20" keeps
    * 32/256 = 12.5%). Deterministic, content-addressed, uniform: md5
    * spreads ids evenly across buckets regardless of id distribution. */
  def contentHashSample(df: DataFrame, idCol: String,
      hexBoundExclusive: String = "20"): DataFrame =
    df.filter(hashBucket(col(idCol)) < hexBoundExclusive)

  /** Disjoint deterministic split label ("train" below the boundary,
    * "heldout" at/above) — the two-way form of [[contentHashSample]]. */
  def splitLabel(idCol: Column, trainBoundExclusive: String = "f0"): Column =
    when(hashBucket(idCol) < trainBoundExclusive, "train").otherwise("heldout")

  /** Deterministic training shuffle + stable shard assignment: the
    * reproducible global permutation a training run reads the corpus in.
    * `shuffle_key` = md5(seed:id) is an engine-independent pseudo-random
    * sort key; `shard` = its first 16 bits mod `numShards` (hash-sharded,
    * so there is NO global sort — every shard is an independent slice);
    * `shard_pos` = rank within the shard by the same key (a per-shard
    * sort, exactly the order a shard writer streams its file). Same seed →
    * bit-identical shards and order on any engine, at any parallelism —
    * the property that makes data-order ablations and mid-run restarts
    * reproducible at 100 TB. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
      seed: String = "graft"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val shard = (conv(substring(key, 1, 4), 16, 10).cast("long") % numShards)
      .cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", key)
      .withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
  }

  /** Stratified deterministic sampling: per-stratum keep rates expressed
    * as hex bucket bounds ("80" = 50%, "10" = 6.25%), applied by stratum
    * value — the language/domain-rebalancing pass every corpus mix runs,
    * reproducible because membership is still content-hashed. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      bounds: Map[String, String], defaultBound: String): DataFrame = {
    val bound = bounds.foldLeft(lit(defaultBound)) { case (acc, (value, b)) =>
      when(col(strataCol) === value, lit(b)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < bound)
  }
}
