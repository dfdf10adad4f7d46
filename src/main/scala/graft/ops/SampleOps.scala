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

  /** TARGET-MIXTURE resampling: given target mixture weights per source
    * (the static data-reweighting pass every pretraining corpus runs —
    * "make the mix 40% web, 40% books, 20% code"), keep the LARGEST
    * deterministic subsample whose source proportions match the targets.
    * The binding source (smallest n_s/w_s) keeps everything; every other
    * weighted source keeps the fraction p_s = w_s·T/n_s where
    * T = min_s(n_s/w_s); unweighted sources drop. Membership is a pure
    * map-side hash-threshold test — `md5(seed:id)`'s first 8 hex digits
    * compared against the per-source bound as STRINGS (lowercase-hex
    * lexicographic order IS numeric order) — so the only distributed work
    * beyond one tiny per-source count agg is a codegen'd filter: no
    * shuffle, no windows, reproducible on any engine at any parallelism.
    * Proportions are binomial-exact (±O(√n)), which at corpus scale is
    * the right trade against a per-source global sort. */
  def mixtureResample(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], seed: String = "graft"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "mixture weights must be positive")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    require(present.nonEmpty, "no weighted source present in the corpus")
    val t = present.map { case (s, w) => counts(s).toDouble / w }.min
    val bounds: Map[String, String] = present.map { case (s, w) =>
      val p = w * t / counts(s)
      // 'g' sorts above every hex digit: a p>=1 source keeps every row
      s -> (if (p >= 1.0) "g"
            else f"${math.floor(p * 4294967296.0).toLong}%08x")
    }
    val key = substring(md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 8)
    // unweighted sources fold to the empty bound: key < "" is never true
    val bound = bounds.foldLeft(lit("")) { case (acc, (s, b)) =>
      when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    df.filter(key < bound)
  }

  /** TOKEN-BUDGET sampling: the deterministic hash-prefix subsample whose
    * cumulative token count fits `budget` — "give me exactly ~N training
    * tokens" without a random state. Selection order is md5(seed:id)
    * (ties to id), so membership is content-derived and reproducible.
    *
    * Scale shape: the semantics are a global running sum in hash order,
    * but the PLAN is two-phase: (1) one aggregation over 65,536
    * hash-prefix buckets gives the cutoff bucket on the driver (64k
    * longs — still trivially driver-sized); every bucket wholly under
    * budget passes with a map-only filter; (2) only the single BOUNDARY
    * bucket (~1/65,536 of the corpus — ~1.5 GB at 100 TB, one sane task,
    * where a 2-hex-char bucket would push ~400 GB through one core) pays
    * a windowed running sum. Because md5 order = (bucket, rest)
    * lexicographic order, the two phases compose to exactly the global
    * running-sum semantics regardless of the prefix width — the oracle
    * checks against the one-window formulation, and SampleSpec asserts
    * identity with the 2-hex phase split on the same seed. */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      budget: Long, seed: String = "graft"): DataFrame =
    tokenBudgetSampleWithPrefix(df, idCol, textCol, budget, seed, prefixLen = 4)

  /** [[tokenBudgetSample]] with an explicit bucket-prefix width — the
    * phase split is semantics-preserving for ANY width (md5 order =
    * (prefix, rest) lexicographic order), which SampleSpec asserts by
    * comparing widths on the same seed. */
  private[ops] def tokenBudgetSampleWithPrefix(df: DataFrame, idCol: String,
      textCol: String, budget: Long, seed: String, prefixLen: Int): DataFrame = {
    require(budget >= 0, "token budget must be >= 0")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val bucket = substring(key, 1, prefixLen)
    val toks = size(split(col(textCol), " ")).cast("long")
    val perBucket = df
      .groupBy(bucket.as("__b")).agg(sum(toks).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    var cum = 0L
    var boundary: Option[String] = None
    var before = 0L
    perBucket.foreach { case (b, t) =>
      if (boundary.isEmpty) {
        if (cum + t <= budget) cum += t
        else { boundary = Some(b); before = cum; cum += t }
      }
    }
    // The full buckets are exactly those sorted BEFORE the boundary (the
    // cumulative scan consumes buckets in lexicographic order), so one
    // constant-size range predicate replaces what would otherwise be an
    // isin() of up to 65,535 literals — absent buckets hold no rows, so
    // including their range is free.
    boundary match {
      case None => df // every bucket fit: the whole corpus passes
      case Some(b) =>
        val keepFull = df.filter(bucket < lit(b))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(key, col(idCol))
        val edge = df.filter(bucket === b)
          .withColumn("__cum", sum(toks).over(w))
          .filter(col("__cum") + lit(before) <= budget)
          .drop("__cum")
        keepFull.unionByName(edge)
    }
  }

  /** Per-source QUOTA cap (domain balancing): keep at most `cap` documents
    * from each source, chosen by deterministic content-hash priority (md5
    * of the seeded id; ties to smaller id) — the "no domain may dominate
    * the mix" pass crawled corpora run, reproducible on any engine at any
    * parallelism because the priority is data-derived, not random. One
    * shuffle on the source key + a windowed rank; a skewed mega-source is
    * exactly the AQE skew-split shape, and sources already under quota
    * pass through unchanged. Returns the kept rows. */
  def sourceCap(df: DataFrame, idCol: String, sourceCol: String, cap: Int,
      seed: String = "graft"): DataFrame = {
    require(cap > 0, "source cap must be positive")
    val pri = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(pri, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
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

  /** CLUSTER-BALANCED sampling (topic balancing): cap how many documents
    * any EMBEDDING CLUSTER contributes — the semantic upgrade of
    * [[sourceCap]]'s per-domain quota, for corpora where one topic
    * dominates regardless of source. Assignment reuses the IVF
    * convention ([[SimilarityOps.trainIvfCentroids]]): deterministic
    * seed centroids (id < k), optional Lloyd refinement, map-only
    * `greatest()` over broadcast centroid literals — no join, no shuffle
    * to classify. Within each cluster the keep set is the `cap` docs with
    * the smallest deterministic hash priority (content-independent,
    * engine-portable md5 — the d19 rule), so membership is reproducible
    * on any engine/partitioning. Spark plans the cap as WindowGroupLimit:
    * the (cluster) shuffle carries at most cap·k rows, never the corpus.
    * Returns the kept rows as (idCol, cluster). */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      kCentroids: Int, cap: Int, iterations: Int = 0,
      seed: String = "graft"): DataFrame = {
    require(cap > 0, "cluster cap must be positive")
    val cents = SimilarityOps.trainIvfCentroids(df, idCol, vecCol,
      kCentroids, iterations)
    val scored = cents.map { case (cid, cv) =>
      struct(SimilarityOps.cosine(col("vec"), typedlit(cv)).as("cos"),
        lit(cid).as("cid"))
    }
    val assigned = df.select(col(idCol).as("vid"), col(vecCol).as("vec"))
      .withColumn("cluster", greatest(scored: _*).getField("cid"))
    val pri = md5(concat_ws(":", lit(seed), col("vid").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(pri, col("vid"))
    assigned.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .select(col("vid").as(idCol), col("cluster"))
  }

  /** DSIR (Xie et al. 2023, arXiv:2302.03169) data selection via
    * importance resampling: score every RAW document by how target-like
    * its hashed n-gram profile is — log importance weight
    * `log p_target(doc) - log p_raw(doc)` under two add-one-smoothed
    * bag-of-hashed-ngram models — and keep the top `k` (the paper's
    * deterministic top-k variant; Gumbel resampling is the same plan with
    * per-doc noise added to the ranking key).
    *
    * Features are unigrams + bigrams hashed into `16^bucketHexChars`
    * buckets via an md5 hex prefix — engine-portable (every SQL engine
    * renders the same md5 hex) and collision-tolerant by construction
    * (DSIR's models are DEFINED over hashed buckets, not raw n-grams).
    *
    * Exactness discipline (the d27/t12 pattern): each bucket's log-ratio
    * is two ln() of exact integer ratios, each pre-rounded to 6 decimals
    * and differenced as DECIMAL(18,6); per-document weights are DECIMAL
    * sums — order-independent, so ranking (weight desc, id asc) is
    * bit-identical on any engine/partitioning, including at the rank-k
    * boundary.
    *
    * Scale shape: the target model is one aggregation over the (small)
    * target set; the raw pass is explode → broadcast-join the ≤`16^c`-row
    * log-ratio table → one (doc) re-aggregation; selection is
    * TakeOrderedAndProject (no full sort). Nothing is quadratic; the only
    * corpus-sized shuffle is the per-document weight aggregation. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, bucketHexChars: Int = 3): DataFrame = {
    require(bucketHexChars >= 1 && bucketHexChars <= 7,
      s"bucketHexChars must be in [1, 7], got $bucketHexChars")
    val nBuckets = math.pow(16, bucketHexChars).toLong

    // unigrams ++ bigrams, hashed to an md5 hex-prefix bucket
    def buckets(df: DataFrame): DataFrame = {
      val ts = TextOps.tokens(col(textCol))
      df.select(col(idCol).as("doc_id"), ts.as("ts"))
        .filter(size(col("ts")) > 0)
        .select(col("doc_id"), explode(concat(col("ts"),
          zip_with(
            slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (x, y) => concat_ws(" ", x, y)))).as("gram"))
        .select(col("doc_id"),
          substring(md5(col("gram")), 1, bucketHexChars).as("bucket"))
    }

    val rawB = buckets(raw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawCounts = rawB.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtCounts = buckets(target).groupBy(col("bucket"))
      .agg(count(lit(1)).as("ct"))
    val rawTotal = rawCounts.agg(sum(col("cr")).as("tr"))
    val tgtTotal = tgtCounts.agg(sum(col("ct")).as("tt"))
    // log-ratio per bucket over the buckets PRESENT in raw (absent ones
    // score no raw gram); target-absent buckets smooth to count 0
    val logRatio = rawCounts
      .join(tgtCounts, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(rawTotal)).crossJoin(broadcast(tgtTotal))
      .select(col("bucket"),
        (round(log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
            (coalesce(col("tt"), lit(0L)) + lit(nBuckets))), 6) -
          round(log((col("cr") + lit(1)).cast("double") /
            (col("tr") + lit(nBuckets))), 6))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("lr"))
    // eager local checkpoint (k rows) so the shingle cache can drop now —
    // the cdcChunkDedupPairs/ClusterOps unpersist discipline
    val selected = rawB.join(broadcast(logRatio), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lr")).as("lw"), count(lit(1)).as("n_grams"))
      .orderBy(col("lw").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"),
        round(col("lw").cast("double"), 4).as("log_weight"),
        col("n_grams"))
      .localCheckpoint(true)
    rawB.unpersist()
    selected
  }
}
