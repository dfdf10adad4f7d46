package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step every
  * dedup pipeline runs AFTER pair generation: pairs (A,B),(B,C) must
  * collapse into one cluster {A,B,C} with a single kept representative,
  * or transitive duplicates survive filtering.
  *
  * Algorithm: iterative min-label propagation (the MapReduce-era CC
  * shape). Each round every node adopts the minimum label among itself and
  * its neighbors — one shuffle per round, converging in O(diameter)
  * rounds. Near-dup graphs are unions of small dense clusters (diameter
  * ≤ 3 in practice), so 3-5 rounds close virtually all corpora; the loop
  * checks an explicit converged-count and stops early. Lineage is
  * truncated each round (localCheckpoint) so plans don't grow with the
  * iteration count — the classic iterative-Spark footgun. */
object ClusterOps {

  /** `pairs`: two long columns (first < second convention not required).
    * Returns (node, cluster) where cluster = min node id reachable. Nodes
    * appearing only on one side are included; singletons absent from
    * `pairs` are by definition their own cluster and not emitted. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 10): DataFrame = {
    // Persist the pair list FIRST: both direction branches of the edge
    // union consume it, and upstream is typically a whole dedup pipeline
    // that must not run twice.
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Round 0 folded into initialization: the first propagation round's
    // result is just min(node, min(neighbors)) — computing it directly at
    // init saves one full join+checkpoint+count cycle from the loop.
    var labels = edges.groupBy(col("src").as("node"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("label", "nbr_label"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("nbr_label")).as("nbr_min"))
      // LAZY checkpoint + count in ONE action: the count job materializes
      // the checkpoint partitions as it runs, so each round costs a single
      // Spark job (an eager checkpoint followed by a separate convergence
      // probe would be two).
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("new_label"))
        .localCheckpoint(false) // truncate lineage before reuse below
      converged = next.filter(col("new_label") < col("label")).count() == 0L
      labels = next.select(col("node"), col("new_label").as("label"))
      iter += 1
    }
    edges.unpersist()
    p.unpersist()
    // A chain with diameter > maxIter would otherwise return silently SPLIT
    // clusters — transitive duplicates surviving dedup undetected. Near-dup
    // graphs have tiny diameters, so non-convergence means maxIter is
    // mis-set for the input; say so rather than corrupt quietly.
    if (!converged) org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"connectedComponents did NOT converge within $maxIter rounds - " +
        "labels may split one true cluster into several; raise maxIter " +
        "for graphs with long duplicate chains")
    labels.withColumnRenamed("label", "cluster")
  }

  /** Connected components via alternating large-star/small-star (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
    * public algorithm). Converges in O(log n) rounds regardless of graph
    * diameter, where plain min-propagation needs O(diameter): a duplicate
    * CHAIN of length 10,000 (each doc near-dup of the next — versioned
    * pages, incremental edits) closes in ~14 rounds instead of 10,000.
    *
    * large-star: every node's strictly-greater neighbors re-point to the
    * minimum of its closed neighborhood; small-star: every node's smaller
    * neighbors (and itself) re-point to their minimum. Both are one
    * groupBy + one join — key-equality shuffles, nothing quadratic; edge
    * count never grows beyond the input. Fixpoint = a forest of stars,
    * detected by an (edge-count, xxhash64-sum) signature match between
    * rounds — one action per round on the checkpointed frame.
    *
    * Same contract as [[connectedComponents]]: returns (node, cluster),
    * cluster = min reachable id; singletons not in `pairs` are omitted. */
  def connectedComponentsAltStar(pairs: DataFrame, aCol: String,
      bCol: String, maxIter: Int = 25): DataFrame = {
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    // Hash-sum through DECIMAL: a long sum of 64-bit hashes overflows (and
    // ANSI mode makes that a hard error, not a wrap).
    def signature(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }
    var sig = signature(edges)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // large-star, from every node's perspective (both edge directions):
      // center c, neighbors n; m = min(c, min(n)); greater neighbors
      // re-point to m. m <= c < n, so (n, m) is already canonical (u > v).
      val bidir = edges.select(col("u").as("c"), col("v").as("n"))
        .unionByName(edges.select(col("v").as("c"), col("u").as("n")))
      val lsMin = bidir.groupBy("c").agg(min(col("n")).as("mn"))
        .select(col("c"), least(col("c"), col("mn")).as("m"))
      // No distinct here: duplicate (u, v) edges from different centers
      // are rare, harmless to the small-star mins, and folded by the
      // round-final distinct — dropping the dedup saves a full shuffle
      // per round in the iterative hot loop.
      val large = bidir.join(lsMin, Seq("c"))
        .filter(col("n") > col("c"))
        .select(col("n").as("u"), col("m").as("v"))
      // small-star on canonical edges: center u (the larger endpoint),
      // neighbors v < u; m = min(v); every v re-points to m (v = m drops
      // as a self-loop) and u re-points to m.
      val ssMin = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(ssMin, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false) // lazy: the signature action materializes it
      val nextSig = signature(small)
      converged = nextSig == sig
      sig = nextSig
      edges = small
      iter += 1
    }
    if (!converged) org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"connectedComponentsAltStar did NOT converge within $maxIter rounds")
    // At the star fixpoint every edge is (leaf -> root) and every root
    // appears only on the v side; the union + min guards the (unconverged)
    // case where a node still carries several parents.
    edges.select(col("u").as("node"), col("v").as("cluster"))
      .unionByName(edges.select(col("v").as("node"), col("v").as("cluster")))
      .groupBy("node").agg(min(col("cluster")).as("cluster"))
  }
}
