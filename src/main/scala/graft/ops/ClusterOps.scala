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
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
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
}
