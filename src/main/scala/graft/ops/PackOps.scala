package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch preparation: concatenate each
  * shard's documents (ordered by id) into one virtual token stream and cut
  * it into fixed-`budget` token sequences — the "pack and chunk" layout
  * GPT-style pretraining feeds to the model. A document spanning a
  * sequence boundary contributes a slice to each sequence it overlaps.
  *
  * Scale shape: all state is a running sum WITHIN a shard — the window
  * never crosses shard boundaries, so shards pack in parallel and a
  * 100 TB corpus scales by adding shards (any stable key works: source,
  * a date partition, or an md5 bucket from [[SampleOps.hashBucket]]).
  * Re-running reproduces the identical packing because order is
  * (shard, doc_id), never partition-dependent.
  */
object PackOps {

  /** One output row per (document, overlapped sequence):
    * `shard, seq_id, doc_id, n_tokens, tok_start, tok_end` — this doc
    * contributes its tokens [tok_start, tok_end) to sequence `seq_id` of
    * `shard`. Sequences hold exactly `budget` tokens (last one ragged). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = df.select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    base
      .withColumn("seq_id", explode(sequence(
        (col("start_off") / budget).cast("long"),
        ((col("start_off") + col("n_tokens") - 1) / budget).cast("long"))))
      .withColumn("tok_start",
        greatest(col("seq_id") * budget - col("start_off"), lit(0L)))
      .withColumn("tok_end",
        least((col("seq_id") + 1) * budget - col("start_off"), col("n_tokens")))
      .select(col("shard"), col("seq_id"), col("doc_id"), col("n_tokens"),
        col("tok_start"), col("tok_end"))
  }
}
