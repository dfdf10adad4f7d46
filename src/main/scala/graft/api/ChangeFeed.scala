package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.meta.CollectionMeta
import graft.spark.HadroTable

/** Delta-CDF-style TYPED change rows for a keyed collection's changes
  * window — the consumer-facing view on top of the raw
  * `hadro.changefeed=full` stream of upserts and tombstones
  * (`/root/reference` exposes no changefeed; this is extension surface,
  * shaped after Delta's table_changes() contract).
  *
  * For the window (startVersion, endVersion], each key's NET change is
  * classified against the key's pre-window image (the `startVersion`
  * snapshot):
  *
  *   - key existed, final action is an upsert  -> `update_preimage` (old
  *     values) + `update_postimage` (new values) — the pair Delta CDF
  *     emits, derived here by pairing the window's last-write-wins winner
  *     with the version it shadows (the h29 version diff, inverted)
  *   - key existed, final action is a tombstone -> `delete` carrying the
  *     PRE-image values (the consumer sees what was removed)
  *   - key absent,  final action is an upsert  -> `insert`
  *   - key absent,  final action is a tombstone -> nothing (created and
  *     destroyed inside the window — net zero, the consumer never saw it)
  *
  * Net-per-key (not per-commit) is deliberate: it is what a MERGE-shaped
  * consumer (h91) applies, and it needs no replay of intermediate
  * versions. Scale shape: ONE window-sized scan (ordinal-floor planned —
  * never the table), one per-key window function over window-sized data,
  * and a pre-image side restricted to the window's touched keys BELOW
  * its LWW resolve ([[Collection.resolvedAsOf(version,touched)]]):
  * bounded key sets push into the snapshot scan as an IN predicate —
  * key-bloom / key-offset sidecars prune untouched segments at plan
  * time — and larger sets semi-join before the per-key window, so the
  * resolve shuffle carries touched-key rows, never the table. The only
  * driver materialization is the bounded touched-key probe. */
object ChangeFeed {

  /** Typed change rows for (startVersion, endVersion] of the keyed
    * collection at `path`: payload columns + `_change_type` in
    * {insert, update_preimage, update_postimage, delete}. */
  def updateImages(spark: SparkSession, path: String,
      startVersion: Long, endVersion: Long): DataFrame = {
    val meta = CollectionMeta.readSchema(java.nio.file.Paths.get(path))
      .getOrElse(throw new IllegalArgumentException(
        s"hadro: no collection at $path"))
    val key = meta.keyField.getOrElse(throw new IllegalArgumentException(
      "hadro: update pre-images need a KEYED collection (the key pairs " +
        "each upsert with the version it shadows); for unkeyed " +
        "collections read the raw changefeed window instead"))
    val win = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", startVersion.toString)
      .option("hadro.changesEnd", endVersion.toString)
      .load(path)
    val payload = win.columns
      .filterNot(HadroTable.MetaColNames.contains).toSeq
    // the window's net action per key: the engine's own LWW order
    // (record sequence) decides; tombstones participate like upserts
    val last = win
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(HadroTable.SeqCol).desc)))
      .filter(col("_rn") === 1).drop("_rn", HadroTable.SeqCol)
    // pre-window images, restricted to touched keys BELOW the LWW
    // resolve (restrict-then-resolve): the snapshot-side window shuffle
    // carries only touched-key rows, and bounded key sets prune the
    // scan itself via IN pushdown. The RESOLVED snapshot (LWW-collapsed,
    // tombstone-free) is still required: a raw scan would carry shadowed
    // versions of previously-updated keys and duplicate every pre-image
    // (caught by h94's two-cycle oracle).
    val pre = Collection(spark, path)
      .resolvedAsOf(startVersion, win.select(col(key)))
    val oldCols = payload.filterNot(_ == key)
      .map(c => col(s"o.$c").as(s"_old_$c"))
    val paired = last.as("n").join(pre.as("o"), Seq(key), "left")
      .select(Seq(col(key), col(s"n.${HadroTable.DeletedCol}").as("_del"),
        col(s"o.$key").isNotNull.as("_had")) ++
        payload.filterNot(_ == key).map(c => col(s"n.$c")) ++
        oldCols: _*)
    // SINGLE-PASS classification: each paired row explodes into its 0-2
    // typed rows (insert | pre+post pair | delete | nothing for
    // created-and-destroyed keys). A 4-branch union would re-run the
    // window scan, the LWW window and the pre-image join once per
    // branch; the explode emits everything in one traversal.
    def row(valueOf: String => org.apache.spark.sql.Column, tpe: String) =
      struct(payload.map(c =>
        (if (c == key) col(key) else valueOf(c)).as(c)) :+
        lit(tpe).as("_change_type"): _*)
    val newRow = (c: String) => col(c)
    val oldRow = (c: String) => col(s"_old_$c")
    // no .otherwise: the unmatched case (tombstone of a never-seen key)
    // yields NULL, and explode emits nothing for null arrays — exactly
    // the net-zero contract
    paired.select(explode(
      when(!col("_del") && !col("_had"), array(row(newRow, "insert")))
        .when(!col("_del") && col("_had"),
          array(row(oldRow, "update_preimage"), row(newRow, "update_postimage")))
        .when(col("_del") && col("_had"), array(row(oldRow, "delete")))
      ).as("_r"))
      .select(col("_r.*"))
  }
}
