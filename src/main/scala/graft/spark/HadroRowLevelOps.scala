package graft.spark

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.format.SegmentWriter
import graft.meta.CollectionMeta

/** SQL `UPDATE` / `MERGE INTO` (and complex `DELETE`) for hadro tables via
  * DSv2 row-level operations ([[HadroTable]] implements
  * `SupportsRowLevelOperations`) — together with the existing
  * `SupportsDeleteV2` this completes the SQL row-level verb set the
  * reference's delete/upsert contract implies
  * (`/root/reference/INTERFACE.md:11-17`), reachable from pure SQL.
  *
  * Strategy is chosen per collection kind, mirroring the DELETE split in
  * [[HadroDeleteSupport]]:
  *
  *   - '''Keyed collection → delta (merge-on-read).''' The operation
  *     implements `SupportsDelta`: Spark hands the writer per-row deltas,
  *     and each delta is an APPEND — updates/inserts append new key
  *     versions (last-write-wins shadows the old ones), deletes append
  *     key-only tombstones — all in ONE manifest commit. O(changed rows)
  *     bytes written, no segment rewrite: the Bitcask-native mutation
  *     shape, same as the engine's own `Collection.merge`. Updates are
  *     represented as delete+insert so `SET key = ...` (a key-changing
  *     update) tombstones the old key correctly; the tombstone segments
  *     take LOWER ordinals than the data segments in the same commit, so
  *     resolution orders every key's delete before its re-insert.
  *
  *   - '''Non-keyed collection → group-based copy-on-write.''' The
  *     operation's scan prunes to the segments that MIGHT contain matching
  *     rows (manifest stats + blooms — same pruning as the h33 CoW
  *     delete), records exactly which files it planned, and Spark writes
  *     back every surviving/updated row of those segments; commit replaces
  *     precisely the planned files in one atomic generation-checked
  *     replace commit. An UPDATE whose predicate prunes to 3 of 10k
  *     segments rewrites exactly 3 files.
  *
  * At 100 TB the split matters: keyed mutations never touch existing data
  * (append-only, O(delta)), and non-keyed rewrites are bounded by pruning,
  * not table size.
  */
final class HadroRowLevelOperationBuilder(path: Path, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation = {
    val meta = CollectionMeta.readSchema(path).getOrElse(
      throw new IllegalStateException(s"hadro: no collection at $path"))
    // the LOGICAL schema: row-level plans must never surface dropped
    // physical slots (readers re-resolve the physical layout themselves)
    val logical = CollectionMeta.logicalSchema(meta.schema)
    meta.keyField match {
      case Some(k) => new HadroDeltaOperation(path, logical, info.command(), k)
      case None => new HadroCowOperation(path, logical, info.command())
    }
  }
}

// --------------------------------------------------------------- keyed/MoR

/** Delta (merge-on-read) row-level operation for keyed collections: every
  * change is an append, the key column is the row id. */
final class HadroDeltaOperation(path: Path, schema: StructType,
    cmd: RowLevelOperation.Command, key: String) extends SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def rowId(): Array[NamedReference] = Array(Expressions.column(key))
  // Key-changing updates (SET key = ...) must tombstone the OLD key;
  // delete+insert expresses that, a plain new-version append cannot.
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** What the operation scans. Pure-append keyed collections read the
    * collection directly (every record IS its key's latest version, and
    * the scan keeps full pushdown). A MUTATED collection's raw scan still
    * contains shadowed versions — Spark's rewrite plans evaluate the
    * condition per scanned row, so feeding them a shadowed version could
    * emit a delta derived from stale values. For those, the last-write-
    * wins resolution (the same window `Collection.resolvedAsOf` uses) is
    * materialized ONCE per statement into a temp pure-append collection —
    * a distributed job, nothing driver-side — and scanned from there.
    * That is the honest merge-on-read price; `compact()` resets a
    * collection to pure-append and restores the direct path. */
  /** Root of the statement-scoped resolved copy, if one was materialized;
    * deleted by the write's commit/abort so repeated statements don't leak
    * full-collection copies on local disk. */
  @volatile private[spark] var resolvedTmpRoot: Option[Path] = None

  private lazy val scanPath: Path = {
    val m = CollectionMeta.currentManifest(path)
    if (!m.mutated || m.segments.isEmpty) path
    else {
      val spark = org.apache.spark.sql.SparkSession.active
      val root = Files.createTempDirectory("hadro-rlo-resolved")
      resolvedTmpRoot = Some(root)
      val tmp = root.resolve("view")
      val full = spark.read.format("hadro")
        .option("hadro.changefeed", "full").load(path.toString)
      val w = Window.partitionBy(col(key)).orderBy(col(HadroTable.SeqCol).desc)
      full.withColumn("__hadro_rn", row_number().over(w))
        .filter(col("__hadro_rn") === 1 && !col(HadroTable.DeletedCol))
        .drop("__hadro_rn", HadroTable.SeqCol, HadroTable.DeletedCol)
        .write.format("hadro").mode("append")
        .option("hadro.key", key).save(tmp.toString)
      tmp
    }
  }

  /** Best-effort removal of the statement's resolved temp copy. */
  private[spark] def cleanupResolved(): Unit = resolvedTmpRoot.foreach { root =>
    resolvedTmpRoot = None
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    } catch { case _: Exception => () } // leak-on-error beats failing the op
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HadroScanBuilder(scanPath, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new HadroDeltaWrite(path, info, key, HadroDeltaOperation.this)
    }
}

/** The delta write: appended data + tombstone segments in one commit. */
final class HadroDeltaWrite(path: Path, info: LogicalWriteInfo, key: String,
    op: HadroDeltaOperation) extends DeltaWrite {

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    // ensureSchema + commit/abort come from the plain append write path:
    // a delta commit IS an upsert-shaped append (mutating = true).
    private val underlying = new HadroBatchWrite(
      path, info.schema(), graft.format.Consistency.Relaxed,
      tombstone = false, mutating = true, truncate = false,
      keyField = Some(key))

    private val storedMeta = CollectionMeta.readSchema(path).get
    private val storedSchema = storedMeta.schema
    private val rowIdSchema: StructType = info.rowIdSchema().orElseGet(() =>
      StructType(Seq(storedSchema(storedSchema.fieldIndex(key)))))
    private val indexOrdinals = HadroWriteInit.indexOrdinals(path, storedSchema)
    private val keyOrdinal = Some(storedSchema.fieldIndex(key))

    override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory =
      new HadroDeltaWriterFactory(path.toString, storedSchema, info.schema(),
        rowIdSchema, keyOrdinal, indexOrdinals)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      // Ordinals are assigned across ALL tasks in message order at commit,
      // so per-task ordering (tombs before data within one writer) is not
      // enough: a key tombstoned by task B and re-inserted by task A would
      // otherwise resolve to whichever task's message came later. Reorder
      // globally — every tombstone segment before every data segment — so
      // a delete of an old key can never shadow another row's insert of
      // the same key within this statement.
      val infos = messages.collect { case m: HadroCommitMessage => m.infos }.flatten
      val (tombs, data) = infos.partition(_.tombstones > 0)
      try underlying.commit(Array(HadroCommitMessage(tombs.toSeq ++ data.toSeq)))
      finally op.cleanupResolved()
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      try underlying.abort(messages)
      finally op.cleanupResolved()
  }
}

final class HadroDeltaWriterFactory(path: String, storedSchema: StructType,
    rowSchema: StructType, rowIdSchema: StructType, keyOrdinal: Option[Int],
    indexOrdinals: Map[String, Seq[Int]]) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new HadroDeltaWriter(Paths.get(path), storedSchema, rowSchema, rowIdSchema,
      partitionId, taskId, keyOrdinal, indexOrdinals)
}

/** Routes delta actions onto two plain segment writers: inserts (and the
  * insert half of updates) append full rows; deletes (and the delete half)
  * append key-only tombstones. The STATEMENT-LEVEL commit
  * ([[HadroDeltaWrite]]) reorders all tombstone segments before all data
  * segments across tasks — a key that is deleted (old key of a
  * key-changing update in one task) and re-inserted (new key produced by
  * a different row in another task) resolves to the insert. */
final class HadroDeltaWriter(dir: Path, storedSchema: StructType,
    rowSchema: StructType, rowIdSchema: StructType,
    partitionId: Int, taskId: Long, keyOrdinal: Option[Int],
    indexOrdinals: Map[String, Seq[Int]]) extends DeltaWriter[InternalRow] {

  private val dataW = new HadroDataWriter(dir, storedSchema, rowSchema,
    graft.format.Consistency.Relaxed, tombstone = false, partitionId, taskId,
    keyOrdinal, SegmentWriter.DefaultSplitBytes, indexOrdinals)
  private val tombW = new HadroDataWriter(dir, storedSchema, rowIdSchema,
    graft.format.Consistency.Relaxed, tombstone = true, partitionId, taskId,
    keyOrdinal, SegmentWriter.DefaultSplitBytes, indexOrdinals)

  override def insert(row: InternalRow): Unit = dataW.write(row)
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit =
    dataW.write(row) // unreachable with representUpdateAsDeleteAndInsert=true
  override def delete(meta: InternalRow, id: InternalRow): Unit = tombW.write(id)

  override def commit(): WriterCommitMessage = {
    val tombs = tombW.commit().asInstanceOf[HadroCommitMessage].infos
    val data = dataW.commit().asInstanceOf[HadroCommitMessage].infos
    HadroCommitMessage(tombs ++ data)
  }
  override def abort(): Unit = { tombW.abort(); dataW.abort() }
  override def close(): Unit = { tombW.close(); dataW.close() }
}

// ---------------------------------------------------------- non-keyed/CoW

/** Group-based (copy-on-write) row-level operation for non-keyed
  * collections. The scan and write share this instance: the scan records
  * the exact files it planned (post stats/bloom pruning) plus the
  * generation it planned against, and the write replaces those files —
  * and only those — in one atomic, generation-checked commit. */
final class HadroCowOperation(path: Path, schema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** (planned files, pinned generation, per-file plan-time deletion
    * vector), set by the scan at planning. The dv snapshot makes a
    * concurrent dv DELETE a detected conflict instead of a silent
    * resurrection (commit validates it). */
  @volatile private[spark] var planned: Option[ReplaceSpec] = None

  override def command(): RowLevelOperation.Command = cmd

  /** Requesting a metadata attribute makes Spark build ReplaceData's row
    * and metadata projections and route rows through the projecting write
    * task — WITHOUT one, the writer receives the plan's raw output
    * including the internal `__row_operation` column (Spark only strips
    * it when projections exist; verified against ReplaceDataExec
    * .writingTask in Spark 4.1). `_hadro_seq` is free: the reader
    * materializes it from the record position it already tracks. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(HadroTable.SeqCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HadroCowScanBuilder(this, path, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new HadroCowBatchWrite(path, info.schema(), HadroCowOperation.this)
      }
    }
}

/** Scan builder for the CoW operation. Pushed filters are used for GROUP
  * (segment) pruning ONLY — the write must get back every row of every
  * affected segment, so per-record shortcuts (key-offset point ranges,
  * limit prefixes) that the normal scan builder plans are deliberately
  * absent here. All filters are returned as residual. */
final class HadroCowScanBuilder(op: HadroCowOperation, path: Path,
    schema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(SegmentSkipper.supports)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new HadroCowScan(op, path, schema, required, pushed)
}

final class HadroCowScan(op: HadroCowOperation, path: Path,
    schema: StructType, required: StructType, filters: Array[Filter])
    extends Scan with Batch {

  private lazy val storedSchema: StructType =
    CollectionMeta.readSchema(path).map(_.schema).getOrElse(schema)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"hadro CoW row-level scan $path, GroupPruneFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val manifest = CollectionMeta.currentManifest(path)
    val affected = manifest.segments.filter(seg =>
      SegmentSkipper.mightMatch(seg, filters, storedSchema) &&
        BloomSidecar.mightMatch(path, seg, filters, storedSchema) &&
        BloomSidecar.compositeMightMatch(path, seg, manifest.indexes, filters, storedSchema))
    op.planned = Some(ReplaceSpec(affected.map(_.file), manifest.generation,
      affected.map(s => s.file -> s.deleteVector).toMap))
    affected.flatMap(seg => HadroInputPartition.ranges(path, seg)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HadroReaderFactory(storedSchema, required,
      typeWidened = CollectionMeta.currentManifest(path)
        .segments.exists(_.writeTypes.nonEmpty))
}

/** The CoW write: plain segment writers; commit replaces exactly the files
  * the operation's scan planned. Rows written with zero planned files can
  * not exist (the scan planned no partitions), so that case is a no-op
  * that only tidies the empty segment files the writers leave behind. */
final class HadroCowBatchWrite(path: Path, writeSchema: StructType,
    op: HadroCowOperation) extends BatchWrite {

  private def delegate(replaceSpec: Option[ReplaceSpec]) =
    new HadroBatchWrite(path, writeSchema, graft.format.Consistency.Relaxed,
      tombstone = false, mutating = false, truncate = false, keyField = None,
      replaceSpec = replaceSpec)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    delegate(None).createBatchWriterFactory(info)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spec = op.planned.getOrElse(throw new IllegalStateException(
      "hadro: row-level write committed before its scan planned — " +
        "cannot determine which files to replace"))
    if (spec.files.isEmpty) { abort(messages); return } // statically-proven no-op
    delegate(Some(spec)).commit(messages)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    delegate(None).abort(messages)
}
