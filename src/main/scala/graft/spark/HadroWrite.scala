package graft.spark

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

import graft.format.{Consistency, SegmentWriter}
import graft.meta.{CollectionMeta, SegmentInfo}

/** Write-side options (all prefixed `hadro.`):
  *   - `consistency`: relaxed | aggressive — fsync cadence, mirroring
  *     `/root/reference/hadro/config.py:5-24` (default relaxed).
  *   - `key`: name of the logical primary-key field; persisted in the
  *     collection schema on creation, drives Collection LWW semantics.
  *   - `tombstone`: "true" marks every record of this write as a delete
  *     (flag bit, `/root/reference/hadro/engine.py:26`).
  *   - `upsert`: "true" records that this write may shadow earlier keys, so
  *     reads must resolve last-write-wins (pure-append collections skip it).
  */
final class HadroWriteBuilder(path: Path, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val opts = info.options()
      val schema = info.schema()
      val consistency = Consistency.parse(opts.getOrDefault("hadro.consistency", "relaxed"))
      val tombstone = opts.getBoolean("hadro.tombstone", false)
      val upsert = opts.getBoolean("hadro.upsert", false)
      val keyField = Option(opts.get("hadro.key")).filter(_.nonEmpty)
      val splitBytes = opts.getLong("hadro.splitBytes", SegmentWriter.DefaultSplitBytes)
      require(splitBytes > 0, s"hadro.splitBytes must be positive, got $splitBytes")
      new HadroBatchWrite(path, schema, consistency, tombstone,
        upsert || tombstone, doTruncate, keyField, splitBytes)
    }
  }
}

final class HadroBatchWrite(path: Path, schema: StructType,
    consistency: Consistency.Value, tombstone: Boolean, mutating: Boolean,
    truncate: Boolean, keyField: Option[String],
    splitBytes: Long = SegmentWriter.DefaultSplitBytes) extends BatchWrite {

  // Driver-side, before tasks launch: create the collection dir (reference
  // engine.py:97) and validate/persist the schema (the intended semantics of
  // hadro/schema.py:65-79 — field-name + type conformance, fail fast).
  Files.createDirectories(path)
  CollectionMeta.readSchema(path) match {
    case Some(meta) =>
      val stored = meta.schema
      val incoming =
        if (tombstone) schema // tombstones may carry a key-only projection
        else schema
      incoming.fields.foreach { f =>
        val sf = stored.fields.find(_.name == f.name).getOrElse(
          throw new IllegalArgumentException(
            s"hadro: field '${f.name}' not in collection schema ${stored.simpleString}"))
        require(sf.dataType == f.dataType,
          s"hadro: field '${f.name}' type ${f.dataType.simpleString} != stored ${sf.dataType.simpleString}")
      }
      if (!tombstone)
        stored.fields.filterNot(_.nullable).foreach { sf =>
          require(schema.fieldNames.contains(sf.name),
            s"hadro: non-nullable field '${sf.name}' missing from write schema")
        }
    case None =>
      keyField.foreach { k =>
        require(schema.fieldNames.contains(k), s"hadro: key field '$k' not in schema")
      }
      CollectionMeta.writeSchema(path, schema, keyField)
  }

  private val storedMeta = CollectionMeta.readSchema(path).get
  private val storedSchema: StructType = storedMeta.schema

  // Named composite indexes registered on the collection: every new segment
  // carries their bloom sidecars from birth (resolved to ordinals here,
  // once, driver-side).
  private val indexOrdinals: Map[String, Seq[Int]] =
    CollectionMeta.currentManifest(path).indexes.flatMap { case (n, fields) =>
      if (fields.forall(storedSchema.fieldNames.contains))
        Some(n -> fields.map(storedSchema.fieldIndex))
      else None
    }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new HadroWriterFactory(path.toString, storedSchema, schema, consistency, tombstone,
      storedMeta.keyField.map(storedSchema.fieldIndex), splitBytes, indexOrdinals)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val segs = messages.collect { case m: HadroCommitMessage if m.info.rows > 0 => m.info }
    CollectionMeta.commit(path, cur => {
      val base = if (truncate) Seq.empty[SegmentInfo] else cur.segments
      var ord = if (truncate) 0L else cur.nextOrdinal
      val withOrdinals = segs.map { s => val o = ord; ord += 1; s.copy(ordinal = o) }
      cur.copy(
        segments = base ++ withOrdinals,
        mutated = (cur.mutated && !truncate) || mutating)
    })
    if (truncate) {
      // GC the manifests that pre-date this truncate — a retained
      // pre-truncate manifest would point at dereferenced files, so
      // scanVersion must fail fast with manifestAt's documented error.
      // Physical file deletion is DEFERRED one truncate generation
      // (CollectionMeta.deferredGc) so a reader that planned against a
      // just-GC'd manifest still finds its segment files on disk.
      val m = CollectionMeta.currentManifest(path)
      val live = (m.segments.map(_.file) ++ m.segments.flatMap(_.bloom) ++
        m.segments.flatMap(_.indexBlooms.values)).toSet
      CollectionMeta.deferredGc(path, live)
      CollectionMeta.gcManifestsBefore(path, m.version)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: HadroCommitMessage => m }.foreach { m =>
      Files.deleteIfExists(Paths.get(path.toString, m.info.file))
      m.info.bloom.foreach(b => Files.deleteIfExists(Paths.get(path.toString, b)))
      m.info.indexBlooms.values.foreach(b =>
        Files.deleteIfExists(Paths.get(path.toString, b)))
    }
}

final case class HadroCommitMessage(info: SegmentInfo) extends WriterCommitMessage

final class HadroWriterFactory(path: String, storedSchema: StructType,
    writeSchema: StructType, consistency: Consistency.Value, tombstone: Boolean,
    keyOrdinal: Option[Int], splitBytes: Long,
    indexOrdinals: Map[String, Seq[Int]] = Map.empty) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new HadroDataWriter(Paths.get(path), storedSchema, writeSchema, consistency,
      tombstone, partitionId, taskId, keyOrdinal, splitBytes, indexOrdinals)
}

/** One segment per task (`data-<uuid>.data`), invisible to readers until the
  * driver publishes the manifest — which is what makes a multi-task append
  * atomic (the declared transaction contract, `INTERFACE.md:40-43`).
  *
  * Rows are re-projected from the incoming write schema onto the stored
  * collection schema (match by NAME — deliberately fixing the reference's
  * insertion-order dict matching, `hadro/engine.py:124`, flagged there as a
  * TODO at `:129`); missing nullable fields become nulls, and writing a null
  * into a non-nullable field fails the task. */
final class HadroDataWriter(dir: Path, storedSchema: StructType,
    writeSchema: StructType, consistency: Consistency.Value, tombstone: Boolean,
    partitionId: Int, taskId: Long, keyOrdinal: Option[Int],
    splitBytes: Long = SegmentWriter.DefaultSplitBytes,
    indexOrdinals: Map[String, Seq[Int]] = Map.empty) extends DataWriter[InternalRow] {

  private val file = dir.resolve(
    f"data-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.data")
  private val writer = new SegmentWriter(file, storedSchema, consistency, keyOrdinal,
    splitBytes, indexOrdinals)

  // Projection: stored ordinal -> write ordinal (or -1 = absent -> null).
  private val proj: Array[Int] = storedSchema.fields.map(f => writeSchema.fieldNames.indexOf(f.name))
  private val identity = proj.length == writeSchema.length && proj.zipWithIndex.forall { case (p, i) => p == i }
  private val projected = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(storedSchema.length)

  override def write(row: InternalRow): Unit = {
    val out: InternalRow =
      if (identity) row
      else {
        var i = 0
        while (i < proj.length) {
          val p = proj(i)
          projected.update(i, if (p < 0) null else row.get(p, storedSchema(i).dataType))
          i += 1
        }
        projected
      }
    var i = 0
    while (i < storedSchema.length) {
      if (!tombstone && !storedSchema(i).nullable && out.isNullAt(i))
        throw new IllegalArgumentException(
          s"hadro: null in non-nullable field '${storedSchema(i).name}'")
      i += 1
    }
    writer.append(out, deleted = tombstone)
  }

  override def commit(): WriterCommitMessage = HadroCommitMessage(writer.close())
  override def abort(): Unit = writer.abort()
  override def close(): Unit = ()
}
