package graft.spark

import java.nio.file.Path

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

import graft.meta.CollectionMeta

/** Streaming source over a hadro collection: the append-only segment log is
  * tailed by MANIFEST ORDINAL — each committed segment has a monotonically
  * increasing ordinal, so an offset is simply "next ordinal to read" and a
  * micro-batch is the half-open ordinal range committed since the last
  * batch. No files are listed or re-read; planning is one manifest read.
  *
  * Semantics: by default an insert-only changefeed of the log tail
  * (tombstone records are skipped, shadowed versions are NOT resolved —
  * resolution is a batch-view or stateful-stream concern). With
  * `hadro.changefeed=full` the stream carries `_hadro_seq` and
  * `_hadro_deleted` as regular columns and INCLUDES tombstone records —
  * the full CDC view a stateful LWW consumer needs (st05). Metadata-column
  * SELECTION on a stream remains unsupported (Spark does not route
  * metadata columns through streaming column pruning) — the changefeed
  * option exists precisely so streams never need it. Compaction/truncate
  * resets ordinals and therefore invalidates running streams (documented
  * limitation; streams should read from non-compacting collections,
  * mirroring e.g. Delta's behavior when a table is rewritten).
  */
final case class HadroOffset(nextOrdinal: Long) extends Offset {
  override def json(): String = s"""{"nextOrdinal":$nextOrdinal}"""
}

final class HadroMicroBatchStream(path: Path, storedSchema: StructType,
    required: StructType) extends MicroBatchStream {

  override def initialOffset(): Offset = HadroOffset(0L)

  override def latestOffset(): Offset =
    HadroOffset(CollectionMeta.currentManifest(path).nextOrdinal)

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"nextOrdinal":(\d+)\}""".r
    json.trim match {
      case m(v) => HadroOffset(v.toLong)
      case other => throw new IllegalArgumentException(s"bad hadro offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[HadroOffset].nextOrdinal
    val hi = end.asInstanceOf[HadroOffset].nextOrdinal
    // A truncate/compaction resets ordinals; a checkpointed stream would
    // otherwise stall silently (hi < lo => empty batches forever). Fail
    // with the actionable cause instead.
    if (hi < lo) throw new IllegalStateException(
      s"hadro stream over $path: offset went backwards ($lo -> $hi) — the " +
        "collection was truncated or compacted underneath the stream. " +
        "Restart the stream with a fresh checkpoint, and stream only from " +
        "non-compacting collections.")
    CollectionMeta.currentManifest(path).segments
      .filter(s => s.ordinal >= lo && s.ordinal < hi)
      // split ranges fan out within a micro-batch exactly as in batch scans
      .flatMap(s => HadroInputPartition.ranges(path, s))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HadroReaderFactory(storedSchema, required)

  override def commit(end: Offset): Unit = () // no source-side state to clean

  override def stop(): Unit = ()
}
