package graft.format

import java.nio.file.Path

import org.apache.spark.sql.types.StructType

/** Executor-side build of one named-index bloom sidecar for one segment:
  * stream the segment, decode ONLY the indexed columns, hash each field
  * tuple into a fixed-size bloom. Runs as one Spark task per segment
  * (`Collection.indexes.add`) — the driver never touches data, and the
  * deterministic sidecar name means no task results flow back. */
object IndexBuilder {

  def buildSidecar(collectionDir: Path, segmentFile: String, schema: StructType,
      ordinals: Seq[Int], indexName: String, buildId: String = "",
      nFields: Int = -1): Unit = {
    val seg = collectionDir.resolve(segmentFile)
    // Additive schema evolution: decode with the segment's write-time prefix
    // schema; indexed fields appended later are null in every record here.
    val writeWidth = if (nFields > 0) math.min(nFields, schema.length) else schema.length
    val writeSchema =
      if (writeWidth == schema.length) schema
      else org.apache.spark.sql.types.StructType(schema.fields.take(writeWidth))
    val ords = ordinals.toArray
    val liveOrds = ords.filter(_ < writeWidth)
    val decoder = new RecordCodec.Decoder(writeSchema, liveOrds)
    val types = liveOrds.map(schema(_).dataType)
    val posOf = liveOrds.map(o => ords.indexOf(o)) // decoded index -> tuple position
    // Indexed columns appended (with a DEFAULT) after this segment was
    // written read back as the frozen constant, so the bloom must hash
    // THAT — hashing null would let an equality probe on the default
    // value wrongly skip the segment.
    val absentDefaults: Seq[(Int, Any)] = ords.zipWithIndex
      .filter { case (o, _) => o >= writeWidth }
      .flatMap { case (o, pos) =>
        graft.meta.CollectionMeta.defaultValueOf(schema(o)).map(pos -> _)
      }.toSeq
    val bloom = KeyBloom()
    val reader = new SegmentReader(seg)
    try {
      // tombstone records included, matching the write-path bloom: a lookup
      // must not skip a segment that only holds the key's delete record
      while (reader.advance()) {
        val row = decoder.decode(reader.buffer, reader.payloadOffset, reader.payloadLength)
        val values = new Array[Any](ords.length) // post-evolution ords stay null
        var i = 0
        while (i < liveOrds.length) {
          values(posOf(i)) = if (row.isNullAt(i)) null else row.get(i, types(i))
          i += 1
        }
        absentDefaults.foreach { case (pos, v) => values(pos) = v }
        bloom.addHash(KeyBloom.canonicalComposite(values.toSeq))
      }
    } finally reader.close()
    bloom.writeTo(seg.resolveSibling(
      SegmentWriter.indexSidecarName(segmentFile, indexName, buildId)))
  }
}
