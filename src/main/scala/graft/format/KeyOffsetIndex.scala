package graft.format

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** Per-segment key→offset index — the reference's KeyDir
  * (`/root/reference/hadro/engine.py:45-52`, disabled there) done the
  * scale-friendly way: persisted per immutable segment instead of one
  * in-memory hash over the whole log, and consulted at PLAN time so a
  * point lookup reads bytes proportional to the matching records, not to
  * the segment.
  *
  * Format: entry count, then (canonical key hash, record byte offset,
  * in-segment row index) triples sorted by hash — binary-searched on
  * probe. Hash collisions over-return (extra records decode and fail the
  * residual filter); absence is EXACT: a missing hash proves the key is
  * not in the segment, so the whole segment is skipped.
  */
final class KeyOffsetIndex private (hashes: Array[Long], offsets: Array[Long],
    rows: Array[Long]) {

  def size: Int = hashes.length

  /** All (offset, rowIndex) whose key hash equals canonical(value)'s. */
  def lookup(value: Any): Seq[(Long, Long)] = lookupHash(KeyBloom.canonical(value))

  def lookupHash(h: Long): Seq[(Long, Long)] = {
    var lo = java.util.Arrays.binarySearch(hashes, h)
    if (lo < 0) return Nil
    // rewind to the first equal hash (duplicates from collisions/versions)
    while (lo > 0 && hashes(lo - 1) == h) lo -= 1
    val out = Seq.newBuilder[(Long, Long)]
    var i = lo
    while (i < hashes.length && hashes(i) == h) {
      out += ((offsets(i), rows(i)))
      i += 1
    }
    out.result()
  }

  def writeTo(path: Path): Unit = {
    val buf = ByteBuffer.allocate(4 + hashes.length * 24).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(hashes.length)
    var i = 0
    while (i < hashes.length) {
      buf.putLong(hashes(i)); buf.putLong(offsets(i)); buf.putLong(rows(i))
      i += 1
    }
    Files.write(path, buf.array())
  }
}

object KeyOffsetIndex {

  /** Build from append-order entries; sorts by hash once at segment close. */
  def fromEntries(entries: Seq[(Long, Long, Long)]): KeyOffsetIndex = {
    val sorted = entries.sortBy(_._1)
    new KeyOffsetIndex(
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, sorted.map(_._3).toArray)
  }

  def readFrom(path: Path): Option[KeyOffsetIndex] =
    if (!Files.exists(path)) None
    else {
      val buf = ByteBuffer.wrap(Files.readAllBytes(path)).order(ByteOrder.BIG_ENDIAN)
      val n = buf.getInt()
      val hashes = new Array[Long](n)
      val offsets = new Array[Long](n)
      val rows = new Array[Long](n)
      var i = 0
      while (i < n) {
        hashes(i) = buf.getLong(); offsets(i) = buf.getLong(); rows(i) = buf.getLong()
        i += 1
      }
      Some(new KeyOffsetIndex(hashes, offsets, rows))
    }

  def sidecarName(segmentFile: String): String = s"$segmentFile.koff"
}
