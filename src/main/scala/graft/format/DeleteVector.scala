package graft.format

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}

/** Deletion-vector sidecar: a bitmap over a segment's in-segment row
  * indices whose set bits mark PHYSICALLY deleted rows — the merge-on-read
  * delete for non-keyed collections. A DELETE writes one small sidecar per
  * affected segment (O(matched rows) bytes) instead of rewriting segment
  * data (O(affected segment bytes)); readers skip marked rows
  * unconditionally (unlike key tombstones, vectored rows are gone even
  * from the changefeed view). Sidecars are immutable: a second delete on
  * the same segment writes a NEW file holding the union, so every retained
  * manifest version keeps reading its exact historical state.
  *
  * On-disk: magic "HDV1", 4-byte word count, then the BitSet's long words
  * big-endian. Bitmap size is O(max deleted row index / 8) — a segment's
  * rows are bounded by split sizing, so vectors stay small even at 100 TB
  * corpus scale. */
object DeleteVector {

  private val Magic = 0x48445631 // "HDV1"

  def write(file: Path, bits: java.util.BitSet): Unit = {
    val words = bits.toLongArray
    val buf = ByteBuffer.allocate(8 + words.length * 8)
    buf.putInt(Magic)
    buf.putInt(words.length)
    words.foreach(buf.putLong)
    buf.flip()
    val ch = FileChannel.open(file, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    try { while (buf.hasRemaining) ch.write(buf); ch.force(true) }
    finally ch.close()
  }

  def read(file: Path): java.util.BitSet = {
    val bytes = Files.readAllBytes(file)
    val buf = ByteBuffer.wrap(bytes)
    require(buf.getInt() == Magic, s"not a delete-vector file: $file")
    val n = buf.getInt()
    val words = Array.fill(n)(buf.getLong())
    java.util.BitSet.valueOf(words)
  }
}
