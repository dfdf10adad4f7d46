package graft.format

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

import org.apache.spark.unsafe.types.UTF8String

/** Per-segment Bloom filter over the collection's key column — the sidecar
  * the reference's KeyDir design points toward (`hadro/engine.py:45-46`,
  * disabled at `:94-95`) done the scale-friendly way: instead of one
  * in-memory hash of EVERY key (RAM ∝ #keys, startup ∝ log size — the
  * drawbacks the reference documents at `:49-52`), each segment carries a
  * fixed-size filter, consulted at scan *planning* so point lookups touch
  * only segments that may contain the key.
  *
  * Split-and-mix double hashing (h1 + i·h2) over a canonical 64-bit form of
  * the key value; default 64 KiB / 7 hashes ≈ 0.5% FPR at 50k keys/segment.
  */
final class KeyBloom private (private val words: Array[Long],
    private val k: Int) extends Serializable {
  private val mBits = words.length * 64

  private def setBit(bit: Long): Unit = {
    val b = (bit % mBits + mBits) % mBits
    words((b >>> 6).toInt) |= (1L << (b & 63))
  }
  private def getBit(bit: Long): Boolean = {
    val b = (bit % mBits + mBits) % mBits
    (words((b >>> 6).toInt) & (1L << (b & 63))) != 0
  }

  def add(value: Any): Unit = addHash(KeyBloom.canonical(value))

  def mightContain(value: Any): Boolean = mightContainHash(KeyBloom.canonical(value))

  /** Insert a precomputed canonical hash (composite keys hash their field
    * tuple once via [[KeyBloom.canonicalComposite]]). */
  def addHash(h: Long): Unit = {
    val h2 = KeyBloom.mix(h) | 1L
    var i = 0
    while (i < k) { setBit(h + i * h2); i += 1 }
  }

  def mightContainHash(h: Long): Boolean = {
    val h2 = KeyBloom.mix(h) | 1L
    var i = 0
    while (i < k) { if (!getBit(h + i * h2)) return false; i += 1 }
    true
  }

  /** (bits, k) — the shape a mergeable partial must match. */
  private[graft] def shape: (Int, Int) = (words.length * 64, k)

  /** Bitwise OR of two same-shape filters into THIS one (distributed
    * builds: per-partition partials merge associatively). */
  def union(other: KeyBloom): KeyBloom = {
    require(other.words.length == words.length && other.k == k,
      s"bloom shape mismatch: ${words.length}x$k vs ${other.words.length}x${other.k}")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def writeTo(path: Path): Unit = {
    val buf = ByteBuffer.allocate(8 + words.length * 8).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(k); buf.putInt(words.length)
    words.foreach(buf.putLong)
    Files.write(path, buf.array())
  }
}

object KeyBloom {
  val DefaultBits: Int = 64 * 1024 * 8 // 64 KiB
  val DefaultK: Int = 7

  def apply(bits: Int = DefaultBits, k: Int = DefaultK): KeyBloom =
    new KeyBloom(new Array[Long](bits / 64), k)

  def readFrom(path: Path): Option[KeyBloom] =
    if (!Files.exists(path)) None
    else {
      val buf = ByteBuffer.wrap(Files.readAllBytes(path)).order(ByteOrder.BIG_ENDIAN)
      val k = buf.getInt(); val n = buf.getInt()
      val words = Array.fill(n)(buf.getLong())
      Some(new KeyBloom(words, k))
    }

  /** Canonical 64-bit form of a key value (internal Catalyst types). The
    * SAME canonicalization runs at write (internal row values) and at plan
    * time (pushed-filter values converted to internal form). */
  private[graft] def canonical(v: Any): Long = v match {
    case null => 0L
    case l: Long => mix(l)
    case i: Int => mix(i.toLong)
    case s: Short => mix(s.toLong)
    case b: Byte => mix(b.toLong)
    case b: Boolean => mix(if (b) 1L else 0L)
    case d: Double => mix(java.lang.Double.doubleToLongBits(d))
    case f: Float => mix(java.lang.Float.floatToIntBits(f).toLong)
    case s: UTF8String => bytesHash(s.getBytes)
    case s: String => bytesHash(s.getBytes("UTF-8"))
    case other => bytesHash(other.toString.getBytes("UTF-8"))
  }

  /** Canonical hash of a multi-field key tuple: field order is significant,
    * and the chain is mixed between fields so ("ab","c") and ("a","bc")
    * cannot collide by concatenation. Runs identically at write time
    * (internal row values) and plan time (converted filter values). */
  private[graft] def canonicalComposite(values: Seq[Any]): Long =
    values.foldLeft(0x51_7c_c1_b7_27_22_0a_95L)((acc, v) => mix(acc ^ canonical(v)))

  /** splitmix64 finalizer. */
  private[graft] def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def bytesHash(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    mix(h)
  }
}
