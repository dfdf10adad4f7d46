package graft.format

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.{ColumnStats, SegmentInfo}

/** Consistency modes, mirroring the reference
  * (`/root/reference/hadro/config.py:5-24`): AGGRESSIVE fsyncs every record,
  * RELAXED (default) leaves buffering to the OS and fsyncs on close —
  * "Relaxed is faster (10x)" per `config.py:13`. */
object Consistency extends Enumeration {
  val Relaxed, Aggressive = Value
  def parse(s: String): Value =
    if (s == null || s.isEmpty || s.equalsIgnoreCase("relaxed")) Relaxed
    else if (s.equalsIgnoreCase("aggressive")) Aggressive
    else throw new IllegalArgumentException(s"hadro.consistency must be relaxed|aggressive, got $s")
}

/** Appends framed records to one segment file and tracks per-column min/max/
  * null stats for manifest-side segment skipping (the Spark-idiomatic
  * replacement for the reference's declared B+Tree secondary indexes,
  * `INTERFACE.md:32-38`). One writer per Spark task — segments are
  * single-writer immutable, so parallel writes never contend. */
final class SegmentWriter(path: Path, schema: StructType, consistency: Consistency.Value,
    keyOrdinal: Option[Int] = None) {
  private val fos = new FileOutputStream(path.toFile)
  private val out = new BufferedOutputStream(fos, SegmentReader.BlockSize)
  private val encoder = new RecordCodec.Encoder(schema)
  private val header = new Array[Byte](RecordCodec.HeaderSize)
  private var rows = 0L
  private var tombstones = 0L
  private val stats = StatsCollector(schema)
  private val bloom = keyOrdinal.map(_ => KeyBloom())

  def append(row: InternalRow, deleted: Boolean = false): Unit = {
    val size = encoder.encode(row) // payload in encoder.buffer, zero-copy
    header(0) = if (deleted) RecordCodec.DeletedFlag.toByte else 0
    header(1) = (size >>> 24).toByte
    header(2) = (size >>> 16).toByte
    header(3) = (size >>> 8).toByte
    header(4) = size.toByte
    out.write(header)
    out.write(encoder.buffer, 0, size)
    rows += 1
    if (deleted) tombstones += 1
    stats.update(row)
    // Key bloom includes TOMBSTONE keys too: last-write-wins resolution
    // must see a key's tombstones, so a point lookup may not skip segments
    // holding only the delete record.
    keyOrdinal.foreach { ko =>
      if (!row.isNullAt(ko)) bloom.get.add(row.get(ko, schema(ko).dataType))
    }
    if (consistency == Consistency.Aggressive) {
      out.flush()
      fos.getFD.sync() // reference engine.py:186-189
    }
  }

  /** Flush + fsync + close (reference engine.py:191-197); returns the
    * manifest entry for this segment (ordinal assigned at commit time). */
  def close(): SegmentInfo = {
    out.flush()
    fos.getFD.sync()
    out.close()
    val bloomFile = bloom.map { b =>
      val f = path.resolveSibling(path.getFileName.toString + ".bloom")
      b.writeTo(f)
      f.getFileName.toString
    }
    SegmentInfo(
      file = path.getFileName.toString,
      ordinal = -1L,
      rows = rows,
      tombstones = tombstones,
      bytes = Files.size(path),
      stats = stats.result(),
      bloom = bloomFile,
      bloomCol = keyOrdinal.map(schema(_).name))
  }

  def abort(): Unit = {
    out.close()
    Files.deleteIfExists(path)
    Files.deleteIfExists(path.resolveSibling(path.getFileName.toString + ".bloom"))
  }
}

/** Streaming reader over one segment file: 8 MB buffered blocks (reference
  * engine.py:140) with record reassembly across block boundaries handled by
  * read-fully semantics (the explicit loop at engine.py:151-163). Yields
  * (flags, payload) pairs; tombstone policy belongs to the caller. */
final class SegmentReader(path: Path) extends Iterator[(Int, Array[Byte])] with AutoCloseable {
  private val in = new BufferedInputStream(new FileInputStream(path.toFile), SegmentReader.BlockSize)
  private val header = new Array[Byte](RecordCodec.HeaderSize)
  private var nextRec: (Int, Array[Byte]) = _
  private var eof = false

  private def readFully(buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) {
        if (off == 0) return false
        throw new EOFException(s"truncated record in $path at offset tail")
      }
      off += n
    }
    true
  }

  private def advance(): Unit = {
    if (!readFully(header)) { eof = true; nextRec = null; return }
    val flags = header(0) & 0xff
    val size = ((header(1) & 0xff) << 24) | ((header(2) & 0xff) << 16) |
      ((header(3) & 0xff) << 8) | (header(4) & 0xff)
    val payload = new Array[Byte](size)
    if (!readFully(payload) && size > 0)
      throw new EOFException(s"truncated payload in $path")
    nextRec = (flags, payload)
  }

  override def hasNext: Boolean = {
    if (nextRec == null && !eof) advance()
    nextRec != null
  }

  override def next(): (Int, Array[Byte]) = {
    if (!hasNext) throw new NoSuchElementException
    val r = nextRec
    nextRec = null
    r
  }

  override def close(): Unit = in.close()
}

object SegmentReader {
  val BlockSize: Int = 8 * 1024 * 1024 // reference engine.py:140
}

/** Accumulates per-column min/max/nullCount for atomic orderable types;
  * everything else records null counts only. Stats are serialized into the
  * manifest as strings and re-typed on read. */
final class StatsCollector private (schema: StructType) {
  private val n = schema.length
  private val mins = new Array[Any](n)
  private val maxs = new Array[Any](n)
  private val nulls = new Array[Long](n)
  private val orderable: Array[Boolean] = schema.fields.map(f => StatsCollector.isOrderable(f.dataType))

  def update(row: InternalRow): Unit = {
    var i = 0
    while (i < n) {
      if (row.isNullAt(i)) nulls(i) += 1
      else if (orderable(i)) {
        // Compare BEFORE cloning: row buffers may be reused (UnsafeRow), but
        // a clone is only needed for the values we actually retain.
        val v = row.get(i, schema(i).dataType)
        if (mins(i) == null || StatsCollector.lt(v, mins(i)))
          mins(i) = StatsCollector.retain(v)
        if (maxs(i) == null || StatsCollector.lt(maxs(i), v))
          maxs(i) = StatsCollector.retain(v)
      }
      i += 1
    }
  }

  def result(): Map[String, ColumnStats] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      f.name -> ColumnStats(
        min = Option(mins(i)).map(StatsCollector.render),
        max = Option(maxs(i)).map(StatsCollector.render),
        nullCount = nulls(i))
    }.toMap
}

object StatsCollector {
  def apply(schema: StructType): StatsCollector = new StatsCollector(schema)

  def isOrderable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Detach a value from a possibly-reused row buffer before storing it. */
  def retain(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case x => x
  }

  def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
    case (x: java.lang.Comparable[Any] @unchecked, y) => x.compareTo(y) < 0
    case _ => false
  }

  /** Render a stats value to a string round-trippable via [[parse]]. */
  def render(v: Any): String = v.toString

  /** Parse a manifest stats string back to the internal-comparable form for
    * the given column type. */
  def parse(s: String, dt: DataType): Any = dt match {
    case BooleanType => java.lang.Boolean.valueOf(s)
    case ByteType => java.lang.Byte.valueOf(s)
    case ShortType => java.lang.Short.valueOf(s)
    case IntegerType | DateType => java.lang.Integer.valueOf(s)
    case LongType | TimestampType | TimestampNTZType => java.lang.Long.valueOf(s)
    case FloatType => java.lang.Float.valueOf(s)
    case DoubleType => java.lang.Double.valueOf(s)
    case StringType => UTF8String.fromString(s)
    case d: DecimalType => Decimal(new java.math.BigDecimal(s), d.precision, d.scale)
    case _ => null
  }
}
