package graft.spark

import java.nio.ByteBuffer
import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.format.{RecordCodec, SegmentReader}

/** Columnar scan path: decodes framed records straight into on-heap column
  * vectors, emitting [[ColumnarBatch]]es of up to 4096 rows. Downstream
  * operators consume vectors (and Spark inserts ColumnarToRow with a tight
  * codegen loop where needed) instead of paying a GenericInternalRow +
  * boxing per record.
  *
  * Supported for FLAT schemas (atomic + string/binary types). Collections
  * with nested array/map/struct columns fall back to the row reader —
  * decided once per scan in [[HadroReaderFactory]].
  */
object HadroColumnar {
  val BatchSize = 4096

  def supports(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType | StringType | BinaryType => true
    case ArrayType(et, _) => supportsArrayElement(et) // one nesting level
    case _ => false
  }

  /** Array elements vectorize when fixed-width atomic (child vectors). */
  def supportsArrayElement(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  def supportsSchema(schema: StructType): Boolean =
    schema.fields.forall(f => supports(f.dataType))

  /** Vector writer for one constant Catalyst value — the DEFAULT back-fill
    * of a column added after a segment was written. Atomic types only
    * (enforced at ALTER time by Collection.addColumn). */
  private[spark] def constFill(dt: DataType,
      value: Any): (OnHeapColumnVector, Int) => Unit = dt match {
    case BooleanType =>
      val v = value.asInstanceOf[Boolean]; (c, r) => c.putBoolean(r, v)
    case ByteType =>
      val v = value.asInstanceOf[Byte]; (c, r) => c.putByte(r, v)
    case ShortType =>
      val v = value.asInstanceOf[Short]; (c, r) => c.putShort(r, v)
    case IntegerType | DateType =>
      val v = value.asInstanceOf[Int]; (c, r) => c.putInt(r, v)
    case LongType | TimestampType | TimestampNTZType =>
      val v = value.asInstanceOf[Long]; (c, r) => c.putLong(r, v)
    case FloatType =>
      val v = value.asInstanceOf[Float]; (c, r) => c.putFloat(r, v)
    case DoubleType =>
      val v = value.asInstanceOf[Double]; (c, r) => c.putDouble(r, v)
    case StringType =>
      val b = value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      (c, r) => { c.putByteArray(r, b); () }
    case BinaryType =>
      val b = value.asInstanceOf[Array[Byte]]
      (c, r) => { c.putByteArray(r, b); () }
    case other => // unreachable for vectorized schemas; stay safe anyway
      (c, r) => c.putNull(r)
  }
}

/** Columnar partition reader over one segment. Mirrors the row reader's
  * framing/tombstone semantics (reference engine.py:139-177) but fills
  * vectors. Only reachable for flat schemas without metadata columns. */
final class HadroColumnarPartitionReader(file: Path, dataSchema: StructType,
    required: StructType, startOffset: Long = 0L, endOffset: Long = -1L,
    nFields: Int = -1, startRow: Long = 0L, deleteVector: Option[String] = None)
    extends PartitionReader[ColumnarBatch] {
  import HadroColumnar._

  // Deletion vector: physically-deleted in-segment row indices — skipped
  // like tombstones. rowIndex tracks this range's position in the segment.
  private val dvBits: java.util.BitSet =
    deleteVector.map(n => graft.format.DeleteVector.read(file.getParent.resolve(n)))
      .orNull
  private var rowIndex: Long = startRow - 1L

  // Additive schema evolution: records in this segment carry only the first
  // `n` schema fields; required columns beyond get per-row nulls.
  private val n =
    if (nFields > 0) math.min(nFields, dataSchema.length) else dataSchema.length
  private val bitmapLen = (n + 7) / 8
  private val bitmap = new Array[Byte](bitmapLen)
  private val outOrd = {
    val w = new Array[Int](dataSchema.length)
    java.util.Arrays.fill(w, -1)
    required.fields.zipWithIndex.foreach { case (f, o) =>
      w(dataSchema.fieldIndex(f.name)) = o
    }
    w
  }
  private val appenders: Array[HadroColumnarPartitionReader.FieldStep] = {
    dataSchema.fields.take(n).zipWithIndex.map { case (f, i) =>
      HadroColumnarPartitionReader.FieldStep(i, outOrd(i), f.dataType)
    }
  }
  // Required columns this segment predates: per-row null — or, for a
  // column added WITH a DEFAULT, the frozen constant (vector fill of a
  // literal; defaults are restricted to atomic types at ALTER time, all
  // of which this reader vectorizes).
  private val absentFills: Array[(Int, (OnHeapColumnVector, Int) => Unit)] =
    (n until dataSchema.length).flatMap { i =>
      val out = outOrd(i)
      if (out < 0) None
      else {
        val f = dataSchema.fields(i)
        val fill = graft.meta.CollectionMeta.defaultValueOf(f) match {
          case None => (v: OnHeapColumnVector, r: Int) => v.putNull(r)
          case Some(value) => HadroColumnar.constFill(f.dataType, value)
        }
        Some((out, fill))
      }
    }.toArray

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(BatchSize, required)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
  private val reader = new SegmentReader(file, startOffset, endOffset)
  private var exhausted = false

  override def next(): Boolean = {
    if (exhausted) return false
    var row = 0
    vectors.foreach(_.reset())
    while (row < BatchSize && { if (reader.advance()) true else { exhausted = true; false } }) {
      rowIndex += 1
      if ((reader.flags & RecordCodec.DeletedFlag) == 0 &&
          (dvBits == null || rowIndex > Int.MaxValue ||
            !dvBits.get(rowIndex.toInt))) { // tombstone + deletion-vector skip
        val buf = ByteBuffer.wrap(reader.buffer, reader.payloadOffset, reader.payloadLength)
        buf.get(bitmap, 0, bitmapLen)
        var i = 0
        while (i < n) {
          val isNull = (bitmap(i >> 3) & (1 << (i & 7))) != 0
          val step = appenders(i)
          if (step.out >= 0) {
            if (isNull) vectors(step.out).putNull(row)
            else step.append(buf, vectors(step.out), row)
          } else if (!isNull) step.skip(buf)
          i += 1
        }
        var a = 0
        while (a < absentFills.length) {
          val (out, fill) = absentFills(a); fill(vectors(out), row); a += 1
        }
        row += 1
      }
    }
    batch.setNumRows(row)
    row > 0
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = { reader.close(); batch.close() }
}

object HadroColumnarPartitionReader {
  /** One field's decode step: either append into output vector `out`
    * (>=0) or skip. Closures compiled once per reader. */
  final case class FieldStep(ord: Int, out: Int, dt: DataType) {
    private val app: (ByteBuffer, OnHeapColumnVector, Int) => Unit =
      if (out >= 0) compileAppender(dt) else null
    private val skp: ByteBuffer => Unit = compileSkipper(dt)
    def append(b: ByteBuffer, v: OnHeapColumnVector, r: Int): Unit = app(b, v, r)
    def skip(b: ByteBuffer): Unit = skp(b)
  }

  private def compileAppender(dt: DataType): (ByteBuffer, OnHeapColumnVector, Int) => Unit = dt match {
    case BooleanType => (b, v, r) => v.putBoolean(r, b.get() != 0)
    case ByteType => (b, v, r) => v.putByte(r, b.get())
    case ShortType => (b, v, r) => v.putShort(r, b.getShort())
    case IntegerType | DateType => (b, v, r) => v.putInt(r, b.getInt())
    case LongType | TimestampType | TimestampNTZType => (b, v, r) => v.putLong(r, b.getLong())
    case FloatType => (b, v, r) => v.putFloat(r, b.getFloat())
    case DoubleType => (b, v, r) => v.putDouble(r, b.getDouble())
    case StringType | BinaryType => (b, v, r) => {
      val n = b.getInt()
      val arr = b.array()
      val off = b.arrayOffset() + b.position()
      v.putByteArray(r, arr, off, n)
      b.position(b.position() + n)
    }
    case ArrayType(et, _) =>
      // Elements accumulate in the array vector's child; each row records
      // its (offset, length) slice. The child grows across the whole batch;
      // reset() on the parent resets it.
      val elemApp = compileElementAppender(et)
      (b, v, r) => {
        val m = b.getInt()
        val child = v.getChild(0).asInstanceOf[OnHeapColumnVector]
        val start = child.getElementsAppended
        child.reserve(start + m)
        var j = 0
        while (j < m) {
          if (b.get() != 0) child.appendNull()
          else elemApp(b, child)
          j += 1
        }
        v.putArray(r, start, m)
      }
    case other => throw new IllegalStateException(s"columnar: unsupported $other")
  }

  /** Append one non-null element to a child vector (append-style API). */
  private def compileElementAppender(dt: DataType): (ByteBuffer, OnHeapColumnVector) => Unit = dt match {
    case BooleanType => (b, c) => c.appendBoolean(b.get() != 0)
    case ByteType => (b, c) => c.appendByte(b.get())
    case ShortType => (b, c) => c.appendShort(b.getShort())
    case IntegerType | DateType => (b, c) => c.appendInt(b.getInt())
    case LongType | TimestampType | TimestampNTZType => (b, c) => c.appendLong(b.getLong())
    case FloatType => (b, c) => c.appendFloat(b.getFloat())
    case DoubleType => (b, c) => c.appendDouble(b.getDouble())
    case other => throw new IllegalStateException(s"columnar array element: unsupported $other")
  }

  private def compileSkipper(dt: DataType): ByteBuffer => Unit = dt match {
    case BooleanType | ByteType => b => b.position(b.position() + 1)
    case ShortType => b => b.position(b.position() + 2)
    case IntegerType | DateType | FloatType => b => b.position(b.position() + 4)
    case LongType | TimestampType | TimestampNTZType | DoubleType =>
      b => b.position(b.position() + 8)
    case StringType | BinaryType => b => b.position(b.position() + 4 + b.getInt(b.position()))
    case ArrayType(et, _) =>
      val es = compileSkipper(et)
      b => {
        val m = b.getInt()
        var j = 0
        while (j < m) { if (b.get() == 0) es(b); j += 1 }
      }
    case other => throw new IllegalStateException(s"columnar: unsupported $other")
  }
}
