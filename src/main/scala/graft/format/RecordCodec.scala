package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, SpecializedGetters}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary row codec for the hadro storage format.
  *
  * On-disk record framing mirrors the reference engine's 5-byte header —
  * 1-byte flags + 4-byte big-endian uint32 payload size
  * (`/root/reference/hadro/engine.py:147-148`) with flag bit 0 as the
  * tombstone marker (`/root/reference/hadro/engine.py:26,169`). The payload
  * encoding is our own (the reference's is explicitly unstable,
  * `/root/reference/README.md:25`): a null bitmap followed by fields in
  * schema order, big-endian, length-prefixed for variable-width types.
  *
  * The codec operates on Catalyst [[InternalRow]]s (UTF8String / micros /
  * days internal forms) so readers and writers never pay an external-row
  * conversion. Per-field writer/reader/skipper closures are compiled ONCE
  * from the schema — the per-value hot path does no type dispatch.
  */
object RecordCodec {
  val HeaderSize = 5
  val DeletedFlag: Int = 0x01 // tombstone, reference engine.py:26
  // Payload is a zstd frame (per-record compression, collection-level
  // opt-in). Self-describing: SegmentReader decompresses transparently and
  // clears the bit, so no consumer above the frame parser ever sees it.
  val CompressedFlag: Int = 0x02
  // dictionary-zstd payload: decompress against the segment's trained
  // `.zdict` sidecar (always set together with CompressedFlag)
  val DictFlag: Int = 0x04

  private type ValueWriter = (DataOutputStream, SpecializedGetters, Int) => Unit
  private type ValueReader = ByteBuffer => Any
  private type ValueSkipper = ByteBuffer => Unit

  // ---------------------------------------------------------------- encode

  private def compileWriter(dt: DataType): ValueWriter = dt match {
    case BooleanType => (o, g, i) => o.writeBoolean(g.getBoolean(i))
    case ByteType => (o, g, i) => o.writeByte(g.getByte(i))
    case ShortType => (o, g, i) => o.writeShort(g.getShort(i))
    case IntegerType | DateType => (o, g, i) => o.writeInt(g.getInt(i))
    case LongType | TimestampType | TimestampNTZType => (o, g, i) => o.writeLong(g.getLong(i))
    case FloatType => (o, g, i) => o.writeFloat(g.getFloat(i))
    case DoubleType => (o, g, i) => o.writeDouble(g.getDouble(i))
    case StringType => (o, g, i) => {
      val b = g.getUTF8String(i).getBytes
      o.writeInt(b.length); o.write(b)
    }
    case BinaryType => (o, g, i) => {
      val b = g.getBinary(i)
      o.writeInt(b.length); o.write(b)
    }
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      (o, g, i) => o.writeLong(g.getDecimal(i, d.precision, d.scale).toUnscaledLong)
    case d: DecimalType => (o, g, i) => {
      val b = g.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.unscaledValue.toByteArray
      o.writeInt(b.length); o.write(b)
    }
    case ArrayType(et, _) =>
      val ew = compileWriter(et)
      (o, g, i) => {
        val arr = g.getArray(i)
        val m = arr.numElements()
        o.writeInt(m)
        var j = 0
        while (j < m) {
          if (arr.isNullAt(j)) o.writeBoolean(true)
          else { o.writeBoolean(false); ew(o, arr, j) }
          j += 1
        }
      }
    case MapType(kt, vt, _) =>
      val kw = compileWriter(kt); val vw = compileWriter(vt)
      (o, g, i) => {
        val map = g.getMap(i)
        val m = map.numElements()
        o.writeInt(m)
        val ks = map.keyArray(); val vs = map.valueArray()
        var j = 0
        while (j < m) {
          kw(o, ks, j) // map keys are never null in Spark
          if (vs.isNullAt(j)) o.writeBoolean(true)
          else { o.writeBoolean(false); vw(o, vs, j) }
          j += 1
        }
      }
    case st: StructType =>
      val writers = st.fields.map(f => compileWriter(f.dataType))
      val n = st.size
      (o, g, i) => writeStruct(o, g.getStruct(i, n), writers)
    case NullType => (_, _, _) => ()
    case other => throw new UnsupportedOperationException(s"hadro codec: unsupported type $other")
  }

  private def writeStruct(out: DataOutputStream, row: InternalRow,
      writers: Array[ValueWriter]): Unit = {
    val n = writers.length
    val bitmap = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (row.isNullAt(i)) bitmap(i >> 3) = (bitmap(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out.write(bitmap)
    i = 0
    while (i < n) {
      if (!row.isNullAt(i)) writers(i)(out, row, i)
      i += 1
    }
  }

  /** Reusable, growable encoder (one per writer task; not thread-safe).
    * The payload buffer is reused across records — callers must consume
    * [[buffer]]/[[length]] before the next [[encode]] call. */
  final class Encoder(schema: StructType) {
    private val writers = schema.fields.map(f => compileWriter(f.dataType))
    private val bytes = new ExposedByteArrayOutputStream(1 << 16)
    private val out = new DataOutputStream(bytes)

    /** Encode one row into the internal buffer; returns the payload length.
      * Read the bytes from [[buffer]] (valid until the next encode). */
    def encode(row: InternalRow): Int = {
      bytes.reset()
      writeStruct(out, row, writers)
      out.flush()
      bytes.size()
    }

    def buffer: Array[Byte] = bytes.raw

    /** Copying variant for callers that retain the payload. */
    def encodeToArray(row: InternalRow): Array[Byte] = {
      val n = encode(row)
      java.util.Arrays.copyOf(buffer, n)
    }
  }

  /** ByteArrayOutputStream with zero-copy access to its backing array. */
  private final class ExposedByteArrayOutputStream(cap: Int)
      extends ByteArrayOutputStream(cap) {
    def raw: Array[Byte] = buf
  }

  // ---------------------------------------------------------------- decode

  private def compileReader(dt: DataType): ValueReader = dt match {
    case BooleanType => buf => buf.get() != 0
    case ByteType => buf => buf.get()
    case ShortType => buf => buf.getShort()
    case IntegerType | DateType => buf => buf.getInt()
    case LongType | TimestampType | TimestampNTZType => buf => buf.getLong()
    case FloatType => buf => buf.getFloat()
    case DoubleType => buf => buf.getDouble()
    case StringType => buf => {
      val b = new Array[Byte](buf.getInt()); buf.get(b)
      UTF8String.fromBytes(b)
    }
    case BinaryType => buf => {
      val b = new Array[Byte](buf.getInt()); buf.get(b)
      b
    }
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      buf => Decimal(buf.getLong(), d.precision, d.scale)
    case d: DecimalType => buf => {
      val b = new Array[Byte](buf.getInt()); buf.get(b)
      Decimal(new java.math.BigDecimal(new java.math.BigInteger(b), d.scale), d.precision, d.scale)
    }
    case ArrayType(et, _) =>
      val er = compileReader(et)
      buf => {
        val m = buf.getInt()
        val vals = new Array[Any](m)
        var j = 0
        while (j < m) {
          vals(j) = if (buf.get() != 0) null else er(buf)
          j += 1
        }
        new GenericArrayData(vals)
      }
    case MapType(kt, vt, _) =>
      val kr = compileReader(kt); val vr = compileReader(vt)
      buf => {
        val m = buf.getInt()
        val ks = new Array[Any](m); val vs = new Array[Any](m)
        var j = 0
        while (j < m) {
          ks(j) = kr(buf)
          vs(j) = if (buf.get() != 0) null else vr(buf)
          j += 1
        }
        new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
      }
    case st: StructType =>
      val readers = st.fields.map(f => compileReader(f.dataType))
      val n = st.size
      buf => {
        val row = new GenericInternalRow(n)
        val bitmap = new Array[Byte]((n + 7) / 8)
        buf.get(bitmap)
        var j = 0
        while (j < n) {
          if ((bitmap(j >> 3) & (1 << (j & 7))) == 0) row.update(j, readers(j)(buf))
          j += 1
        }
        row
      }
    case NullType => _ => null
    case other => throw new UnsupportedOperationException(s"hadro codec: unsupported type $other")
  }

  private def skipVar(buf: ByteBuffer): Unit =
    buf.position(buf.position() + 4 + buf.getInt(buf.position()))
  private def skipFixed(n: Int): ValueSkipper = buf => buf.position(buf.position() + n)

  private def compileSkipper(dt: DataType): ValueSkipper = dt match {
    case BooleanType | ByteType => skipFixed(1)
    case ShortType => skipFixed(2)
    case IntegerType | DateType | FloatType => skipFixed(4)
    case LongType | TimestampType | TimestampNTZType | DoubleType => skipFixed(8)
    case StringType | BinaryType => skipVar
    case d: DecimalType =>
      if (d.precision <= Decimal.MAX_LONG_DIGITS) skipFixed(8) else skipVar
    case ArrayType(et, _) =>
      val es = compileSkipper(et)
      buf => {
        val m = buf.getInt()
        var j = 0
        while (j < m) { if (buf.get() == 0) es(buf); j += 1 }
      }
    case MapType(kt, vt, _) =>
      val ks = compileSkipper(kt); val vs = compileSkipper(vt)
      buf => {
        val m = buf.getInt()
        var j = 0
        while (j < m) {
          ks(buf)
          if (buf.get() == 0) vs(buf)
          j += 1
        }
      }
    case st: StructType =>
      val skippers = st.fields.map(f => compileSkipper(f.dataType))
      val n = st.size
      buf => {
        val bitmap = new Array[Byte]((n + 7) / 8)
        buf.get(bitmap)
        var j = 0
        while (j < n) {
          if ((bitmap(j >> 3) & (1 << (j & 7))) == 0) skippers(j)(buf)
          j += 1
        }
      }
    case NullType => _ => ()
    case other => throw new UnsupportedOperationException(s"hadro codec: unsupported type $other")
  }

  /** Decoder with column pruning: only ordinals in `required` (full-schema
    * ordinals) are materialized; everything else is skipped byte-exactly.
    * Output rows follow `required`'s order. One per reader; not thread-safe.
    */
  final class Decoder(schema: StructType, required: Array[Int]) {
    private val n = schema.length
    private val bitmapLen = (n + 7) / 8
    private val bitmap = new Array[Byte](bitmapLen)
    // full ordinal -> output ordinal, or -1 to skip
    private val outOrd = {
      val w = new Array[Int](n)
      java.util.Arrays.fill(w, -1)
      required.zipWithIndex.foreach { case (f, o) => w(f) = o }
      w
    }
    private val readers = schema.fields.map(f => compileReader(f.dataType))
    private val skippers = schema.fields.map(f => compileSkipper(f.dataType))

    def decode(payload: Array[Byte]): InternalRow =
      decode(payload, 0, payload.length)

    /** Decode in place from a shared buffer (zero-copy framing path).
      * Variable-width values are copied out, so the returned row does not
      * alias `payload`. */
    def decode(payload: Array[Byte], offset: Int, length: Int): InternalRow = {
      val buf = ByteBuffer.wrap(payload, offset, length)
      val out = new GenericInternalRow(required.length)
      buf.get(bitmap, 0, bitmapLen)
      var i = 0
      while (i < n) {
        val isNull = (bitmap(i >> 3) & (1 << (i & 7))) != 0
        val o = outOrd(i)
        if (!isNull) {
          if (o >= 0) out.update(o, readers(i)(buf)) else skippers(i)(buf)
        } // null: bit already says so; GenericInternalRow defaults to null
        i += 1
      }
      out
    }
  }

  object Decoder {
    def full(schema: StructType): Decoder =
      new Decoder(schema, schema.indices.toArray)
  }

  /** Value conversion for type-widening evolution: turns a non-null value
    * decoded at the segment's write-time type into the current (wider)
    * schema type. Only [[graft.api.Collection.safeWidening]] pairs reach
    * here — anything else is a metadata bug worth failing loudly on. */
  def widener(from: DataType, to: DataType): AnyRef => AnyRef = (from, to) match {
    case (IntegerType, LongType) =>
      v => java.lang.Long.valueOf(v.asInstanceOf[java.lang.Integer].longValue())
    case (FloatType, DoubleType) =>
      v => java.lang.Double.valueOf(v.asInstanceOf[java.lang.Float].doubleValue())
    case (f: DecimalType, t: DecimalType)
        if t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale =>
      v => Decimal(v.asInstanceOf[Decimal].toBigDecimal.setScale(t.scale),
        t.precision, t.scale)
    case _ => throw new IllegalStateException(
      s"hadro: no widening conversion $from -> $to — manifest writeTypes corrupt?")
  }
}
