package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
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
  * conversion.
  */
object RecordCodec {
  val HeaderSize = 5
  val DeletedFlag: Int = 0x01 // tombstone, reference engine.py:26

  // ---------------------------------------------------------------- encode

  /** Reusable, growable encoder (one per writer task; not thread-safe).
    * The payload buffer is reused across records — callers must consume
    * [[buffer]]/[[length]] before the next [[encode]] call. */
  final class Encoder(schema: StructType) {
    private val fields = schema.fields
    private val bytes = new ExposedByteArrayOutputStream(1 << 16)
    private val out = new DataOutputStream(bytes)

    /** Encode one row into the internal buffer; returns the payload length.
      * Read the bytes from [[buffer]] (valid until the next encode). */
    def encode(row: InternalRow): Int = {
      bytes.reset()
      writeStruct(out, row, fields)
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

  private def writeStruct(out: DataOutputStream, row: InternalRow, fields: Array[StructField]): Unit = {
    val n = fields.length
    var bitmap = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (row.isNullAt(i)) bitmap(i >> 3) = (bitmap(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out.write(bitmap)
    i = 0
    while (i < n) {
      if (!row.isNullAt(i)) writeValue(out, row, i, fields(i).dataType)
      i += 1
    }
  }

  /** Write one non-null value read from `getters` at ordinal `i`. */
  private def writeValue(out: DataOutputStream, g: org.apache.spark.sql.catalyst.expressions.SpecializedGetters, i: Int, dt: DataType): Unit = dt match {
    case BooleanType => out.writeBoolean(g.getBoolean(i))
    case ByteType => out.writeByte(g.getByte(i))
    case ShortType => out.writeShort(g.getShort(i))
    case IntegerType | DateType => out.writeInt(g.getInt(i))
    case LongType | TimestampType | TimestampNTZType => out.writeLong(g.getLong(i))
    case FloatType => out.writeFloat(g.getFloat(i))
    case DoubleType => out.writeDouble(g.getDouble(i))
    case StringType =>
      val b = g.getUTF8String(i).getBytes
      out.writeInt(b.length); out.write(b)
    case BinaryType =>
      val b = g.getBinary(i)
      out.writeInt(b.length); out.write(b)
    case d: DecimalType =>
      val dec = g.getDecimal(i, d.precision, d.scale)
      if (d.precision <= Decimal.MAX_LONG_DIGITS) out.writeLong(dec.toUnscaledLong)
      else {
        val b = dec.toJavaBigDecimal.unscaledValue.toByteArray
        out.writeInt(b.length); out.write(b)
      }
    case ArrayType(et, _) =>
      val arr = g.getArray(i)
      val m = arr.numElements()
      out.writeInt(m)
      var j = 0
      while (j < m) {
        if (arr.isNullAt(j)) out.writeBoolean(true)
        else { out.writeBoolean(false); writeValue(out, arr, j, et) }
        j += 1
      }
    case MapType(kt, vt, _) =>
      val map = g.getMap(i)
      val m = map.numElements()
      out.writeInt(m)
      val ks = map.keyArray(); val vs = map.valueArray()
      var j = 0
      while (j < m) {
        writeValue(out, ks, j, kt) // map keys are never null in Spark
        if (vs.isNullAt(j)) out.writeBoolean(true)
        else { out.writeBoolean(false); writeValue(out, vs, j, vt) }
        j += 1
      }
    case st: StructType =>
      writeStruct(out, g.getStruct(i, st.size), st.fields)
    case NullType => () // nothing to write; null bit already covers it
    case other => throw new UnsupportedOperationException(s"hadro codec: unsupported type $other")
  }

  // ---------------------------------------------------------------- decode

  /** Decoder with column pruning: only ordinals in `required` (full-schema
    * ordinals) are materialized; everything else is skipped byte-exactly.
    * Output rows follow `required`'s order. One per reader; not thread-safe.
    */
  final class Decoder(schema: StructType, required: Array[Int]) {
    private val fields = schema.fields
    private val wanted = {
      val w = new Array[Int](fields.length) // full ordinal -> out ordinal | -1
      java.util.Arrays.fill(w, -1)
      required.zipWithIndex.foreach { case (f, o) => w(f) = o }
      w
    }

    def decode(payload: Array[Byte]): InternalRow = {
      val buf = ByteBuffer.wrap(payload)
      val out = new GenericInternalRow(required.length)
      readStruct(buf, fields, (ord, v) => { val o = wanted(ord); if (o >= 0) out.update(o, v) },
        skipUnwanted = true)
      out
    }

    private def readStruct(buf: ByteBuffer, fs: Array[StructField],
        sink: (Int, Any) => Unit, skipUnwanted: Boolean): Unit = {
      val n = fs.length
      val bitmap = new Array[Byte]((n + 7) / 8)
      buf.get(bitmap)
      var i = 0
      while (i < n) {
        val isNull = (bitmap(i >> 3) & (1 << (i & 7))) != 0
        if (!isNull) {
          if (skipUnwanted && wanted(i) < 0) skipValue(buf, fs(i).dataType)
          else sink(i, readValue(buf, fs(i).dataType))
        } else if (!skipUnwanted || wanted(i) >= 0) sink(i, null)
        i += 1
      }
    }

    private def readValue(buf: ByteBuffer, dt: DataType): Any = dt match {
      case BooleanType => buf.get() != 0
      case ByteType => buf.get()
      case ShortType => buf.getShort()
      case IntegerType | DateType => buf.getInt()
      case LongType | TimestampType | TimestampNTZType => buf.getLong()
      case FloatType => buf.getFloat()
      case DoubleType => buf.getDouble()
      case StringType =>
        val b = new Array[Byte](buf.getInt()); buf.get(b)
        UTF8String.fromBytes(b)
      case BinaryType =>
        val b = new Array[Byte](buf.getInt()); buf.get(b)
        b
      case d: DecimalType =>
        if (d.precision <= Decimal.MAX_LONG_DIGITS)
          Decimal(buf.getLong(), d.precision, d.scale)
        else {
          val b = new Array[Byte](buf.getInt()); buf.get(b)
          Decimal(new java.math.BigDecimal(new java.math.BigInteger(b), d.scale), d.precision, d.scale)
        }
      case ArrayType(et, _) =>
        val m = buf.getInt()
        val vals = new Array[Any](m)
        var j = 0
        while (j < m) {
          vals(j) = if (buf.get() != 0) null else readValue(buf, et)
          j += 1
        }
        new GenericArrayData(vals)
      case MapType(kt, vt, _) =>
        val m = buf.getInt()
        val ks = new Array[Any](m); val vs = new Array[Any](m)
        var j = 0
        while (j < m) {
          ks(j) = readValue(buf, kt)
          vs(j) = if (buf.get() != 0) null else readValue(buf, vt)
          j += 1
        }
        new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
      case st: StructType =>
        val row = new GenericInternalRow(st.size)
        readStruct(buf, st.fields, (ord, v) => row.update(ord, v), skipUnwanted = false)
        row
      case NullType => null
      case other => throw new UnsupportedOperationException(s"hadro codec: unsupported type $other")
    }

    private def skipValue(buf: ByteBuffer, dt: DataType): Unit = dt match {
      case BooleanType | ByteType => buf.position(buf.position() + 1)
      case ShortType => buf.position(buf.position() + 2)
      case IntegerType | DateType | FloatType => buf.position(buf.position() + 4)
      case LongType | TimestampType | TimestampNTZType | DoubleType =>
        buf.position(buf.position() + 8)
      case StringType | BinaryType => buf.position(buf.position() + 4 + buf.getInt(buf.position()))
      case d: DecimalType =>
        if (d.precision <= Decimal.MAX_LONG_DIGITS) buf.position(buf.position() + 8)
        else buf.position(buf.position() + 4 + buf.getInt(buf.position()))
      case ArrayType(et, _) =>
        val m = buf.getInt()
        var j = 0
        while (j < m) { if (buf.get() == 0) skipValue(buf, et); j += 1 }
      case MapType(kt, vt, _) =>
        val m = buf.getInt()
        var j = 0
        while (j < m) {
          skipValue(buf, kt)
          if (buf.get() == 0) skipValue(buf, vt)
          j += 1
        }
      case st: StructType =>
        val n = st.size
        val bitmap = new Array[Byte]((n + 7) / 8)
        buf.get(bitmap)
        var j = 0
        while (j < n) {
          if ((bitmap(j >> 3) & (1 << (j & 7))) == 0) skipValue(buf, st.fields(j).dataType)
          j += 1
        }
      case NullType => ()
      case other => throw new UnsupportedOperationException(s"hadro codec: unsupported type $other")
    }
  }

  object Decoder {
    def full(schema: StructType): Decoder =
      new Decoder(schema, schema.indices.toArray)
  }
}
