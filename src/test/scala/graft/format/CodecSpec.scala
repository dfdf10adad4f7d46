package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Codec round-trip over every supported type, nulls, and pruned decode. */
class CodecSpec extends AnyFunSuite {

  private val wide = StructType(Seq(
    StructField("b", BooleanType),
    StructField("y", ByteType),
    StructField("s", ShortType),          // reference SMALLINT, engine.py:110
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("f", FloatType),
    StructField("d", DoubleType),         // reference FLOAT, engine.py:113
    StructField("str", StringType),       // reference VARCHAR, engine.py:112
    StructField("bin", BinaryType),
    StructField("dt", DateType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(10, 2)),
    StructField("bigdec", DecimalType(30, 4)),
    StructField("arr", ArrayType(FloatType)),
    StructField("map", MapType(StringType, LongType)),
    StructField("st", StructType(Seq(
      StructField("x", IntegerType), StructField("y", StringType))))
  ))

  private def sampleRow: InternalRow = new GenericInternalRow(Array[Any](
    true, 7.toByte, 123.toShort, 42, 9876543210L, 1.5f, 2.75,
    UTF8String.fromString("héllo wörld"), Array[Byte](1, 2, 3, -1),
    19000, 1700000000000000L, Decimal(BigDecimal("12345.67"), 10, 2),
    Decimal(BigDecimal("123456789012345678901234.5678"), 30, 4),
    new GenericArrayData(Array[Any](1.0f, null, 3.0f)),
    new ArrayBasedMapData(
      new GenericArrayData(Array[Any](UTF8String.fromString("k1"), UTF8String.fromString("k2"))),
      new GenericArrayData(Array[Any](10L, null))),
    new GenericInternalRow(Array[Any](5, UTF8String.fromString("inner")))
  ))

  private def nullRow: InternalRow =
    new GenericInternalRow(Array.fill[Any](wide.length)(null))

  test("round-trips all supported types") {
    val enc = new RecordCodec.Encoder(wide)
    val dec = RecordCodec.Decoder.full(wide)
    val row = sampleRow
    val back = dec.decode(enc.encodeToArray(row))
    wide.fields.zipWithIndex.foreach { case (f, i) =>
      val (a, b) = (row.get(i, f.dataType), back.get(i, f.dataType))
      f.dataType match {
        case BinaryType =>
          assert(java.util.Arrays.equals(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]))
        case ArrayType(_, _) | MapType(_, _, _) | StructType(_) =>
          assert(a.toString == b.toString, s"field ${f.name}")
        case _ => assert(a == b, s"field ${f.name}")
      }
    }
  }

  test("round-trips an all-null row") {
    val enc = new RecordCodec.Encoder(wide)
    val dec = RecordCodec.Decoder.full(wide)
    val back = dec.decode(enc.encodeToArray(nullRow))
    (0 until wide.length).foreach(i => assert(back.isNullAt(i), s"field $i"))
  }

  test("pruned decode skips every preceding field byte-exactly") {
    val enc = new RecordCodec.Encoder(wide)
    // Request only the LAST field — forces skip logic through every type.
    val lastIdx = wide.length - 1
    val dec = new RecordCodec.Decoder(wide, Array(lastIdx))
    val back = dec.decode(enc.encodeToArray(sampleRow))
    assert(back.numFields == 1)
    assert(back.getStruct(0, 2).getInt(0) == 5)
    assert(back.getStruct(0, 2).getUTF8String(1).toString == "inner")
  }

  test("pruned decode of a middle subset preserves order and nulls") {
    val enc = new RecordCodec.Encoder(wide)
    val idx = Array(wide.fieldIndex("str"), wide.fieldIndex("arr"), wide.fieldIndex("s"))
    val dec = new RecordCodec.Decoder(wide, idx)
    val back = dec.decode(enc.encodeToArray(sampleRow))
    assert(back.getUTF8String(0).toString == "héllo wörld")
    assert(back.getArray(1).numElements() == 3)
    assert(back.getShort(2) == 123)
  }
}
