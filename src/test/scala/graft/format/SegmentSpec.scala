package graft.format

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Segment framing: header encode/decode, tombstone flags, stats, and
  * records straddling the 8 MB buffer boundary (the reassembly semantics of
  * reference engine.py:151-163). */
class SegmentSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType)))

  private def row(id: Long, payload: String) =
    new GenericInternalRow(Array[Any](id, UTF8String.fromString(payload)))

  test("write/read round-trip with tombstone flags and stats") {
    val dir = Files.createTempDirectory("seg")
    val f = dir.resolve("t.data")
    val w = new SegmentWriter(f, schema, Consistency.Relaxed)
    w.append(row(1, "a"))
    w.append(row(2, "dead"), deleted = true)
    w.append(row(3, "c"))
    val info = w.close()
    assert(info.rows == 3 && info.tombstones == 1)
    assert(info.stats("id").min.contains("1") && info.stats("id").max.contains("3"))
    assert(info.stats("payload").min.contains("a"))

    val r = new SegmentReader(f)
    val recs = r.toList
    r.close()
    assert(recs.map(_._1) == List(0, RecordCodec.DeletedFlag, 0))
    val dec = RecordCodec.Decoder.full(schema)
    assert(dec.decode(recs(1)._2).getUTF8String(1).toString == "dead")
  }

  test("records straddling the 8 MB block boundary reassemble") {
    val dir = Files.createTempDirectory("seg")
    val f = dir.resolve("big.data")
    val w = new SegmentWriter(f, schema, Consistency.Relaxed)
    val threeMb = "x" * (3 * 1024 * 1024)
    (1L to 5L).foreach(i => w.append(row(i, threeMb + i))) // 15 MB > 8 MB block
    w.close()
    val r = new SegmentReader(f)
    val dec = RecordCodec.Decoder.full(schema)
    val ids = r.map { case (_, p) => dec.decode(p).getLong(0) }.toList
    r.close()
    assert(ids == List(1L, 2L, 3L, 4L, 5L))
  }

  test("aggressive consistency produces identical content") {
    val dir = Files.createTempDirectory("seg")
    val fr = dir.resolve("relaxed.data")
    val fa = dir.resolve("aggressive.data")
    val wr = new SegmentWriter(fr, schema, Consistency.Relaxed)
    val wa = new SegmentWriter(fa, schema, Consistency.Aggressive)
    (1L to 100L).foreach { i => wr.append(row(i, s"v$i")); wa.append(row(i, s"v$i")) }
    wr.close(); wa.close()
    assert(java.util.Arrays.equals(Files.readAllBytes(fr), Files.readAllBytes(fa)))
  }
}
