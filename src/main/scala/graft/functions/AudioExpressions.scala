package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expression over raw PCM audio buffers: one fused pass
  * over the bytes computing sample count, peak amplitude, and the exact
  * sum of squared samples (the energy — RMS is `sqrt(sum_sq / n)` for the
  * caller to derive; kept as an exact integer here so results are
  * bit-stable on any engine).
  *
  * Format: signed 16-bit big-endian mono (the byte layout our planted
  * corpus writes; a WAV reader would strip the 44-byte header first). A
  * trailing odd byte is ignored. Per the reference's multimodal north
  * star, the container has no audio libraries — but unlike image decode
  * (JDK ImageIO) PCM needs none: the parsing IS the decode, and it runs
  * inside whole-stage codegen, not a UDF.
  */
case class PcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  override def prettyName: String = "pcm_stats"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length / 2
    var sumSq = 0L
    var peak = 0
    var i = 0
    while (i < n) {
      val s = (b(2 * i) << 8) | (b(2 * i + 1) & 0xFF)
      val a = if (s < 0) -s else s
      if (a > peak) peak = a
      sumSq += s.toLong * s
      i += 1
    }
    InternalRow(n, peak, sumSq)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val a = ctx.freshName("a")
      val peak = ctx.freshName("peak")
      val sumSq = ctx.freshName("sumSq")
      s"""
        int $n = $x.length / 2;
        long $sumSq = 0L; int $peak = 0;
        for (int $i = 0; $i < $n; $i++) {
          int $s = ($x[2 * $i] << 8) | ($x[2 * $i + 1] & 0xFF);
          int $a = $s < 0 ? -$s : $s;
          if ($a > $peak) $peak = $a;
          $sumSq += (long) $s * $s;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{Integer.valueOf($n), Integer.valueOf($peak), Long.valueOf($sumSq)});
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** REAL WAV (RIFF/WAVE) container parsing — static helpers shared by the
  * Catalyst expressions below (their generated code calls straight into
  * these, so the expressions stay inside whole-stage codegen) and by
  * [[graft.ops.MultimodalOps]]'s audio decode. Canonical PCM WAVs need no
  * codec library: the container is a 12-byte RIFF preamble plus tagged
  * chunks, and the payload is raw little-endian PCM. */
object WavUtil {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** True iff the bytes start with a RIFF....WAVE preamble. */
  def looksLikeWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** (audioFormat, channels, sampleRate, bitsPerSample, dataOff, dataLen)
    * from a chunk walk, or null when the container is not a well-formed
    * WAV holding both an fmt and a data chunk. */
  def parse(b: Array[Byte]): Array[Int] = {
    if (!looksLikeWav(b)) return null
    var fmt: Array[Int] = null
    var dataOff = -1
    var dataLen = -1
    var o = 12
    while (o + 8 <= b.length) {
      val ckLen = le32(b, o + 4)
      if (ckLen < 0 || o + 8 + ckLen > b.length) return null
      if (b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' ') {
        if (ckLen < 16) return null
        fmt = Array(le16(b, o + 8), le16(b, o + 10), le32(b, o + 12), le16(b, o + 22))
      } else if (b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a') {
        dataOff = o + 8
        dataLen = ckLen
      }
      o += 8 + ckLen + (ckLen & 1) // chunks are word-aligned (odd sizes pad)
    }
    if (fmt == null || dataOff < 0) null
    else Array(fmt(0), fmt(1), fmt(2), fmt(3), dataOff, dataLen)
  }

  /** Header struct row for [[WavHeader]]: (sample_rate, channels, bits,
    * n_samples) — n_samples is PER CHANNEL (frames). Null for non-WAV. */
  def header(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    if (p == null) return null
    val bytesPerFrame = math.max(1, p(1) * (p(3) / 8))
    InternalRow(p(2), p(1), p(3), p(5) / bytesPerFrame)
  }

  /** The data chunk of a 16-bit PCM WAV byte-swapped from little- to
    * big-endian s16 — exactly what [[PcmStats]] consumes. Null when the
    * container is not a 16-bit integer-PCM WAV. */
  def pcmBE(b: Array[Byte]): Array[Byte] = {
    val p = parse(b)
    if (p == null || p(0) != 1 || p(3) != 16) return null
    val n = p(5) / 2
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      out(2 * i) = b(p(4) + 2 * i + 1)
      out(2 * i + 1) = b(p(4) + 2 * i)
      i += 1
    }
    out
  }

  /** Encode mono s16 samples as a canonical 44-byte-header PCM WAV — the
    * exact inverse of [[parse]]+[[pcmBE]], used for round-trip planting. */
  def encodeMono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }
}

/** `wav_header(bytes)` → struct(sample_rate, channels, bits, n_samples),
  * null for non-WAV bytes. Generated code calls [[WavUtil]] statically, so
  * the parse stays inside whole-stage codegen. */
case class WavHeader(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.simpleString}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false)))
  override def prettyName: String = "wav_header"
  override def nullSafeEval(input: Any): Any =
    WavUtil.header(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = graft.functions.WavUtil.header($x);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `wav_pcm(bytes)` → the 16-bit PCM data chunk byte-swapped to big-endian
  * s16 (the [[PcmStats]] input layout); null for anything that is not a
  * 16-bit integer-PCM WAV. */
case class WavPcm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.simpleString}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_pcm"
  override def nullSafeEval(input: Any): Any =
    WavUtil.pcmBE(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      ${ev.value} = graft.functions.WavUtil.pcmBE($x);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioExpressions {

  /** Column-world handle for [[PcmStats]]. */
  def pcm_stats(pcm: Column): Column =
    VectorExpressions.columnOf(PcmStats(VectorExpressions.expressionOf(pcm)))

  /** Column-world handle for [[WavHeader]]. */
  def wav_header(wav: Column): Column =
    VectorExpressions.columnOf(WavHeader(VectorExpressions.expressionOf(wav)))

  /** Column-world handle for [[WavPcm]]. */
  def wav_pcm(wav: Column): Column =
    VectorExpressions.columnOf(WavPcm(VectorExpressions.expressionOf(wav)))

  /** SQL registration: `SELECT pcm_stats(pcm).*`, `wav_header(b).*`, ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pcm_stats", exprs => PcmStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_header", exprs => WavHeader(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_pcm", exprs => WavPcm(exprs.head), "built-in")
  }
}
