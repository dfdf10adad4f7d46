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

object AudioExpressions {

  /** Column-world handle for [[PcmStats]]. */
  def pcm_stats(pcm: Column): Column =
    VectorExpressions.columnOf(PcmStats(VectorExpressions.expressionOf(pcm)))

  /** SQL registration: `SELECT pcm_stats(pcm).*`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pcm_stats", exprs => PcmStats(exprs.head), "built-in")
}
