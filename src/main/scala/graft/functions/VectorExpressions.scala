package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for cosine similarity between two
  * `array<float>` embeddings.
  *
  * The composed form (`aggregate(zip_with(...))`) allocates an intermediate
  * array and evaluates three lambda chains per row; this expression is one
  * fused loop with no allocation, and `doGenCode` splices that loop
  * directly into whole-stage codegen — the preference-order (b) path
  * (custom Expression) from SURVEY §2.3, used where the op is hot enough
  * to matter (similarity search / embedding dedup inner loops).
  *
  * Null if either side is null; 0.0 if either norm is zero (degenerate
  * vectors rank last, never NaN). Mismatched lengths compare the common
  * prefix (callers validate dimensions upstream).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $x.getFloat($i);
          double $yi = (double) $y.getFloat($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0)
          ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused product-quantization encoder: argmin sub-centroid per subspace,
  * as ONE expression with flat loops over a broadcast codebook reference.
  *
  * The composed form (`least()` over m×k structs of unrolled arithmetic)
  * builds a ~3000-node Catalyst tree whose codegen compilation dominated
  * the PQ index build; this is the same work as three nested loops and a
  * single reference object. Bit-compatible with the composed form: the
  * per-subspace distance accumulates left-to-right in doubles starting at
  * 0.0 (equal to the no-init fold — all terms are non-negative), and ties
  * keep the SMALLEST code (strict `<`), matching struct-`least` ordering
  * on (distance, code). */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val m = codebook.length
  @transient private lazy val k = codebook(0).length
  @transient private lazy val sub = codebook(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = codebook(j)(c)
        var acc = 0.0; var i = 0
        while (i < sub) {
          val d = vec.getFloat(j * sub + i).toDouble - cent(i).toDouble
          acc += d * d; i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best; j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val cent = ctx.freshName("cent")
      s"""
        int[] $out = new int[$m];
        for (int $j = 0; $j < $m; $j++) {
          int $best = 0; double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $k; $c++) {
            float[] $cent = $cb[$j][$c];
            double $acc = 0.0;
            for (int $i = 0; $i < $sub; $i++) {
              double $d = (double) $x.getFloat($j * $sub + $i) - (double) $cent[$i];
              $acc += $d * $d;
            }
            if ($acc < $bestD) { $bestD = $acc; $best = $c; }
          }
          $out[$j] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Int8 scalar quantization ENCODER: each float component maps to one byte
  * code `clamp(floor((v - minv) / scale), 0, 255)` with `scale =
  * (maxv - minv) / 256` — a 4× compression of float32 embeddings into a
  * BINARY column, the simplest storage-side quantization an ANN index uses
  * before PQ. `floor` (not round) keeps the arithmetic engine-portable:
  * half-way cases never depend on a rounding mode, so an exact SQL twin
  * exists. One fused loop, no allocation beyond the output bytes, spliced
  * into whole-stage codegen. Codes are stored as raw bytes; the decoder
  * masks back to [0, 255]. */
case class Sq8Encode(child: Expression, minv: Double, scale: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = math.floor((vec.getFloat(i).toDouble - minv) / scale)
      out(i) = math.min(math.max(c, 0.0), 255.0).toInt.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val c = ctx.freshName("c")
      s"""
        int $n = $x.numElements();
        byte[] $out = new byte[$n];
        for (int $i = 0; $i < $n; $i++) {
          double $c = java.lang.Math.floor(((double) $x.getFloat($i) - $minv) / $scale);
          $out[$i] = (byte) (int) java.lang.Math.min(java.lang.Math.max($c, 0.0), 255.0);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Int8 scalar quantization DECODER: byte code c reconstructs to the cell
  * MIDPOINT `minv + (c + 0.5) * scale` as `array<double>` — composable
  * with [[CosineSimilarity]]'s double path and exactly replicable in SQL
  * (the oracle re-derives codes and midpoints from the raw vectors with
  * the same floor/clamp/midpoint arithmetic). */
case class Sq8Decode(child: Expression, minv: Double, scale: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_decode"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Double](codes.length)
    var i = 0
    while (i < codes.length) {
      out(i) = minv + ((codes(i) & 0xFF).toDouble + 0.5) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
        double[] $out = new double[$x.length];
        for (int $i = 0; $i < $x.length; $i++) {
          $out[$i] = $minv + (((double) ($x[$i] & 0xFF)) + 0.5) * $scale;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Column-world handle for [[PqEncode]]. */
  def pq_encode(vec: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    columnOf(PqEncode(expressionOf(vec), codebook.map(_.map(_.toArray).toArray).toArray))
  // Spark 4's Column<->Expression bridge (classic.ExpressionUtils) is
  // private[sql] at the Scala level but public static in bytecode; go
  // through reflection once. Analysis-time only — no per-row cost.
  private lazy val utils = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private lazy val toExpr = utils.getMethod("expression", classOf[Column])
  private lazy val toCol = utils.getMethod("column", classOf[Expression])

  private def expression(c: Column): Expression =
    toExpr.invoke(null, c).asInstanceOf[Expression]
  private def column(e: Expression): Column =
    toCol.invoke(null, e).asInstanceOf[Column]

  /** Bridge access for sibling expression wrappers (graft-internal). */
  private[functions] def expressionOf(c: Column): Expression = expression(c)
  private[functions] def columnOf(e: Expression): Column = column(e)

  /** Column-world handle for [[CosineSimilarity]]. */
  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Column-world handle for [[Sq8Encode]]. */
  def sq8_encode(vec: Column, minv: Double, scale: Double): Column =
    column(Sq8Encode(expression(vec), minv, scale))

  /** Column-world handle for [[Sq8Decode]]. */
  def sq8_decode(codes: Column, minv: Double, scale: Double): Column =
    column(Sq8Decode(expression(codes), minv, scale))

  /** SQL registration: `SELECT cosine_similarity(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
}
