package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Catalyst probe of a broadcast [[graft.format.KeyBloom]]: the
  * admission-bloom membership test (incremental dedup's map-only negative
  * path) as a codegen'd expression instead of a Scala UDF — the probe
  * stays inside whole-stage codegen (no per-row boxing/closure dispatch),
  * which matters because it runs once per CORPUS row at 100 TB.
  *
  * The filter rides the existing broadcast (one copy per executor, not
  * one per task binary — the bitset is 64 KiB); Catalyst's own
  * BloomFilterMightContain is not public API and could not probe this
  * sidecar-compatible bitset anyway (the persisted admission bloom must
  * keep matching [[graft.format.KeyBloom]] bit-for-bit across engines).
  */
case class KeyBloomMightContain(child: Expression,
    bloomBc: Broadcast[graft.format.KeyBloom]) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"key_bloom_might_contain expects a BIGINT hash, got ${other.simpleString}")
  }

  override protected def nullSafeEval(h: Any): Any =
    bloomBc.value.mightContainHash(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("admissionBloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((graft.format.KeyBloom) $bc.value()).mightContainHash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "key_bloom_might_contain"
}

object BloomExpressions {
  /** Column-world handle: true iff the bloom may contain the 64-bit hash. */
  def key_bloom_might_contain(hash: Column,
      bloomBc: Broadcast[graft.format.KeyBloom]): Column =
    VectorExpressions.columnOf(
      KeyBloomMightContain(VectorExpressions.expressionOf(hash), bloomBc))
}
