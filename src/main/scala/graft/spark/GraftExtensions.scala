package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSimilarity, MinHashSignature, NfcNormalize, PcmStats, SimHash64}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * first-class SQL functions in every session created with
  *
  * {{{
  * spark.sql.extensions=graft.spark.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`), so pure-SQL users get
  * `cosine_similarity(vec, vec)` and `minhash_signature(shingles, n)`
  * with whole-stage codegen — no Scala imports, no per-session
  * registration calls. This is the SURVEY §2.3 preference-order (c)
  * registration surface; the expressions themselves are (b). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_similarity(vecA, vecB) takes 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_signature(shingles, n) takes 2 arguments")
        val n = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature: n must be an integer literal, got $other")
        }
        MinHashSignature(exprs.head, n)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64(tokens) takes 1 argument")
        SimHash64(exprs.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("pcm_stats"),
      new ExpressionInfo(classOf[PcmStats].getName, "pcm_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "pcm_stats(pcm_binary) takes 1 argument")
        PcmStats(exprs.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "nfc_normalize(text) takes 1 argument")
        NfcNormalize(exprs.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}
