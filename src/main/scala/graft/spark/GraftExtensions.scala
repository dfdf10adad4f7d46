package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSimilarity, GreedyTokenize, MinHashSignature, NfcNormalize, PcmStats, SimHash64, Sq8Decode, Sq8Encode, WavHeader, WavPcm}

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

    // scalar params arrive as expressions; quantizer params must be
    // constants (they are index-level metadata, not per-row values)
    def foldDouble(fn: String, arg: String, e: Expression): Double = {
      require(e.foldable, s"$fn: $arg must be a constant")
      e.eval(null) match {
        case d: Double => d
        case f: Float => f.toDouble
        // unsuffixed SQL literals like 0.0078125 parse as DecimalType, and
        // Spark's Decimal is not a java.lang.Number
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be numeric, got $other")
      }
    }

    ext.injectFunction((
      FunctionIdentifier("sq8_encode"),
      new ExpressionInfo(classOf[Sq8Encode].getName, "sq8_encode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "sq8_encode(vec, min, scale) takes 3 arguments")
        Sq8Encode(exprs.head, foldDouble("sq8_encode", "min", exprs(1)),
          foldDouble("sq8_encode", "scale", exprs(2)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("sq8_decode"),
      new ExpressionInfo(classOf[Sq8Decode].getName, "sq8_decode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "sq8_decode(codes, min, scale) takes 3 arguments")
        Sq8Decode(exprs.head, foldDouble("sq8_decode", "min", exprs(1)),
          foldDouble("sq8_decode", "scale", exprs(2)))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("wav_header"),
      new ExpressionInfo(classOf[WavHeader].getName, "wav_header"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "wav_header(wav_binary) takes 1 argument")
        WavHeader(exprs.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("wav_pcm"),
      new ExpressionInfo(classOf[WavPcm].getName, "wav_pcm"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "wav_pcm(wav_binary) takes 1 argument")
        WavPcm(exprs.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))

    ext.injectFunction((
      FunctionIdentifier("greedy_tokenize"),
      new ExpressionInfo(classOf[GreedyTokenize].getName, "greedy_tokenize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "greedy_tokenize(text, vocab_array) takes 2 arguments")
        require(exprs(1).foldable, "greedy_tokenize: vocab must be a constant array")
        val vocab = exprs(1).eval(null) match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toObjectArray(org.apache.spark.sql.types.StringType)
              .map(_.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"greedy_tokenize: vocab must be an array of strings, got $other")
        }
        GreedyTokenize(exprs.head, vocab)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}
