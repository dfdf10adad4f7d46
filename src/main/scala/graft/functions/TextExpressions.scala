package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused MinHash signature over an `array<string>` shingle set.
  *
  * BIT-EXACT with the composed form `TextOps.minhashSignatureComposed`
  * (asserted in FunctionsSpec): per shingle, `h = xxhash64(shingle)` with
  * Spark's default seed 42, then per permutation `i`,
  * `xxhash64(h, i) = hashInt(i, hashLong(h, 42))` — the same chain the
  * built-in `xxhash64` expression computes, via the same [[XXH64]] kernels.
  *
  * Why native: the composed fold allocates an n-long accumulator array,
  * an n-long permutation array, and a zipped array PER SHINGLE (via
  * `aggregate`/`zip_with`/`transform`), and its codegen is a deeply nested
  * lambda chain that dominates first-run JIT. This expression is one flat
  * loop over (shingles × n) with a single long[] — no per-step allocation,
  * spliced directly into whole-stage codegen. MinHash is the hot inner
  * loop of near-dup candidate generation over every document at corpus
  * scale, so constant factors here are cluster-hours at 100 TB.
  */
case class MinHashSignature(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"minhash_signature needs n > 0 permutations, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      // built-in xxhash64 semantics: a null argument leaves the hash at the
      // seed, so a null shingle contributes h = 42
      val h =
        if (arr.isNullAt(j)) 42L
        else {
          val s = arr.getUTF8String(j)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        }
      val inner = XXH64.hashLong(h, 42L)
      var i = 0
      while (i < n) {
        val hi = XXH64.hashInt(i, inner)
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val xxh = classOf[XXH64].getName
      val mins = ctx.freshName("mins")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val inner = ctx.freshName("inner")
      val hi = ctx.freshName("hi")
      val s = ctx.freshName("s")
      s"""
        long[] $mins = new long[$n];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $m = $x.numElements();
        for (int $j = 0; $j < $m; $j++) {
          long $h;
          if ($x.isNullAt($j)) {
            $h = 42L;
          } else {
            UTF8String $s = $x.getUTF8String($j);
            $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
          }
          long $inner = $xxh.hashLong($h, 42L);
          for (int $i = 0; $i < $n; $i++) {
            long $hi = $xxh.hashInt($i, $inner);
            if ($hi < $mins[$i]) $mins[$i] = $hi;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native fused 64-bit SimHash (Charikar'02) over an `array<string>` token
  * set — bit-exact with `TextOps.simhash64Composed` (same XXH64 chain, same
  * +1/-1 vote-and-sign per bit), as one flat loop instead of a fold
  * carrying a 64-counter array through three lambda chains per token. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      val h =
        if (arr.isNullAt(j)) 42L
        else {
          val s = arr.getUTF8String(j)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        }
      var i = 0
      while (i < 64) {
        votes(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) >= 0L) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val xxh = classOf[XXH64].getName
      val votes = ctx.freshName("votes")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
        long[] $votes = new long[64];
        int $m = $x.numElements();
        for (int $j = 0; $j < $m; $j++) {
          long $h;
          if ($x.isNullAt($j)) {
            $h = 42L;
          } else {
            UTF8String $s = $x.getUTF8String($j);
            $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
          }
          for (int $i = 0; $i < 64; $i++) {
            $votes[$i] += ((($h >>> $i) & 1L) == 1L) ? 1L : -1L;
          }
        }
        long $sig = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if ($votes[$i] >= 0L) $sig |= (1L << $i);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native expression — the first step of
  * text cleaning for training corpora (decomposed accents, compatibility
  * forms typed by different sources must collapse to one canonical byte
  * sequence or exact dedup/fingerprinting silently misses equal texts).
  * Spark has no built-in normalizer; a Scala UDF would leave whole-stage
  * codegen, so this wraps `java.text.Normalizer` (the JDK's Unicode NFC,
  * same standard DuckDB's nfc_normalize implements) in a codegen'd unary
  * expression. Cost is a no-op fast path for already-NFC text
  * (Normalizer.isNormalized) — ASCII corpora pay one scan, no allocation. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.nfcJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${TextExpressions.getClass.getName.stripSuffix("$")}.nfcJava($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy longest-match subword tokenizer over a fixed vocabulary — the
  * WordPiece-style segmentation step of a training-data pipeline, as a
  * native expression spliced into whole-stage codegen (a Scala UDF here
  * would leave codegen on the hottest per-document loop in the corpus).
  *
  * Semantics (deliberately simple enough to re-derive in SQL, which the
  * t14 oracle does with a recursive CTE over the same vocab literal):
  * the text splits on single spaces; each word is segmented left to
  * right, at each position consuming the LONGEST vocab piece that
  * matches (piece ids are 1-based vocab positions); a position no piece
  * matches emits UNK id 0 and advances one character. Output is the
  * concatenated id sequence over all words. The vocabulary typically
  * comes from a collection's persisted sidecar
  * ([[graft.ops.TextOps.saveVocab]]/`loadVocab`). */
case class GreedyTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "greedy_tokenize needs a non-empty vocabulary")
  require(vocab.distinct.length == vocab.length,
    "greedy_tokenize vocabulary has duplicate pieces")
  require(vocab.forall(p => p.nonEmpty && !p.contains(' ')),
    "vocabulary pieces must be non-empty and contain no spaces")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "greedy_tokenize"

  @transient private lazy val matcher = new GreedyTokenize.Matcher(vocab.toArray)

  override def nullSafeEval(input: Any): Any =
    matcher.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matcher", matcher,
      classOf[GreedyTokenize.Matcher].getName)
    defineCodeGen(ctx, ev, c => s"$m.tokenize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GreedyTokenize {
  /** The segmentation kernel: one hash probe per candidate length per
    * position, longest first. Broadcast-shipped inside the expression
    * (serializable); vocabularies are tiny next to the corpus. */
  final class Matcher(pieces: Array[String]) extends Serializable {
    private val byPiece: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), i + 1); i += 1 }
      m
    }
    // distinct piece lengths, longest first — the greedy probe order
    private val lengths: Array[Int] =
      pieces.map(_.length).distinct.sortBy(l => -l)

    def tokenize(s: UTF8String): ArrayData = {
      val text = s.toString
      val out = new java.util.ArrayList[Integer](text.length / 2 + 4)
      var w0 = 0
      val n = text.length
      while (w0 <= n) {
        val sp = text.indexOf(' ', w0)
        val end = if (sp < 0) n else sp
        var pos = w0
        while (pos < end) {
          var matched = 0
          var len = 1
          var li = 0
          while (matched == 0 && li < lengths.length) {
            val l = lengths(li)
            if (pos + l <= end) {
              val id = byPiece.get(text.substring(pos, pos + l))
              if (id != null) { matched = id.intValue(); len = l }
            }
            li += 1
          }
          out.add(matched) // 0 = UNK, advances one char
          pos += len
        }
        w0 = if (sp < 0) n + 1 else sp + 1
      }
      val arr = new Array[Int](out.size())
      var i = 0
      while (i < arr.length) { arr(i) = out.get(i).intValue(); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
  }
}

object TextExpressions {
  /** Column-world handle for [[MinHashSignature]]. */
  def minhash_signature(shingles: Column, n: Int): Column =
    VectorExpressions.columnOf(MinHashSignature(VectorExpressions.expressionOf(shingles), n))

  /** Column-world handle for [[SimHash64]]. */
  def simhash64(toks: Column): Column =
    VectorExpressions.columnOf(SimHash64(VectorExpressions.expressionOf(toks)))

  /** Column-world handle for [[NfcNormalize]]. */
  def nfc_normalize(text: Column): Column =
    VectorExpressions.columnOf(NfcNormalize(VectorExpressions.expressionOf(text)))

  /** Column-world handle for [[GreedyTokenize]]. */
  def greedy_tokenize(text: Column, vocab: Seq[String]): Column =
    VectorExpressions.columnOf(GreedyTokenize(VectorExpressions.expressionOf(text), vocab))

  /** JVM kernel for [[NfcNormalize]] — public static so generated code can
    * call it. Already-normalized strings (any ASCII corpus) return the
    * input UTF8String unchanged instead of a re-encoded copy. */
  def nfcJava(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
