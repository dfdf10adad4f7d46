package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.SimilarityOps

/** Native expression + UDAF surface specs. */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("native cosine_similarity matches the composed form bit-for-bit") {
    val q = embs.filter($"vec_id" === 0L).select($"embedding").head().getSeq[Float](0)
    val both = embs.select(
      SimilarityOps.cosine($"embedding", typedlit(q)).as("native"),
      SimilarityOps.cosineComposed($"embedding", typedlit(q)).as("composed"))
    assert(both.filter($"native" =!= $"composed").count() == 0)
  }

  test("cosine_similarity participates in whole-stage codegen") {
    val q = embs.filter($"vec_id" === 0L).select($"embedding").head().getSeq[Float](0)
    val plan = embs.select(SimilarityOps.cosine($"embedding", typedlit(q)).as("c"))
      .queryExecution.executedPlan.toString
    // codegen'd operators render with the "*(stageId)" prefix
    assert(plan.contains("*(1) Project") && plan.contains("cosine_similarity"), plan)
  }

  test("cosine_similarity is SQL-registrable") {
    VectorExpressions.register(spark)
    embs.createOrReplaceTempView("emb_sql_test")
    val r = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS c FROM emb_sql_test LIMIT 5")
      .as[Double].collect()
    assert(r.forall(c => math.abs(c - 1.0) < 1e-12)) // self-similarity = 1
  }

  test("cosine_similarity rejects non-float-array inputs at analysis") {
    val e = intercept[Exception] {
      embs.select(SimilarityOps.cosine($"vec_id", $"embedding")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("native minhash_signature matches the composed form bit-for-bit") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val sh = graft.ops.TextOps.shingleSet(col("text"), 3)
    val both = docs.select(
      TextExpressions.minhash_signature(sh, 64).as("native"),
      graft.ops.TextOps.minhashSignatureComposed(sh, 64).as("composed"))
    assert(both.filter($"native" =!= $"composed").count() == 0)
    // degenerate inputs: empty shingle array => all-MaxValue signature
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(TextExpressions.minhash_signature(col("sh"), 4).as("sig"))
      .head().getSeq[Long](0)
    assert(empty.forall(_ == Long.MaxValue))
  }

  test("native simhash64 matches the composed form bit-for-bit") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = graft.ops.TextOps.tokens(col("text"))
    val both = docs.select(
      TextExpressions.simhash64(toks).as("native"),
      graft.ops.TextOps.simhash64Composed(toks).as("composed"))
    assert(both.filter($"native" =!= $"composed").count() == 0)
    // empty token array: all votes are 0, sign rule sets every bit
    val empty = Seq(Seq.empty[String]).toDF("t")
      .select(TextExpressions.simhash64(col("t")).as("s")).head().getLong(0)
    val emptyComposed = Seq(Seq.empty[String]).toDF("t")
      .select(graft.ops.TextOps.simhash64Composed(col("t")).as("s")).head().getLong(0)
    assert(empty == emptyComposed)
  }

  test("minhash_signature participates in whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = docs.select(
      TextExpressions.minhash_signature(graft.ops.TextOps.tokens(col("text")), 8).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("minhash_signature"), plan)
  }

  test("nfc_normalize composes decomposed forms, keeps NFC-stable text, codegens") {
    val rows = Seq(
      "café",            // e + combining acute -> é
      "Ångström",  // decomposed ring/diaeresis -> Ångström
      "ﬁne",              // fi ligature is NFC-stable (only NFKC folds it)
      "plain ascii",
      null.asInstanceOf[String]).toDF("t")
    val out = rows.select(TextExpressions.nfc_normalize($"t").as("n"))
      .as[String].collect()
    assert(out(0) == "café")
    assert(out(1) == "Ångström")
    assert(out(2) == "ﬁne")
    assert(out(3) == "plain ascii")
    assert(out(4) == null)
    // codegen span: literals constant-fold, so assert over a real scan
    val plan = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextExpressions.nfc_normalize($"text").as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("nfc_normalize"), plan)
  }

  test("native pq_encode matches the composed argmin bit-for-bit and codegens") {
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val seeds = embs.filter($"vec_id" < 16).select($"vec_id", $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val codebook: Seq[Seq[Seq[Float]]] =
      (0 until 8).map(j => seeds.toSeq.map(_._2.slice(j * 8, (j + 1) * 8)))
    val both = embs.select(
      VectorExpressions.pq_encode($"embedding", codebook).as("native"),
      graft.ops.SimilarityOps.pqEncodeComposed($"embedding", codebook).as("composed"))
    assert(both.filter($"native" =!= $"composed").count() == 0)
    val plan = embs.select(
      VectorExpressions.pq_encode($"embedding", codebook).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("pq_encode"), plan)
  }

  test("pcm_stats parses s16be buffers, ignores odd tail, and codegens") {
    // -32768 (0x8000), +1 (0x0001), -1 (0xFFFF), +257 (0x0101), odd tail
    val bytes = Array[Byte](0x80.toByte, 0x00, 0x00, 0x01,
      0xFF.toByte, 0xFF.toByte, 0x01, 0x01, 0x7F)
    // build the same bytes from a non-foldable column (hex of the range
    // id) — a pure literal would constant-fold into a LocalTableScan and
    // never exercise the codegen path this test asserts
    val df = spark.range(1, 2).select(
        unhex(concat(lit("8000"), lpad(hex($"id"), 4, "0"),
          lit("FFFF01017F"))).as("pcm"))
      .select(AudioExpressions.pcm_stats($"pcm").as("st"))
      .select($"st.n_samples", $"st.peak", $"st.sum_sq")
    val r = df.head()
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 32768) // |−32768| — the sign-extension edge
    assert(r.getLong(2) == 32768L * 32768 + 1 + 1 + 257L * 257)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("pcm_stats"), plan)
    // interpreted eval path agrees with codegen
    val row = PcmStats(org.apache.spark.sql.catalyst.expressions.Literal(bytes))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getInt(0) == 4 && row.getInt(1) == 32768 &&
      row.getLong(2) == r.getLong(2))
  }

  test("greedy tokenizer: longest match wins, UNK advances, codegen engages") {
    val vocab = Seq("ab", "abc", "b", "a", "c")
    val df = spark.range(0, 3)
      .select(element_at(
        typedlit(Seq("abc ab ba", "zzz", "abcabc")), ($"id" + 1).cast("int")).as("t"))
      .select(TextExpressions.greedy_tokenize($"t", vocab).as("ids"))
    val out = df.collect().map(_.getSeq[Int](0))
    // "abc"(2) " " "ab"(1) " " "b"(3),"a"(4); unknown 'z' -> 0 each;
    // "abcabc" -> abc,abc
    assert(out(0) == Seq(2, 1, 3, 4), s"got ${out(0)}")
    assert(out(1) == Seq(0, 0, 0), s"got ${out(1)}")
    assert(out(2) == Seq(2, 2), s"got ${out(2)}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("greedy_tokenize"), plan)
    // interpreted eval agrees with codegen
    val row = GreedyTokenize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc ab ba")), vocab)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(row.toIntArray().toSeq == Seq(2, 1, 3, 4))
    // guards: duplicate / empty / space-bearing pieces rejected
    intercept[Exception](TextExpressions.greedy_tokenize($"t", Seq("a", "a")))
    intercept[Exception](TextExpressions.greedy_tokenize($"t", Seq("a b")))
    intercept[Exception](TextExpressions.greedy_tokenize($"t", Seq("")))
  }

  test("GraftExtensions registers the full native surface for pure-SQL sessions") {
    import org.apache.spark.sql.SparkSession
    val orig = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.spark.GraftExtensions).getOrCreate()
      // every injected function resolves and computes from bare SQL
      val r = s2.sql("""SELECT
          cosine_similarity(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS cos,
          minhash_signature(array('a', 'b'), 4) AS mh,
          simhash64(array('a', 'b')) AS sh,
          nfc_normalize('é') AS nfc,
          sq8_decode(sq8_encode(array(0.5f, -0.5f), -1.0d, 0.0078125d),
            -1.0d, 0.0078125d) AS rt,
          wav_header(cast('' as binary)) AS wh,
          wav_pcm(cast('' as binary)) AS wp,
          greedy_tokenize('abc', array('ab', 'c')) AS toks
        """).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getSeq[Long](1).length == 4)
      assert(r.getString(3) == "é")
      val rt = r.getSeq[Double](4)
      assert(rt.length == 2 && math.abs(rt.head - 0.5) < 0.01)
      assert(r.isNullAt(5) && r.isNullAt(6), "non-WAV bytes decode to null")
      assert(r.getSeq[Int](7) == Seq(1, 2)) // vocab ids, 1-based; 0 = UNK
      // pcm_stats rides the same injection list (exercised with real WAVs
      // in the audio specs); here just prove it resolves
      assert(s2.sql("SELECT pcm_stats(cast('' as binary))").count() == 1)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("product UDAF handles empty and null groups") {
    val df = Seq((1, Some(2.0)), (1, Some(3.0)), (2, None), (3, Some(0.5)))
      .toDF("k", "v")
    val out = df.groupBy($"k").agg(ProductAgg.column($"v").as("p"))
      .orderBy($"k").as[(Int, Option[Double])].collect()
    assert(out.toSeq == Seq((1, Some(6.0)), (2, None), (3, Some(0.5))))
  }
}
