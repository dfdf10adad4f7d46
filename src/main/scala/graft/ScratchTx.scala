package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: transaction atomicity + native cosine through the
  * public library surface. */
object ScratchTx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val path = "/tmp/graft_tx_probe/c"
    val c = graft.api.Collection.create(spark, path,
      Seq((1L, "one"), (2L, "two")).toDF("k", "v"), key = Some("k"))
    val p = java.nio.file.Paths.get(path)
    val v0 = graft.meta.CollectionMeta.currentManifest(p).version
    c.transaction { b =>
      b.add(Seq((3L, "three")).toDF("k", "v"))
      b.add(Seq((4L, "four")).toDF("k", "v"))
      b.set(Seq((1L, "ONE")).toDF("k", "v"))
    }
    val v1 = graft.meta.CollectionMeta.currentManifest(p).version
    println(s"== tx: manifest $v0 -> $v1 (one commit), count=${c.count()}, k1=${c.get(1L).select("v").as[String].head()}")
    // failing transaction body: nothing committed
    try c.transaction { b => b.add(Seq((9L, "x")).toDF("k", "v")); sys.error("boom") }
    catch { case _: RuntimeException => () }
    println(s"== tx-abort: manifest ${graft.meta.CollectionMeta.currentManifest(p).version}, count=${c.count()}")
    // native cosine via SQL registration
    graft.functions.VectorExpressions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("e")
    spark.sql("""SELECT vec_id, ROUND(cosine_similarity(embedding,
        (SELECT embedding FROM e WHERE vec_id = 7)), 3) AS c
      FROM e ORDER BY c DESC LIMIT 3""").show()
    // indexes facade probe
    println(s"== indexes.list: ${c.indexes.list().mkString(",")}")
    c.indexes.describe().show(4, false)
    // columnar-path null probe: flat schema with nulls in every column kind
    val nulls = Seq(
      (1L, Some("a"), Some(1.5)), (2L, None, None), (3L, Some("c"), Some(-2.5)))
      .toDF("k", "s", "d")
      .select($"k", $"s", $"d")
    graft.api.Collection.create(spark, "/tmp/graft_nullprobe/c", nulls)
    val back = spark.read.format("hadro").load("/tmp/graft_nullprobe/c")
    back.collect() // force execution through the columnar reader
    val plan = back.queryExecution.executedPlan.toString
    println(s"== columnar in plan: ${plan.contains("ColumnarToRow")}")
    println(s"== null roundtrip: ${back.orderBy("k").collect().mkString(" | ")}")
    // can a stream select the _hadro_seq metadata column?
    try {
      val st = spark.readStream.format("hadro").load(path)
        .select($"k", $"v", $"_hadro_seq")
      val q = st.writeStream.format("memory").queryName("seqprobe").outputMode("append").start()
      q.processAllAvailable(); q.stop()
      println(s"== stream seq probe: ${spark.table("seqprobe").orderBy("_hadro_seq").collect().mkString(" | ")}")
    } catch { case e: Exception => println(s"== stream seq probe FAILED: ${e.getMessage.linesIterator.next()}") }
    spark.stop()
  }
}
