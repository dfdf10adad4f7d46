package graft.spark

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.meta.CollectionMeta

/** Native streaming sink: per-epoch atomic manifest commits with the epoch
  * id recorded in the manifest — restart with the same checkpoint must not
  * duplicate data. */
class StreamSinkSpec extends SparkSuite {
  import spark.implicits._

  test("writeStream.format(hadro) commits epochs exactly once across restarts") {
    val stage = Files.createTempDirectory("sink_src")
    val colPath = Files.createTempDirectory("sink_col").resolve("c").toString
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    src.coalesce(1).write.mode("overwrite").parquet(stage.toString)

    def run(): Unit = {
      val q = spark.readStream.schema(src.schema).parquet(stage.toString)
        .writeStream.format("hadro").option("checkpointLocation", ckpt)
        .start(colPath)
      q.processAllAvailable()
      q.stop()
    }
    run()
    assert(spark.read.format("hadro").load(colPath).count() == src.count())
    val m1 = CollectionMeta.currentManifest(Paths.get(colPath))
    assert(m1.streamEpochs.nonEmpty, "epoch must be recorded in the manifest")

    // restart with the SAME checkpoint and no new data: nothing re-commits
    run()
    assert(spark.read.format("hadro").load(colPath).count() == src.count())

    // new data arrives -> exactly the delta lands
    src.withColumn("n_name", org.apache.spark.sql.functions.upper($"n_name"))
      .coalesce(1).write.mode("append").parquet(stage.toString)
    run()
    assert(spark.read.format("hadro").load(colPath).count() == 2 * src.count())
  }

  test("auto-compact packs micro-batch epochs once the gate trips") {
    val stage = Files.createTempDirectory("ac_src")
    val colPath = Files.createTempDirectory("ac_col").resolve("c").toString
    val ckpt = Files.createTempDirectory("ac_ckpt").toString
    val schema = spark.range(1).select($"id", ($"id" * 1.0).as("v")).schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(stage.toString)
        .writeStream.format("hadro").option("checkpointLocation", ckpt)
        .option("hadro.autoCompact", (1L << 20).toString)
        .option("hadro.autoCompact.minSegments", "3")
        .option("maxFilesPerTrigger", "1") // one tiny segment per epoch
        .start(colPath)
      q.processAllAvailable()
      q.stop()
    }
    for (i <- 0 until 4)
      spark.range(i * 10L, i * 10L + 10L).select($"id", ($"id" * 1.0).as("v"))
        .coalesce(1).write.mode("append").parquet(stage.toString)
    run()
    val m = CollectionMeta.currentManifest(Paths.get(colPath))
    assert(m.segments.length < 4,
      s"gate at 3 must have packed: ${m.segments.map(_.bytes).mkString(",")}")
    val got = spark.read.format("hadro").load(colPath).orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 40)
    got.zipWithIndex.foreach { case ((id, v), i) =>
      assert(id == i && v == i * 1.0, s"row $i") }
  }

  test("streaming epochs keep a declared value-partitioned layout") {
    import org.apache.spark.sql.functions._
    val stage = Files.createTempDirectory("part_src")
    val ckpt = Files.createTempDirectory("part_ckpt").toString
    val w = Files.createTempDirectory("part_wh").toString
    spark.conf.set("spark.sql.catalog.pstream", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.pstream.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pstream.db")
    spark.sql("""CREATE TABLE pstream.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val colPath = Paths.get(w, "db", "ev").toString
    // a micro-batch spanning 3 days must split into 3 tagged segments
    // through the SAME writer routing the batch path uses
    spark.range(0, 30).select($"id",
      to_timestamp(lit("2026-07-01 00:00:00"))
        .plus(expr("make_interval(0, 0, 0, CAST(id % 3 AS INT), 0, 0, 0)")).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .parquet(stage.toString)
      .writeStream.format("hadro").option("checkpointLocation", ckpt)
      .start(colPath)
    q.processAllAvailable()
    q.stop()
    val segs = CollectionMeta.currentManifest(Paths.get(colPath)).segments
    assert(segs.length == 3, s"expected 3 day-segments, got ${segs.length}")
    assert(segs.flatMap(_.partition).distinct.length == 3, segs.map(_.partition).toString)
    assert(spark.read.format("hadro").load(colPath).count() == 30L)
    spark.sql("DROP TABLE pstream.db.ev")
  }

  test("streaming writes enforce CHECK constraints through the shared writer path") {
    val stage = Files.createTempDirectory("ck_src")
    val colPath = Files.createTempDirectory("ck_col").resolve("c").toString
    val ckpt = Files.createTempDirectory("ck_ckpt").toString
    // seed batch-side with a constraint, then stream into the same
    // collection: the constraint must gate the streaming epoch too
    Seq((1L, "ok")).toDF("k", "v")
      .write.format("hadro").mode("append").save(colPath)
    graft.api.Collection(spark, colPath).addConstraint("k_pos", "k > 0")

    Seq((2L, "fine")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    def run(): Unit = {
      val q = spark.readStream
        .schema(Seq((1L, "x")).toDF("k", "v").schema).parquet(stage.toString)
        .writeStream.format("hadro").option("checkpointLocation", ckpt)
        .start(colPath)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.format("hadro").load(colPath).count() == 2)

    // a violating micro-batch fails the epoch; nothing commits
    Seq((-7L, "bad")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(stage.toString)
    intercept[Exception](run())
    assert(spark.read.format("hadro").load(colPath).count() == 2,
      "violating epoch must not commit")
  }

  test("a replayed epoch's duplicate segments are dropped, not double-published") {
    val colPath = Files.createTempDirectory("replay_col").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    // seed the collection and simulate: epoch 5 committed...
    src.write.format("hadro").mode("append").save(colPath)
    CollectionMeta.commit(Paths.get(colPath),
      m => m.copy(streamEpochs = m.streamEpochs + ("q-1" -> 5L)))
    val before = CollectionMeta.currentManifest(Paths.get(colPath))
    // ...then a recovery replays epoch 5 with a fresh segment file
    val w = new HadroStreamingWrite(Paths.get(colPath), src.schema,
      graft.format.Consistency.Relaxed, mutating = false, keyField = None,
      splitBytes = graft.format.SegmentWriter.DefaultSplitBytes, queryId = "q-1")
    val writer = new graft.format.SegmentWriter(
      Paths.get(colPath).resolve("data-replay.data"), src.schema,
      graft.format.Consistency.Relaxed)
    val toInternal = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(src.schema)
    src.collect().foreach(r => writer.append(
      toInternal(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]))
    val info = writer.close()
    w.commit(5L, Array(HadroCommitMessage(Seq(info))))
    val after = CollectionMeta.currentManifest(Paths.get(colPath))
    assert(after.version == before.version, "replayed epoch must not commit")
    assert(!Files.exists(Paths.get(colPath).resolve("data-replay.data")),
      "duplicate segment file must be dropped")
    assert(spark.read.format("hadro").load(colPath).count() == src.count())
  }

  test("maxOrdinalsPerTrigger bounds backfill micro-batches") {
    val colPath = Files.createTempDirectory("admission").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
    graft.api.Collection.create(spark, colPath, src, numSegments = 8)
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("hadro")
      .option("hadro.maxOrdinalsPerTrigger", "2").load(colPath)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(batch.count()): Unit
      }.start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.sum == src.count(), "backfill must cover the whole log")
    assert(sizes.count(_ > 0) >= 4,
      s"8 segments at 2 ordinals/trigger should take >= 4 batches, got $sizes")
    assert(sizes.max < src.count(), "no single giant batch")
  }

  test("truncate under a stream fails fast even after the new log outgrows the old") {
    // The hard case for ordinal-only detection: the rewritten log GROWS
    // PAST the old next-ordinal, so offset ranges look plausible again and
    // a stream without generation tracking would silently skip the new
    // log's first records. The manifest generation makes it fail loudly.
    val colPath = Files.createTempDirectory("gen_fail").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    graft.api.Collection.create(spark, colPath, src) // 1 segment: nextOrdinal=1
    val name = s"gen_fail_${System.nanoTime()}"
    val q = spark.readStream.format("hadro").load(colPath)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    src.write.format("hadro").mode("overwrite").save(colPath) // truncate: gen+1
    graft.api.Collection(spark, colPath).append(src) // 2 segments: nextOrdinal=2 > 1
    val e = intercept[Exception] { q.processAllAvailable() }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("truncated"))),
      s"unexpected: $e")
    q.stop()
  }

  test("hadro.onTruncate=restart re-tails the rewritten log exactly once") {
    val colPath = Files.createTempDirectory("gen_restart").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    graft.api.Collection.create(spark, colPath, src, numSegments = 2)
    val name = s"gen_restart_${System.nanoTime()}"
    val q = spark.readStream.format("hadro")
      .option("hadro.onTruncate", "restart").load(colPath)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    assert(spark.table(name).count() == src.count())
    // rewrite in place, then append — the restart must emit the rewritten
    // log once and keep tailing subsequent appends without re-emission
    src.limit(10).write.format("hadro").mode("overwrite").save(colPath)
    q.processAllAvailable()
    assert(spark.table(name).count() == src.count() + 10)
    graft.api.Collection(spark, colPath).append(src.limit(3))
    q.processAllAvailable()
    assert(spark.table(name).count() == src.count() + 13)
    q.stop()
  }

  test("AvailableNow: pin excludes post-pin appends; capped drain reaches exactly the pin") {
    // Deterministic pin semantics via direct source calls: prepare pins
    // the end, an append lands AFTER the pin, and latestOffset must drain
    // admission-bounded batches to exactly the pinned ordinal — never the
    // live end.
    val colPath = Files.createTempDirectory("an_pin").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    graft.api.Collection.create(spark, colPath, src, numSegments = 6)
    val stream = new HadroMicroBatchStream(Paths.get(colPath),
      src.schema, src.schema, maxOrdinalsPerTrigger = 2L)
    stream.prepareForTriggerAvailableNow()
    val pinned = CollectionMeta.currentManifest(Paths.get(colPath)).nextOrdinal
    graft.api.Collection(spark, colPath).append(src) // post-pin: next run's data
    var off = stream.initialOffset().asInstanceOf[HadroOffset]
    val seen = scala.collection.mutable.Buffer.empty[Long]
    var i = 0
    while (off.nextOrdinal < pinned && i < 100) {
      off = stream.latestOffset(off, stream.getDefaultReadLimit)
        .asInstanceOf[HadroOffset]
      seen += off.nextOrdinal
      i += 1
    }
    assert(off.nextOrdinal == pinned,
      s"drain must stop exactly at the pin $pinned, got ${off.nextOrdinal}")
    assert(seen.size >= 3, s"2-ordinal cap over 6 segments needs >=3 steps: $seen")
    // and it never advances past the pin even though the live log is longer
    val again = stream.latestOffset(off, stream.getDefaultReadLimit)
      .asInstanceOf[HadroOffset]
    assert(again.nextOrdinal == pinned)
  }

  test("AvailableNow: end-to-end self-stop, then a checkpointed second run resumes exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val colPath = Files.createTempDirectory("an_e2e").resolve("c").toString
    val sinkPath = Files.createTempDirectory("an_sink").resolve("out").toString
    val ckpt = Files.createTempDirectory("an_ckpt").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = graft.api.Collection.create(spark, colPath, src, numSegments = 4)

    def run(): Unit = {
      val q = spark.readStream.format("hadro")
        .option("hadro.maxOrdinalsPerTrigger", "2").load(colPath)
        .writeStream.format("hadro").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(sinkPath)
      assert(q.awaitTermination(120000), "AvailableNow must stop by itself")
    }
    run()
    assert(spark.read.format("hadro").load(sinkPath).count() == src.count())

    c.append(src.select(($"n_nationkey" + 100).as("n_nationkey"), $"n_name",
      $"n_regionkey"))
    run() // resumes from the committed offset: ONLY the new segments
    val out = spark.read.format("hadro").load(sinkPath)
    assert(out.count() == src.count() * 2,
      "second run must emit exactly the post-pin appends, no replays")
    assert(out.filter($"n_nationkey" >= 100).count() == src.count())
  }
}
