package graft.spark

import java.nio.file.Files

import graft.SparkSuite
import graft.api.Collection

/** Streaming-source start positioning: `hadro.startingVersion` picks where a
  * FRESH query (no checkpoint) begins tailing the segment log — full
  * backfill (default), a specific commit onward (CDC resume from a known
  * snapshot), or `latest` (new appends only). Checkpointed restarts ignore
  * it: the committed offset wins. */
class StreamSourceSpec extends SparkSuite {
  import spark.implicits._

  test("source progress reports segmentsBehind and drains to zero") {
    val colPath = Files.createTempDirectory("met_col").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    src.repartition(4).write.format("hadro").mode("append").save(colPath)
    val q = spark.readStream.format("hadro").load(colPath)
      .writeStream.format("memory").queryName("met_sink").outputMode("append")
      .start()
    q.processAllAvailable()
    val metrics = q.lastProgress.sources.head.metrics
    assert(metrics.get("segmentsBehind") == "0",
      s"drained stream must report zero backlog, got $metrics")
    assert(metrics.containsKey("logGeneration"))
    // new appends show up as backlog on the NEXT progress
    src.write.format("hadro").mode("append").save(colPath)
    val s0 = new HadroMicroBatchStream(
      java.nio.file.Paths.get(colPath), src.schema, src.schema)
    val lag = s0.metrics(java.util.Optional.of(
      q.lastProgress.sources.head.endOffset match {
        case s: String => s0.deserializeOffset(s)
        case _ => fail("unexpected offset form")
      }))
    assert(lag.get("segmentsBehind").toLong >= 1L)
    q.stop()
  }

  test("a tailing stream survives drop_partitions beneath it") {
    import org.apache.spark.sql.functions._
    // retention under a live tail is the 100 TB steady state: the drop
    // removes whole partitions from the manifest WITHOUT reassigning
    // ordinals or bumping the generation, so a stream that already
    // consumed them sees no discontinuity, and unread-but-dropped
    // ordinals are simply absent from later batches (retention wins).
    val w = Files.createTempDirectory("sdrop_wh").toString
    spark.conf.set("spark.sql.catalog.sdrop", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.sdrop.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sdrop.db")
    spark.sql("""CREATE TABLE sdrop.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val colPath = java.nio.file.Paths.get(w, "db", "ev").toString
    def appendDay(fromId: Long, dayOffset: Int, n: Int): Unit =
      spark.range(fromId, fromId + n).select(col("id"),
        to_timestamp(lit("2026-10-01 00:00:00"))
          .plus(expr(s"make_interval(0, 0, 0, $dayOffset, 0, 0, 0)")).as("ts"))
        .coalesce(1)
        .write.format("hadro").mode("append").save(colPath)
    // day-1 first, then day-0 LAST — so the day-0 segment holds the MAX
    // ordinal and the drop exercises the ordinal-floor watermark (without
    // it, nextOrdinal would regress and the next append would reuse
    // ordinals the stream already consumed: silently lost rows)
    appendDay(0, 1, 10)
    appendDay(100, 0, 10)
    val q = spark.readStream.format("hadro").load(colPath)
      .writeStream.format("memory").queryName("sdrop_sink").outputMode("append")
      .start()
    q.processAllAvailable()
    assert(spark.table("sdrop_sink").count() == 20L)
    // drop the older day (the max-ordinal segment) UNDER the running
    // stream, then keep appending
    val c = graft.api.Collection(spark, colPath)
    val day0 = java.time.LocalDate.of(2026, 10, 1).toEpochDay
    assert(c.dropPartitions((day0 + 1).toString) == 1)
    assert(spark.read.format("hadro").load(colPath).count() == 10L)
    appendDay(200, 1, 10)
    q.processAllAvailable()
    // the tail continued without a restart/failure, picked up ALL the new
    // rows (the watermark kept their ordinals past the consumed range),
    // and nothing was re-read
    assert(q.exception.isEmpty, q.exception.toString)
    assert(spark.table("sdrop_sink").count() == 30L)
    assert(spark.table("sdrop_sink").select(col("id")).as[Long].collect().toSet
      == ((0L until 10L) ++ (100L until 110L) ++ (200L until 210L)).toSet)
    q.stop()
    spark.sql("DROP TABLE sdrop.db.ev")
  }

  test("maxBytesPerTrigger bounds micro-batch volume, never stalls") {
    val colPath = Files.createTempDirectory("bpt_col").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    src.repartition(6).write.format("hadro").mode("append").save(colPath)
    val segs = graft.meta.CollectionMeta
      .currentManifest(java.nio.file.Paths.get(colPath)).segments
    val maxSeg = segs.map(_.bytes).max
    // cap below a single segment: every batch admits exactly one ordinal
    // (progress guarantee) and the stream still drains everything
    val stream = new HadroMicroBatchStream(
      java.nio.file.Paths.get(colPath), src.schema, src.schema,
      maxBytesPerTrigger = maxSeg / 2)
    var off = stream.initialOffset().asInstanceOf[HadroOffset]
    var batches = 0
    while (off.nextOrdinal < segs.size && batches < 100) {
      val next = stream
        .latestOffset(off, stream.getDefaultReadLimit)
        .asInstanceOf[HadroOffset]
      assert(next.nextOrdinal == off.nextOrdinal + 1,
        "sub-segment cap must admit exactly one ordinal per batch")
      off = next; batches += 1
    }
    assert(batches == segs.size)
    // a roomy cap admits several segments per batch but bounds the bytes
    val roomy = new HadroMicroBatchStream(
      java.nio.file.Paths.get(colPath), src.schema, src.schema,
      maxBytesPerTrigger = maxSeg * 3)
    val first = roomy.latestOffset(roomy.initialOffset(),
      roomy.getDefaultReadLimit).asInstanceOf[HadroOffset]
    assert(first.nextOrdinal > 1 && first.nextOrdinal < segs.size,
      s"roomy cap should admit a strict subset, got ${first.nextOrdinal}")
    val admitted = segs.filter(_.ordinal < first.nextOrdinal).map(_.bytes).sum
    assert(admitted <= maxSeg * 3)
    // end-to-end: the capped stream drains the full collection
    val q = spark.readStream.format("hadro")
      .option("hadro.maxBytesPerTrigger", (maxSeg / 2).toString).load(colPath)
      .writeStream.format("memory").queryName("bpt_sink").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("bpt_sink").count() == src.count())
  }

  test("startingVersion positions a fresh stream at the requested commit") {
    val colPath = Files.createTempDirectory("sv_col").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val n = src.count()
    src.write.format("hadro").mode("append").save(colPath)
    val c = Collection(spark, colPath)
    val v1 = c.version
    src.write.format("hadro").mode("append").save(colPath)
    src.write.format("hadro").mode("append").save(colPath)
    val v3 = c.version
    val v2 = v3 - 1

    var i = 0
    def countFrom(sv: String): Long = {
      i += 1
      val name = s"sv_mem_$i"
      val q = spark.readStream.format("hadro")
        .option("hadro.startingVersion", sv).load(colPath)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
      spark.table(name).count()
    }

    assert(countFrom(v1.toString) == 3 * n, "from the first commit: everything")
    assert(countFrom(v2.toString) == 2 * n, "from v2: commits 2 and 3")
    assert(countFrom(v3.toString) == n, "from the head commit: just its rows")
    assert(countFrom("latest") == 0L, "latest: only future appends")

    // a TAG resumes from "changes AFTER the pinned snapshot" — the CDC
    // handoff: the pin keeps the resume point retained under expiry
    c.createTag("ingested", v2)
    assert(countFrom("ingested") == n, "after the v2 tag: commit 3 only")

    // startingTimestamp: the instant form of the same resume point —
    // "changes after the snapshot as of <v2's commit instant>"
    val t2 = graft.meta.CollectionMeta.manifestAt(
      java.nio.file.Paths.get(colPath), v2).committedAtMs
    i += 1
    val nameTs = s"sv_mem_$i"
    val qTs = spark.readStream.format("hadro")
      .option("hadro.startingTimestamp", t2.toString).load(colPath)
      .writeStream.format("memory").queryName(nameTs).outputMode("append")
      .start()
    qTs.processAllAvailable(); qTs.stop()
    assert(spark.table(nameTs).count() == n,
      "startingTimestamp at v2's instant: commit 3 only")
    // both resume forms together: refused (stream start is async — the
    // scan-builder require surfaces at the first planned batch)
    val qBad = spark.readStream.format("hadro")
      .option("hadro.startingVersion", v2.toString)
      .option("hadro.startingTimestamp", t2.toString).load(colPath)
      .writeStream.format("memory").queryName("sv_mem_conflict")
      .outputMode("append").start()
    val exBoth =
      try intercept[Exception] { qBad.processAllAvailable() }
      finally qBad.stop()
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(e => Option(e.getMessage)).toSeq
    assert(msgs(exBoth).exists(_.contains("not both")), msgs(exBoth).mkString(" | "))

    // resuming from an EXPIRED snapshot fails fast, like time travel
    c.expireSnapshots(System.currentTimeMillis() + 60_000)
    val ex = intercept[Exception] { countFrom(v2.toString) }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(e => Option(e.getMessage)).toSeq
    assert(messages(ex).exists(_.contains("not available")),
      s"expected a retention error, got: ${messages(ex).mkString(" | ")}")
    // the tag survived the expiry: its resume point still positions
    assert(countFrom("ingested") == n)
    // unknown tags fail loudly, naming the available ones
    val ex2 = intercept[Exception] { countFrom("nope") }
    assert(messages(ex2).exists(_.contains("ingested")))
  }

  test("changefeed stream synthesizes CDC delete rows from a dv delete mid-tail") {
    val wh = Files.createTempDirectory("stdv_wh").toString
    spark.conf.set("spark.sql.catalog.stdv", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.stdv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stdv.db")
    spark.sql("CREATE TABLE stdv.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO stdv.db.t SELECT id, id * 1.0 FROM range(0, 20, 1, 2)")
    val dir = java.nio.file.Paths.get(wh, "db", "t").toString

    val q = spark.readStream.format("hadro")
      .option("hadro.changefeed", "full").load(dir)
      .writeStream.format("memory").queryName("stdv_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 1: the backfill, all inserts
      assert(spark.table("stdv_mem").count() == 20L)
      assert(spark.table("stdv_mem")
        .filter($"_hadro_deleted").count() == 0L)
      // mid-tail: a dv DELETE with NO new ordinals — a version-only
      // offset advance must still produce a micro-batch with the
      // synthesized delete rows
      spark.conf.set("spark.hadro.delete.mode", "dv")
      try spark.sql("DELETE FROM stdv.db.t WHERE id >= 0 AND id < 4")
      finally spark.conf.unset("spark.hadro.delete.mode")
      q.processAllAvailable()
      val dels = spark.table("stdv_mem").filter($"_hadro_deleted")
        .select($"id", $"v").as[(Long, Double)].collect().sorted.toSeq
      assert(dels == (0L until 4L).map(i => (i, i * 1.0)), dels.toString)
      // appends after the delete keep flowing in the same stream
      spark.sql("INSERT INTO stdv.db.t VALUES (100, 1.0)")
      q.processAllAvailable()
      assert(spark.table("stdv_mem")
        .filter(!$"_hadro_deleted").count() == 21L)
      assert(spark.table("stdv_mem").count() == 25L)
    } finally q.stop()
    // a PLAIN (non-changefeed) stream over the same collection ignores
    // the vectored rows entirely — no phantom rows, no delete events
    val q2 = spark.readStream.format("hadro").load(dir)
      .writeStream.format("memory").queryName("stdv_mem2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("stdv_mem2").count() == 17L) // 20 - 4 dv + 1 append
    } finally q2.stop()
    spark.sql("DROP TABLE stdv.db.t")
  }

  test("CDC tag handoff: a changefeed stream from a tag replays dv deletes " +
      "committed AFTER the pinned snapshot, never the ones already in it") {
    val wh = Files.createTempDirectory("sttag_wh").toString
    spark.conf.set("spark.sql.catalog.sttag", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.sttag.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sttag.db")
    spark.sql("CREATE TABLE sttag.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO sttag.db.t SELECT id, id * 1.0 FROM range(0, 20, 1, 2)")
    val dir = java.nio.file.Paths.get(wh, "db", "t").toString
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try {
      // delete A lands BEFORE the snapshot the consumer ingested
      spark.sql("DELETE FROM sttag.db.t WHERE id < 3")
      val c = Collection(spark, dir)
      c.createTag("ingested")
      // delete B and an append land AFTER the handoff point
      spark.sql("DELETE FROM sttag.db.t WHERE id >= 3 AND id < 5")
      spark.sql("INSERT INTO sttag.db.t VALUES (100, 1.0)")
      val q = spark.readStream.format("hadro")
        .option("hadro.changefeed", "full")
        .option("hadro.startingVersion", "ingested").load(dir)
        .writeStream.format("memory").queryName("sttag_mem")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val rows = spark.table("sttag_mem")
          .select($"id", $"_hadro_deleted").as[(Long, Boolean)]
          .collect().sorted.toSeq
        // delete A (ids 0-2) was already inside the ingested snapshot: no
        // event; delete B (ids 3-4) replays as CDC deletes; the append flows
        assert(rows == Seq((3L, true), (4L, true), (100L, false)),
          rows.toString)
      } finally q.stop()
    } finally spark.conf.unset("spark.hadro.delete.mode")
    spark.sql("DROP TABLE sttag.db.t")
  }

  test("changefeed stream reads THROUGH a mid-tail compaction; " +
      "a truncate still restarts/fails") {
    val wh = Files.createTempDirectory("strw_wh").toString
    spark.conf.set("spark.sql.catalog.strw", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.strw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS strw.db")
    spark.sql("CREATE TABLE strw.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO strw.db.t SELECT id, id * 1.0 FROM range(0, 20, 1, 4)")
    val dir = java.nio.file.Paths.get(wh, "db", "t").toString
    val c = Collection(spark, dir)

    val q = spark.readStream.format("hadro")
      .option("hadro.changefeed", "full").load(dir)
      .writeStream.format("memory").queryName("strw_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("strw_mem").count() == 20L)
      // mid-tail: the COMPACTOR runs (generation bump, rewrite
      // provenance). The caught-up changefeed stream must read through
      // it — the rewrite's outputs are pre-window rows, NOT re-emitted
      val gen0 = graft.meta.CollectionMeta.currentManifest(
        java.nio.file.Paths.get(dir)).generation
      assert(c.compactSmall(1L << 30) >= 1)
      assert(graft.meta.CollectionMeta.currentManifest(
        java.nio.file.Paths.get(dir)).generation != gen0)
      q.processAllAvailable()
      assert(spark.table("strw_mem").count() == 20L,
        "a data-preserving rewrite must emit NOTHING to the tail")
      // the tail keeps flowing after the rewrite
      spark.sql("INSERT INTO strw.db.t VALUES (100, 1.0)")
      q.processAllAvailable()
      assert(spark.table("strw_mem").count() == 21L)
      // and dv deletes landing on REWRITE OUTPUTS still synthesize CDC
      // delete rows (the floor re-based through the rewrite)
      spark.conf.set("spark.hadro.delete.mode", "dv")
      try spark.sql("DELETE FROM strw.db.t WHERE id < 2")
      finally spark.conf.unset("spark.hadro.delete.mode")
      q.processAllAvailable()
      val dels = spark.table("strw_mem").filter($"_hadro_deleted")
        .select($"id").as[Long].collect().sorted.toSeq
      assert(dels == Seq(0L, 1L), dels.toString)
    } finally q.stop()

    // a TRUNCATE is not data-preserving: the stream still fails fast
    val q2 = spark.readStream.format("hadro")
      .option("hadro.changefeed", "full").load(dir)
      .writeStream.format("memory").queryName("strw_mem2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      spark.sql("INSERT OVERWRITE strw.db.t SELECT id, id * 2.0 FROM range(0, 5)")
      val e = intercept[Exception] {
        spark.sql("INSERT INTO strw.db.t VALUES (200, 2.0)")
        q2.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(12).toSeq
      assert(chain(e).exists(x => Option(x.getMessage).exists(
        _.contains("cannot be proven data-preserving"))), e.toString)
    } finally q2.stop()
  }

  test("changefeed stream synthesizes CDC deletes for a partition dropped mid-tail") {
    val wh = Files.createTempDirectory("stdrop_wh").toString
    spark.conf.set("spark.sql.catalog.stdrop", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.stdrop.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stdrop.db")
    spark.sql("""CREATE TABLE stdrop.db.ev (id BIGINT, d DATE)
      USING hadro PARTITIONED BY (days(d))""")
    spark.sql("""INSERT INTO stdrop.db.ev VALUES
      (1, DATE '2026-01-01'), (2, DATE '2026-01-01'), (3, DATE '2026-03-01')""")
    val dir = java.nio.file.Paths.get(wh, "db", "ev").toString
    val q = spark.readStream.format("hadro")
      .option("hadro.changefeed", "full").load(dir)
      .writeStream.format("memory").queryName("stdrop_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("stdrop_mem").count() == 3L)
      // mid-tail: retention drop of the old day — a version-only advance
      // whose batch carries the day's rows as synthesized deletes
      Collection(spark, dir).dropPartitions("20455")
      q.processAllAvailable()
      val dels = spark.table("stdrop_mem").filter($"_hadro_deleted")
        .select($"id").as[Long].collect().sorted.toSeq
      assert(dels == Seq(1L, 2L), dels.toString)
      // the tail keeps flowing
      spark.sql("INSERT INTO stdrop.db.ev VALUES (4, DATE '2026-03-02')")
      q.processAllAvailable()
      assert(spark.table("stdrop_mem").count() == 6L)
    } finally q.stop()
    spark.sql("DROP TABLE stdrop.db.ev")
  }

  test("endingVersion bounds the replay window; composes with startingVersion") {
    val colPath = Files.createTempDirectory("ev_col").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val n = src.count()
    src.write.format("hadro").mode("append").save(colPath)
    val c = Collection(spark, colPath)
    val v1 = c.version
    src.write.format("hadro").mode("append").save(colPath)
    val v2 = c.version
    src.write.format("hadro").mode("append").save(colPath)

    var i = 0
    def windowCount(opts: Map[String, String]): Long = {
      i += 1
      val name = s"ev_mem_$i"
      val reader = opts.foldLeft(spark.readStream.format("hadro")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(colPath)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
      spark.table(name).count()
    }

    // bounded replay of an exact version window — reproducible even
    // while the live log keeps growing
    assert(windowCount(Map("hadro.endingVersion" -> v1.toString)) == n,
      "up to v1: only the first commit")
    assert(windowCount(Map(
      "hadro.startingVersion" -> v2.toString,
      "hadro.endingVersion" -> v2.toString)) == n,
      "the (v1, v2] window: exactly commit 2")
    assert(windowCount(Map("hadro.endingVersion" -> v2.toString)) == 2 * n)

    // a tag names the window edge too
    c.createTag("cut", v2)
    assert(windowCount(Map("hadro.endingVersion" -> "cut")) == 2 * n)

    // a batch read must use changesEnd/versionAsOf instead
    val e = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.endingVersion", v1.toString).load(colPath).count()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(messages(e).exists(_.contains("changesEnd")), messages(e).toString)
  }
}
