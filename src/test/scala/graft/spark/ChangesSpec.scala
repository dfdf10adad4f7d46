package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Batch changefeed window (`hadro.changesStart` / `hadro.changesEnd`):
  * the batch twin of the streaming source's startingVersion replay —
  * scan only the records committed inside a (startVersion, endVersion]
  * window, planned from the manifest ordinal floor (no data read outside
  * the window). Sound only while the window is append-shaped; anything
  * else (truncate/compaction/overwrite, partition drops, dv deletes)
  * fails fast. */
class ChangesSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("c").toString

  test("typed_changes procedure registers a SQL-consumable view of " +
      "_change_type rows; unkeyed tables refuse with the Scala-API message") {
    val wh = Files.createTempDirectory("tcview_wh").toString
    spark.conf.set("spark.sql.catalog.tcv", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.tcv.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tcv.db")
      val keyed = Paths.get(wh, "db", "k").toString
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
        .write.format("hadro").mode("overwrite")
        .option("hadro.key", "id").save(keyed)
      val c = Collection(spark, keyed)
      val v1 = c.version
      c.set(Seq((1L, 99.0), (3L, 30.0)).toDF("id", "v"))
      c.merge(Seq((2L, 20.0, true)).toDF("id", "v", "d"), $"d")
      val v2 = c.version
      val desc = spark.sql(
        s"CALL tcv.system.typed_changes('db.k', $v1, $v2, 'tcv_changes')")
        .collect()
      assert(desc.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        == Seq(("tcv_changes", v1, v2)))
      val rows = spark.sql(
        """SELECT id, v, _change_type FROM tcv_changes
           ORDER BY _change_type, id""")
        .as[(Long, Double, String)].collect().toSeq
      assert(rows == Seq(
        (2L, 20.0, "delete"),
        (3L, 30.0, "insert"),
        (1L, 99.0, "update_postimage"),
        (1L, 10.0, "update_preimage")), rows.toString)

      // unkeyed: the procedure surfaces ChangeFeed's refusal through SQL
      val unkeyed = Paths.get(wh, "db", "u").toString
      Seq((1L, "a")).toDF("id", "s")
        .write.format("hadro").mode("overwrite").save(unkeyed)
      val e = intercept[Exception](spark.sql(
        "CALL tcv.system.typed_changes('db.u', 0, 1, 'tcv_nope')").collect())
      assert(e.getMessage.contains("KEYED"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.tcv.warehouse")
      spark.conf.unset("spark.sql.catalog.tcv")
    }
  }

  test("changes window replays exactly the appended records") {
    val w = tmp("chg")
    Collection.create(spark, w, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val c = Collection(spark, w)
    val v1 = c.version
    c.append(Seq((3L, "c"), (4L, "d")).toDF("id", "s"))
    val v2 = Collection(spark, w).version
    c.append(Seq((5L, "e")).toDF("id", "s"))

    // (v1, current]: both later batches
    val sinceV1 = spark.read.format("hadro")
      .option("hadro.changesStart", v1.toString).load(w)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sinceV1 == Seq(3L, 4L, 5L), sinceV1.toString)

    // (v1, v2]: only the middle batch
    val window = spark.read.format("hadro")
      .option("hadro.changesStart", v1.toString)
      .option("hadro.changesEnd", v2.toString).load(w)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(window == Seq(3L, 4L), window.toString)

    // (v2, v2]: empty — a consumer that is caught up reads nothing
    val empty = spark.read.format("hadro")
      .option("hadro.changesStart", v2.toString)
      .option("hadro.changesEnd", v2.toString).load(w)
    assert(empty.count() == 0L)

    // planning reads ONLY the window's segments (incremental consumers
    // never rescan the table) — proven by the scan metrics: 1 of 3
    // segments planned, 2 skipped at the ordinal floor
    val scan = spark.read.format("hadro")
      .option("hadro.changesStart", v1.toString)
      .option("hadro.changesEnd", v2.toString).load(w).select("id", "s")
    assert(scan.count() == 2L)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val probe = spark.read.format("hadro")
      .option("hadro.changesStart", v1.toString)
      .option("hadro.changesEnd", v2.toString).load(w).select("id")
    probe.collect()
    val b = walk(probe.queryExecution.executedPlan)
      .collectFirst { case x: BatchScanExec => x }.get
    val p = Paths.get(w)
    val floor = CollectionMeta.manifestAt(p, v1).nextOrdinal
    val inWindow = CollectionMeta.manifestAt(p, v2).segments
      .count(_.ordinal >= floor)
    val total = CollectionMeta.manifestAt(p, v2).segments.size
    assert(inWindow < total, "window must exclude the first batch")
    assert(b.metrics("hadroSegmentsRead").value == inWindow.toLong,
      s"read ${b.metrics("hadroSegmentsRead").value}, window $inWindow of $total")
  }

  test("changes window composes with changefeed=full: upserts and tombstones as CDC rows") {
    val w = tmp("chgcdc")
    Collection.create(spark, w,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), key = Some("id"))
    val c = Collection(spark, w)
    val v1 = c.version
    c.set(Seq((1L, "a2")).toDF("id", "s")) // upsert: new version of key 1
    c.delete(2L) // keyed tombstone
    val feed = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", v1.toString).load(w)
      .select("id", "_hadro_deleted")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(feed == Seq((1L, false), (2L, true)), feed.toString)
    // the plain window view skips tombstones (reference scan semantics):
    // only the upserted record remains
    val plain = spark.read.format("hadro")
      .option("hadro.changesStart", v1.toString).load(w)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(1L), plain.toString)
  }

  test("a tag resolves as the window edge") {
    val w = tmp("chgtag")
    Collection.create(spark, w, Seq((1L, "a")).toDF("id", "s"))
    val c = Collection(spark, w)
    c.createTag("base")
    c.append(Seq((2L, "b")).toDF("id", "s"))
    val since = spark.read.format("hadro")
      .option("hadro.changesStart", "base").load(w)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(since == Seq(2L), since.toString)
  }

  test("non-append windows fail fast: compaction, dv delete, partition drop") {
    // generation crossing (compaction renumbers the ordinal space)
    val w1 = tmp("chgen")
    Collection.create(spark, w1,
      spark.range(0, 20).select($"id", ($"id" * 1.0).as("v")), numSegments = 4)
    val c1 = Collection(spark, w1)
    val v1 = c1.version
    c1.append(Seq((100L, 1.0)).toDF("id", "v"))
    c1.compact()
    val e1 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", v1.toString).load(w1).count()
    }
    // the chain walk reads through DATA-PRESERVING rewrites, but this
    // full compact swallowed the IN-WINDOW append — its rows can no
    // longer be attributed, so the window must still refuse
    assert(e1.getMessage.contains("consumed in-window appended"),
      e1.getMessage)

    // dv delete inside the window: row-level erasure, not an ordinal event
    val wh2 = Files.createTempDirectory("chgdv_wh").toString
    spark.conf.set("spark.sql.catalog.chgdv", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgdv.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgdv.db")
    spark.sql("CREATE TABLE chgdv.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO chgdv.db.t SELECT id, id * 1.0 FROM range(0, 40, 1, 2)")
    val dir2 = Paths.get(wh2, "db", "t").toString
    val v2 = Collection(spark, dir2).version
    spark.sql("INSERT INTO chgdv.db.t VALUES (100, 1.0)")
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM chgdv.db.t WHERE id >= 0 AND id < 5")
    finally spark.conf.unset("spark.hadro.delete.mode")
    val e2 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", v2.toString).load(dir2).count()
    }
    assert(e2.getMessage.contains("deletion-vector"), e2.getMessage)
    spark.sql("DROP TABLE chgdv.db.t")

    // a dropped partition's rows vanished without an ordinal event
    val w3 = Files.createTempDirectory("chgdrop").toString
    spark.conf.set("spark.sql.catalog.chgdrop", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgdrop.warehouse", w3)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgdrop.db")
    spark.sql("""CREATE TABLE chgdrop.db.ev (id BIGINT, d DATE)
      USING hadro PARTITIONED BY (days(d))""")
    spark.sql("""INSERT INTO chgdrop.db.ev VALUES
      (1, DATE '2026-01-01'), (2, DATE '2026-03-01')""")
    val dir = Paths.get(w3, "db", "ev").toString
    val v3 = Collection(spark, dir).version
    spark.sql("INSERT INTO chgdrop.db.ev VALUES (3, DATE '2026-03-02')")
    Collection(spark, dir).dropPartitions("20455") // drops 2026-01-01
    val e3 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", v3.toString).load(dir).count()
    }
    assert(e3.getMessage.contains("dropped"), e3.getMessage)
    spark.sql("DROP TABLE chgdrop.db.ev")
  }

  test("dv deletes inside a changefeed window synthesize CDC delete rows; " +
      "vector-union drift splits exactly across two windows") {
    val wh = Files.createTempDirectory("chgdvcdc_wh").toString
    spark.conf.set("spark.sql.catalog.chgdvcdc", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgdvcdc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgdvcdc.db")
    spark.sql("CREATE TABLE chgdvcdc.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO chgdvcdc.db.t SELECT id, id * 1.0 FROM range(0, 40, 1, 2)")
    val dir = Paths.get(wh, "db", "t").toString
    val v1 = Collection(spark, dir).version
    // in-window: one ordinal append, one append that is dv-deleted again
    // inside the SAME window (must net out), and TWO dv deletes on the
    // pre-window segments (the second unions into the first's vector)
    spark.sql("INSERT INTO chgdvcdc.db.t VALUES (100, 1.0), (200, 2.0)")
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try {
      spark.sql("DELETE FROM chgdvcdc.db.t WHERE id >= 0 AND id < 5")
      spark.sql("DELETE FROM chgdvcdc.db.t WHERE id = 200")
      val v2 = Collection(spark, dir).version
      spark.sql("DELETE FROM chgdvcdc.db.t WHERE id >= 5 AND id < 8")
      val v3 = Collection(spark, dir).version

      def window(a: Long, b: Long): Seq[(Long, Double, Boolean)] =
        spark.read.format("hadro")
          .option("hadro.changefeed", "full")
          .option("hadro.changesStart", a.toString)
          .option("hadro.changesEnd", b.toString).load(dir)
          .select($"id", $"v", $"_hadro_deleted")
          .as[(Long, Double, Boolean)].collect().sorted.toSeq

      // (v1, v2]: the surviving insert + synthesized deletes for 0..4,
      // with their ORIGINAL column values; 200 netted out (never seen)
      assert(window(v1, v2) ==
        (0L until 5L).map(i => (i, i * 1.0, true)) :+ ((100L, 1.0, false)),
        window(v1, v2).toString)
      // (v2, v3]: ONLY the second drift — the union vector minus the
      // first window's bits — no inserts
      assert(window(v2, v3) == (5L until 8L).map(i => (i, i * 1.0, true)),
        window(v2, v3).toString)
      // (v1, v3]: both drifts plus the insert — windows compose
      assert(window(v1, v3) ==
        (0L until 8L).map(i => (i, i * 1.0, true)) :+ ((100L, 1.0, false)),
        window(v1, v3).toString)
      // synthesized deletes carry their original (pre-window) sequence
      // numbers: ordinal part below the window floor
      val floorOrd = CollectionMeta.manifestAt(
        Paths.get(dir), v1).nextOrdinal
      val delSeqs = spark.read.format("hadro")
        .option("hadro.changefeed", "full")
        .option("hadro.changesStart", v1.toString)
        .option("hadro.changesEnd", v3.toString).load(dir)
        .filter($"_hadro_deleted")
        .select($"_hadro_seq").as[Long].collect()
      assert(delSeqs.length == 8 &&
        delSeqs.forall(s => (s >> 40) < floorOrd), delSeqs.mkString(","))
      // a PLAIN window read over the same drift still refuses (it cannot
      // represent a deletion) and points at changefeed=full
      val e = intercept[Exception] {
        spark.read.format("hadro")
          .option("hadro.changesStart", v1.toString).load(dir).count()
      }
      assert(e.getMessage.contains("changefeed=full"), e.getMessage)
    } finally spark.conf.unset("spark.hadro.delete.mode")
    spark.sql("DROP TABLE chgdvcdc.db.t")
  }

  test("a partition dropped inside a changefeed window synthesizes CDC " +
      "deletes for its live rows; plain reads still refuse") {
    val wh = Files.createTempDirectory("chgdropcdc").toString
    spark.conf.set("spark.sql.catalog.chgdropcdc", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgdropcdc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgdropcdc.db")
    spark.sql("""CREATE TABLE chgdropcdc.db.ev (id BIGINT, d DATE)
      USING hadro PARTITIONED BY (days(d))""")
    spark.sql("""INSERT INTO chgdropcdc.db.ev VALUES
      (1, DATE '2026-01-01'), (2, DATE '2026-01-01'), (3, DATE '2026-03-01')""")
    val dir = Paths.get(wh, "db", "ev").toString
    // pre-drop: a dv delete on the day ABOUT to be dropped — its already-
    // dead row must NOT resurface as a second delete event
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM chgdropcdc.db.ev WHERE id = 2")
    finally spark.conf.unset("spark.hadro.delete.mode")
    val v1 = Collection(spark, dir).version
    spark.sql("INSERT INTO chgdropcdc.db.ev VALUES (4, DATE '2026-03-02')")
    Collection(spark, dir).dropPartitions("20455") // drops days < 20455 = 2026-01-01
    val out = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", v1.toString).load(dir)
      .select($"id", $"_hadro_deleted").as[(Long, Boolean)]
      .collect().sorted.toSeq
    // id=1: the dropped day's LIVE row -> synthesized delete; id=2 was
    // already dv-dead at the window start (no event); id=4: the insert
    assert(out == Seq((1L, true), (4L, false)), out.toString)
    // plain reads over the same window still refuse, naming the escape
    val e = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", v1.toString).load(dir).count()
    }
    assert(e.getMessage.contains("dropped") &&
      e.getMessage.contains("changefeed=full"), e.getMessage)
    spark.sql("DROP TABLE chgdropcdc.db.ev")
  }

  test("changesStartTimestamp resolves the floor through TIMESTAMP AS OF " +
      "semantics; conflicts with changesStart; pre-history fails fast") {
    val w = tmp("chgts")
    Collection.create(spark, w, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val c = Collection(spark, w)
    val v1 = c.version
    val t1 = CollectionMeta.manifestAt(Paths.get(w), v1).committedAtMs
    Thread.sleep(15) // distinct commit milliseconds
    c.append(Seq((3L, "c")).toDF("id", "s"))
    // epoch-millis form: newest version committed at or before t1 = v1
    val sinceT1 = spark.read.format("hadro")
      .option("hadro.changesStartTimestamp", t1.toString).load(w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sinceT1 == Seq(3L), sinceT1.toString)
    // ISO-instant form resolves identically
    val iso = java.time.Instant.ofEpochMilli(t1).toString
    val sinceIso = spark.read.format("hadro")
      .option("hadro.changesStartTimestamp", iso).load(w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sinceIso == Seq(3L), sinceIso.toString)
    // both floor forms together: refused
    val e1 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", v1.toString)
        .option("hadro.changesStartTimestamp", t1.toString).load(w).count()
    }
    assert(e1.getMessage.contains("not both"), e1.getMessage)
    // an instant before all retained history fails fast, like time travel
    val e2 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStartTimestamp", "100").load(w).count()
    }
    assert(e2.getMessage.contains("committed at or before"), e2.getMessage)
    // hadro.timestampAsOf: the option-surface TIMESTAMP AS OF — pins the
    // snapshot by instant, and doubles as the window's END edge
    val pinned = spark.read.format("hadro")
      .option("hadro.timestampAsOf", t1.toString).load(w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(pinned == Seq(1L, 2L), pinned.toString)
    Thread.sleep(15)
    c.append(Seq((4L, "d")).toDF("id", "s"))
    val t2 = CollectionMeta.manifestAt(Paths.get(w),
      Collection(spark, w).version - 1).committedAtMs
    val windowTs = spark.read.format("hadro")
      .option("hadro.changesStartTimestamp", t1.toString)
      .option("hadro.timestampAsOf", t2.toString).load(w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(windowTs == Seq(3L), windowTs.toString)
    // one snapshot pin only
    val e3 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.timestampAsOf", t1.toString)
        .option("hadro.versionAsOf", v1.toString).load(w).count()
    }
    assert(e3.getMessage.contains("same snapshot pin"), e3.getMessage)
  }

  test("option validation: stream rejects the batch window; both-edges conflict") {
    val w = tmp("chgopt")
    Collection.create(spark, w, Seq((1L, "a")).toDF("id", "s"))
    val v = Collection(spark, w).version
    val e = intercept[Exception] {
      val q = spark.readStream.format("hadro")
        .option("hadro.changesStart", v.toString).load(w)
        .writeStream.format("memory").queryName("chgopt_q").start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("hadro.startingVersion")), e.getMessage)

    val e2 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesEnd", v.toString)
        .option("hadro.versionAsOf", v.toString).load(w).count()
    }
    assert(chain(e2).exists(c => c.getMessage != null &&
      c.getMessage.contains("same pin")), e2.getMessage)

    // inverted window: start beyond end
    Collection(spark, w).append(Seq((2L, "b")).toDF("id", "s"))
    val vNew = Collection(spark, w).version
    val e3 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", vNew.toString)
        .option("hadro.changesEnd", v.toString).load(w).count()
    }
    assert(chain(e3).exists(c => c.getMessage != null &&
      c.getMessage.contains("inverted")), e3.getMessage)
  }

  test("changes window flows through spark.read.options().table() on catalog tables") {
    val w = Files.createTempDirectory("chgcat").toString
    spark.conf.set("spark.sql.catalog.chgcat", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgcat.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgcat.db")
    spark.sql("CREATE TABLE chgcat.db.t (id BIGINT) USING hadro")
    spark.sql("INSERT INTO chgcat.db.t VALUES (1), (2)")
    val v1 = Collection(spark, Paths.get(w, "db", "t").toString).version
    spark.sql("INSERT INTO chgcat.db.t VALUES (3)")
    val since = spark.read
      .option("hadro.changesStart", v1.toString)
      .table("chgcat.db.t")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(since == Seq(3L), since.toString)
    spark.sql("DROP TABLE chgcat.db.t")
  }

  test("partitions metadata table summarizes per-partition inventory") {
    val w = Files.createTempDirectory("chgparts").toString
    spark.conf.set("spark.sql.catalog.chgparts", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgparts.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgparts.db")
    spark.sql("""CREATE TABLE chgparts.db.docs (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 90)
      .select($"id", concat(lit("r"), ($"id" % 3).cast("string")).as("region"))
      .createOrReplaceTempView("chgparts_src")
    spark.sql("INSERT INTO chgparts.db.docs SELECT * FROM chgparts_src")
    spark.sql("INSERT INTO chgparts.db.docs VALUES (1000, 'r1')")
    val rows = spark.sql("""SELECT partition, n_segments, n_rows
        FROM chgparts.db.docs.partitions ORDER BY partition""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("r0", 1L, 30L), ("r1", 2L, 31L), ("r2", 1L, 30L)),
      rows.toString)
    spark.sql("DROP TABLE chgparts.db.docs")
  }

  test("a cursor tag extends manifest retention: a consumer lagging far " +
      "past KeepVersions still replays its window through a rewrite") {
    val w = tmp("chglag")
    Collection.create(spark, w, Seq((0L, "seed")).toDF("id", "s"))
    val c = Collection(spark, w)
    c.createTag("cursor")
    val floor = c.version
    // lag far past the KeepVersions ageout window: a rewrite plus many
    // more commits than count-based retention would keep
    assert(c.compactSmall(1L << 30) >= 0)
    (1L to (CollectionMeta.KeepVersions + 6L)).foreach { i =>
      c.append(Seq((i, s"v$i")).toDF("id", "s"))
    }
    // the tag kept every manifest >= the floor alive, so the chain walk
    // classifies all of them and the window is exactly the appends
    val ids = spark.read.format("hadro")
      .option("hadro.changesStart", "cursor").load(w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == (1L to (CollectionMeta.KeepVersions + 6L)), ids.toString)
    // an UNTAGGED collection at the same lag keeps bounded retention:
    // the old floor ages out and the window fail-fasts as documented
    val w2 = tmp("chglag2")
    Collection.create(spark, w2, Seq((0L, "seed")).toDF("id", "s"))
    val c2 = Collection(spark, w2)
    val floor2 = c2.version
    (1L to (CollectionMeta.KeepVersions + 6L)).foreach { i =>
      c2.append(Seq((i, s"v$i")).toDF("id", "s"))
    }
    val e = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", floor2.toString).load(w2).count()
    }
    assert(e.getMessage.contains("not available"), e.getMessage)
  }

  test("changes windows read THROUGH data-preserving rewrites; " +
      "row-changing rewrites still refuse") {
    val wh = Files.createTempDirectory("chgrw_wh").toString
    spark.conf.set("spark.sql.catalog.chgrw", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgrw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgrw.db")
    spark.sql("CREATE TABLE chgrw.db.t (id BIGINT, s STRING) USING hadro")
    val w = Paths.get(wh, "db", "t").toString
    // several small pre-window segments
    (0L until 20L).map(i => (i, s"v$i")).toDF("id", "s").repartition(4)
      .write.format("hadro").mode("append").save(w)
    val c = Collection(spark, w)
    val v1 = c.version

    // in-window: a compactSmall bins the pre-window smalls (generation
    // bump, rewrite provenance), then fresh rows land
    assert(c.compactSmall(1 << 20) >= 1, "bins expected")
    c.append(Seq((100L, "new-a"), (101L, "new-b")).toDF("id", "s"))

    // the window reads THROUGH the rewrite: exactly the appended rows
    val ids = spark.read.format("hadro")
      .option("hadro.changesStart", v1.toString).load(w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(100L, 101L), ids.toString)
    // provenance landed on the rewrite outputs
    val m = CollectionMeta.currentManifest(Paths.get(w))
    assert(m.segments.exists(_.rewritten), "rewrite outputs must be marked")

    // dv deletes on REWRITE OUTPUTS (floor-equivalent files) synthesize
    // CDC deletes for their pre-window rows
    val v2 = c.version
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM chgrw.db.t WHERE id < 3")
    finally spark.conf.unset("spark.hadro.delete.mode")
    val feed = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", v1.toString).load(w)
      .select($"id", $"_hadro_deleted").as[(Long, Boolean)]
      .collect().sorted.toSeq
    assert(feed == Seq((0L, true), (1L, true), (2L, true),
      (100L, false), (101L, false)), feed.toString)
    // (v2, head]: only the deletes — the chain re-based the floor set
    // through the rewrite, so the drift diffs against v2's vectors
    val feed2 = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", v2.toString).load(w)
      .select($"id", $"_hadro_deleted").as[(Long, Boolean)]
      .collect().sorted.toSeq
    assert(feed2 == Seq((0L, true), (1L, true), (2L, true)), feed2.toString)

    // a FULL compact that swallows in-window appends refuses: the
    // appended rows can no longer be attributed inside the rewrite
    val v3 = c.version
    c.append(Seq((200L, "x")).toDF("id", "s"))
    c.compact()
    val e1 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changefeed", "full")
        .option("hadro.changesStart", v3.toString).load(w).count()
    }
    assert(e1.getMessage.contains("consumed in-window appended"), e1.getMessage)

    // a row-CHANGING rewrite (REPLACE WHERE) refuses on provenance
    val v4 = c.version
    Seq((0L, "replacement")).toDF("id", "s")
      .write.format("hadro")
      .option("hadro.replaceWhere", "id < 50")
      .mode("overwrite").save(w)
    val e2 = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changesStart", v4.toString).load(w).count()
    }
    assert(e2.getMessage.contains("rewrite provenance") ||
      e2.getMessage.contains("not a provable data-preserving"), e2.getMessage)
  }

  test("a tag-pinned cursor keeps its window readable across compaction, " +
      "dv deletes AND vacuum; vacuum after a FOLDING rewrite refuses " +
      "actionably") {
    val wh = Files.createTempDirectory("chgpin_wh").toString
    spark.conf.set("spark.sql.catalog.chgpin", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgpin.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgpin.db")
    spark.sql("CREATE TABLE chgpin.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO chgpin.db.t SELECT id, id * 1.0 FROM range(0, 20, 1, 4)")
    val dir = Paths.get(wh, "db", "t").toString
    val c = Collection(spark, dir)
    c.createTag("cursor")
    // in-window: rewrite FIRST, then dv deletes (landing on the rewrite
    // outputs — live files whose sidecars the current manifest keeps),
    // an append, and a VACUUM. The cursor tag pins the floor manifest
    // and its files, the live manifest keeps the drift sidecars, so the
    // whole window stays readable through the sweep.
    assert(c.compactSmall(1L << 30) >= 1)
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM chgpin.db.t WHERE id < 3")
    finally spark.conf.unset("spark.hadro.delete.mode")
    spark.sql("INSERT INTO chgpin.db.t VALUES (100, 1.0)")
    c.vacuum()
    val feed = spark.read.format("hadro")
      .option("hadro.changefeed", "full")
      .option("hadro.changesStart", "cursor").load(dir)
      .select($"id", $"_hadro_deleted").as[(Long, Boolean)]
      .collect().sorted.toSeq
    assert(feed == Seq((0L, true), (1L, true), (2L, true), (100L, false)),
      feed.toString)
    // the OTHER order — dv delete, then a rewrite that FOLDS it, then
    // vacuum — reclaims the intermediate dv sidecar (it belongs to an
    // untagged intermediate version: the floor tag cannot pin it), so
    // the window refuses at PLAN time with the replay-from-snapshot
    // recovery path, never a task FileNotFoundException. Operationally:
    // vacuum after consumers advance, or replay from snapshot.
    c.createTag("cursor2")
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM chgpin.db.t WHERE id >= 3 AND id < 5")
    finally spark.conf.unset("spark.hadro.delete.mode")
    assert(c.compactSmall(1L << 30) >= 1) // folds the fresh dv rows
    c.vacuum()
    val e = intercept[Exception] {
      spark.read.format("hadro")
        .option("hadro.changefeed", "full")
        .option("hadro.changesStart", "cursor2").load(dir).count()
    }
    assert(e.getMessage.contains("reclaimed") ||
      e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("incremental rollup: MERGE of tag-pinned changefeed windows equals " +
      "full recompute across a two-cycle handoff") {
    val wh = Files.createTempDirectory("chgroll_wh").toString
    spark.conf.set("spark.sql.catalog.chgroll", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.chgroll.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chgroll.db")
    val factDir = Paths.get(wh, "db", "f").toString
    val aggDir = Paths.get(wh, "db", "agg").toString
    Seq((0L, "a", 1.0), (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0),
      (4L, "b", 2.0), (5L, "b", 2.0)).toDF("id", "g", "v")
      .write.format("hadro").mode("overwrite").save(factDir)
    Collection(spark, factDir).createTag("cursor")
    // the rollup is materialized FROM the tag-pinned snapshot, so cursor
    // and rollup start consistent even if the fact table moves meanwhile
    spark.read.format("hadro").option("hadro.versionAsOf", "cursor")
      .load(factDir)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .write.format("hadro").mode("overwrite")
      .option("hadro.key", "g").save(aggDir)

    def cycle(): Unit = {
      val fact = Collection(spark, factDir)
      val head = fact.version
      spark.read.format("hadro")
        .option("hadro.changefeed", "full")
        .option("hadro.changesStart", "cursor")
        .option("hadro.changesEnd", head.toString).load(factDir)
        .groupBy($"g")
        .agg(sum(when($"_hadro_deleted", -1L).otherwise(1L)).as("dn"),
          sum(when($"_hadro_deleted", -$"v").otherwise($"v")).as("dsv"))
        .createOrReplaceTempView("chgroll_delta")
      spark.sql("""MERGE INTO chgroll.db.agg t USING chgroll_delta d
        ON t.g = d.g
        WHEN MATCHED AND t.n + d.dn = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET n = t.n + d.dn, sv = t.sv + d.dsv
        WHEN NOT MATCHED THEN INSERT (g, n, sv) VALUES (d.g, d.dn, d.dsv)""")
      fact.createTag("cursor", head)
    }
    def rollup(): Seq[(String, Long, Double)] =
      Collection(spark, aggDir).toDF()
        .select($"g", $"n", $"sv").as[(String, Long, Double)]
        .collect().sortBy(_._1).toSeq
    def recompute(): Seq[(String, Long, Double)] =
      Collection(spark, factDir).toDF()
        .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

    spark.conf.set("spark.hadro.delete.mode", "dv")
    try {
      // cycle 1: id 7 is appended AND dv-deleted in-window (must net out
      // of the delta); group b vanishes entirely (rollup DELETE branch);
      // group c appears (rollup INSERT branch)
      Seq((6L, "c", 5.0), (7L, "c", -1.0), (8L, "a", 3.0)).toDF("id", "g", "v")
        .write.format("hadro").mode("append").save(factDir)
      spark.sql("DELETE FROM chgroll.db.f WHERE v < 0.0")
      spark.sql("DELETE FROM chgroll.db.f WHERE g = 'b'")
      cycle()
      assert(rollup() == Seq(("a", 5L, 7.0), ("c", 1L, 5.0)), rollup().toString)
      assert(rollup() == recompute())
      // cycle 2 applies cleanly on top of the advanced cursor: group b
      // reborn (INSERT again after DELETE), an update to a
      Seq((9L, "b", 4.0)).toDF("id", "g", "v")
        .write.format("hadro").mode("append").save(factDir)
      spark.sql("DELETE FROM chgroll.db.f WHERE id = 0")
      cycle()
      assert(rollup() == Seq(("a", 4L, 6.0), ("b", 1L, 4.0), ("c", 1L, 5.0)),
        rollup().toString)
      assert(rollup() == recompute())
      // caught up: an empty window MERGEs zero rows and moves nothing
      cycle()
      assert(rollup() == recompute())
    } finally spark.conf.unset("spark.hadro.delete.mode")
    spark.sql("DROP TABLE chgroll.db.agg")
    spark.sql("DROP TABLE chgroll.db.f")
  }
}
