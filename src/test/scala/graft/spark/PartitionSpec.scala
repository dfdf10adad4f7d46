package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Declared value partitioning (`PARTITIONED BY (days(ts))` / identity):
  * writes must route rows to one segment per transform value, the
  * catalog INSERT must cluster the input so a day lands in one segment,
  * and a time-range filter must prune to exactly the matching
  * partitions through the existing stats skipper — the 100 TB event-log
  * layout contract. */
class PartitionSpec extends SparkSuite {
  import spark.implicits._

  private def scanNode(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val plan = df.queryExecution.executedPlan
    walk(plan).collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail(s"no BatchScanExec in:\n$plan"))
  }

  private def setupCatalog(name: String): String = {
    val w = Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[HadroCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", w)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    w
  }

  test("days-partitioned table: one segment per day, range scan prunes to the day") {
    val w = setupCatalog("pdays")
    spark.sql("""CREATE TABLE pdays.db.events (id BIGINT, ts TIMESTAMP, v DOUBLE)
      USING hadro PARTITIONED BY (days(ts))""")
    // 5 days x 48 rows, arriving interleaved (the write must route, not rely
    // on input order)
    spark.range(0, 240)
      .select($"id",
        to_timestamp(lit("2026-03-01 00:00:00")).cast("timestamp")
          .plus(expr("make_interval(0, 0, 0, CAST(id % 5 AS INT), 0, CAST(id AS INT), 0)")).as("ts"),
        ($"id" * 1.5).as("v"))
      .createOrReplaceTempView("pdays_src")
    spark.sql("INSERT INTO pdays.db.events SELECT * FROM pdays_src")

    val dir = Paths.get(w, "db", "events")
    val segs = CollectionMeta.currentManifest(dir).segments
    // clustered INSERT: exactly one segment per day, every segment tagged
    assert(segs.length == 5, s"expected 5 day-segments, got ${segs.length}")
    val tags = segs.flatMap(_.partition)
    assert(tags.length == 5 && tags.distinct.length == 5, tags.mkString(","))
    // the declared layout survives round-trip
    val meta = CollectionMeta.readSchema(dir).get
    assert(meta.partitionBy.contains("ts") && meta.partitionTransform.contains("days"))

    // a one-day range scan plans exactly 1 of 5 segments via segment stats
    val df = spark.sql("""SELECT COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,2))) AS s
      FROM pdays.db.events
      WHERE ts >= TIMESTAMP '2026-03-03 00:00:00' AND ts < TIMESTAMP '2026-03-04 00:00:00'""")
    val rows = df.collect()
    assert(rows.head.getLong(0) == 48L, rows.head.toString)
    val m = scanNode(df).metrics
    assert(m("hadroSegmentsRead").value == 1L, m("hadroSegmentsRead").value)
    assert(m("hadroSegmentsPruned").value == 4L, m("hadroSegmentsPruned").value)
    spark.sql("DROP TABLE pdays.db.events")
  }

  test("identity-partitioned table routes per value and prunes equality scans") {
    val w = setupCatalog("pident")
    spark.sql("""CREATE TABLE pident.db.docs (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 90)
      .select($"id", concat(lit("r"), ($"id" % 3).cast("string")).as("region"))
      .createOrReplaceTempView("pident_src")
    spark.sql("INSERT INTO pident.db.docs SELECT * FROM pident_src")
    val dir = Paths.get(w, "db", "docs")
    val segs = CollectionMeta.currentManifest(dir).segments
    assert(segs.length == 3, s"expected 3 region-segments, got ${segs.length}")
    assert(segs.flatMap(_.partition).sorted == Seq("r0", "r1", "r2"))
    val df = spark.sql("SELECT COUNT(*) AS n FROM pident.db.docs WHERE region = 'r1'")
    assert(df.collect().head.getLong(0) == 30L)
    val m = scanNode(df).metrics
    assert(m("hadroSegmentsRead").value == 1L && m("hadroSegmentsPruned").value == 2L)
    // observability: the partition tag surfaces in the metadata tables
    val files = spark.sql(
      "SELECT partition FROM pident.db.docs.files ORDER BY partition")
      .collect().map(_.getString(0)).toSeq
    assert(files == Seq("r0", "r1", "r2"), files.toString)
    val detail = spark.sql(
      "SELECT partition_by, partition_transform FROM pident.db.docs.detail")
      .collect().head
    assert(detail.getString(0) == "region" && detail.getString(1) == "identity")
    spark.sql("DROP TABLE pident.db.docs")
  }

  test("plain appends (path API) keep the declared layout") {
    val w = setupCatalog("pappend")
    spark.sql("""CREATE TABLE pappend.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val dir = Paths.get(w, "db", "ev").toString
    // a path-based append (no catalog, no clustered distribution) must
    // still route per day — more segments possible, never mixed days
    val df = spark.range(0, 40).select($"id",
      to_timestamp(lit("2026-04-01 00:00:00"))
        .plus(expr("make_interval(0, 0, 0, CAST(id % 2 AS INT), 0, 0, 0)")).as("ts"))
      .repartition(2)
    df.write.format("hadro").mode("append").save(dir)
    val segs = CollectionMeta.currentManifest(Paths.get(dir)).segments
    assert(segs.nonEmpty && segs.forall(_.partition.isDefined))
    // every segment holds exactly one day: its ts stats span < 1 day
    segs.foreach { s =>
      val st = s.stats("ts")
      assert(st.min.isDefined && st.max.isDefined, s"no ts stats on ${s.file}")
    }
    val byTag = segs.groupBy(_.partition.get)
    assert(byTag.keySet.size == 2, byTag.keySet.toString)
    spark.sql("DROP TABLE pappend.db.ev")
  }

  test("compaction preserves the partition layout (one segment per day)") {
    val w = setupCatalog("pcompact")
    spark.sql("""CREATE TABLE pcompact.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val dir = Paths.get(w, "db", "ev")
    // three appends over the same 3 days -> 9 day-segments
    (0 until 3).foreach { b =>
      spark.range(b * 30, b * 30 + 30).select($"id",
        to_timestamp(lit("2026-05-01 00:00:00"))
          .plus(expr("make_interval(0, 0, 0, CAST(id % 3 AS INT), 0, 0, 0)")).as("ts"))
        .createOrReplaceTempView("pcompact_src")
      spark.sql("INSERT INTO pcompact.db.ev SELECT * FROM pcompact_src")
    }
    assert(CollectionMeta.currentManifest(dir).segments.length == 9)
    Collection(spark, dir.toString).compact()
    val segs = CollectionMeta.currentManifest(dir).segments
    // the rewrite is clustered by the transform: back to one per day
    assert(segs.length == 3, s"expected 3 day-segments after compact, got ${segs.length}")
    assert(segs.flatMap(_.partition).distinct.length == 3)
    val df = spark.sql("""SELECT COUNT(*) AS n FROM pcompact.db.ev
      WHERE ts >= TIMESTAMP '2026-05-02 00:00:00'
        AND ts < TIMESTAMP '2026-05-03 00:00:00'""")
    assert(df.collect().head.getLong(0) == 30L)
    val m = scanNode(df).metrics
    assert(m("hadroSegmentsRead").value == 1L && m("hadroSegmentsPruned").value == 2L)
    spark.sql("DROP TABLE pcompact.db.ev")
  }

  test("compaction clustering is timezone-free (non-UTC session, days stay whole)") {
    val w = setupCatalog("ptz")
    spark.sql("""CREATE TABLE ptz.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val dir = Paths.get(w, "db", "ev")
    // rows straddling UTC midnight: a session-zoned date_trunc would
    // group them by LOCAL day and split every UTC day across segments
    (0 until 2).foreach { _ =>
      spark.range(0, 48).select($"id",
        to_timestamp(lit("2026-08-01 22:00:00"))
          .plus(expr("make_interval(0, 0, 0, 0, CAST(id AS INT), 0, 0)")).as("ts"))
        .createOrReplaceTempView("ptz_src")
      spark.sql("INSERT INTO ptz.db.ev SELECT * FROM ptz_src")
    }
    val savedTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try Collection(spark, dir.toString).compact()
    finally spark.conf.set("spark.sql.session.timeZone", savedTz)
    val segs = CollectionMeta.currentManifest(dir).segments
    // 48 hours from 22:00 UTC touch 3 UTC days -> exactly 3 segments,
    // regardless of the session timezone the compaction ran under
    assert(segs.length == 3, s"expected 3 UTC-day segments, got ${segs.length}")
    assert(segs.flatMap(_.partition).distinct.length == 3)
    assert(spark.sql("SELECT COUNT(*) AS n FROM ptz.db.ev")
      .collect().head.getLong(0) == 96L)
    spark.sql("DROP TABLE ptz.db.ev")
  }

  test("compact_partitions: one partition rewritten, the rest carried by reference") {
    val w = setupCatalog("pscoped")
    spark.sql("""CREATE TABLE pscoped.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val dir = Paths.get(w, "db", "ev")
    (0 until 3).foreach { b =>
      spark.range(b * 30, b * 30 + 30).select($"id",
        to_timestamp(lit("2026-11-01 00:00:00"))
          .plus(expr("make_interval(0, 0, 0, CAST(id % 3 AS INT), 0, 0, 0)")).as("ts"))
        .coalesce(1).createOrReplaceTempView("pscoped_src")
      spark.sql("INSERT INTO pscoped.db.ev SELECT * FROM pscoped_src")
    }
    val segs0 = CollectionMeta.currentManifest(dir).segments
    assert(segs0.length == 9)
    val day1 = (java.time.LocalDate.of(2026, 11, 2).toEpochDay).toString
    val untouched = segs0.filterNot(_.partition.contains(day1)).map(_.file).toSet
    // SQL: compact ONLY the hot day
    val out = spark.sql(
      s"CALL pscoped.system.compact_partitions('db.ev', '$day1')").collect().head
    assert(out.getInt(0) == 1, out.toString)
    val segs1 = CollectionMeta.currentManifest(dir).segments
    assert(segs1.length == 7, s"expected 7 segments, got ${segs1.length}")
    assert(segs1.count(_.partition.contains(day1)) == 1)
    // the other partitions' files were carried by REFERENCE, not rewritten
    assert(segs1.filterNot(_.partition.contains(day1)).map(_.file).toSet == untouched)
    // empty tags = every fragmented partition
    val c = Collection(spark, dir.toString)
    assert(c.compactPartitions() == 2)
    assert(CollectionMeta.currentManifest(dir).segments.length == 3)
    assert(spark.sql("SELECT COUNT(*) AS n FROM pscoped.db.ev")
      .collect().head.getLong(0) == 90L)
    // guard: mutated collections keep compactSmall's contiguity discipline
    spark.sql("""CREATE TABLE pscoped.db.kv (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts)) TBLPROPERTIES('key'='id')""")
    spark.sql("INSERT INTO pscoped.db.kv SELECT * FROM pscoped_src")
    val kv = Collection(spark, Paths.get(w, "db", "kv").toString)
    kv.set(Seq((1L, java.sql.Timestamp.valueOf("2026-11-01 00:00:00")))
      .toDF("id", "ts"))
    val e = intercept[Exception](kv.compactPartitions())
    assert(e.getMessage.contains("pure-append"), e.getMessage)
    spark.sql("DROP TABLE pscoped.db.ev")
    spark.sql("DROP TABLE pscoped.db.kv")
  }

  test("drop_partitions: metadata-only retention, time travel survives, guards hold") {
    val w = setupCatalog("pdrop")
    spark.sql("""CREATE TABLE pdrop.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val dir = Paths.get(w, "db", "ev")
    spark.range(0, 100).select($"id",
      to_timestamp(lit("2026-06-01 00:00:00"))
        .plus(expr("make_interval(0, 0, 0, CAST(id % 5 AS INT), 0, 0, 0)")).as("ts"))
      .createOrReplaceTempView("pdrop_src")
    spark.sql("INSERT INTO pdrop.db.ev SELECT * FROM pdrop_src")
    val preDrop = Collection(spark, dir.toString).version
    // cutoff = the day tag of 2026-06-03 (days since epoch, the writer's tag)
    val cutoff = java.time.LocalDate.of(2026, 6, 3).toEpochDay.toString
    val out = spark.sql(
      s"CALL pdrop.system.drop_partitions('db.ev', '$cutoff')").collect().head
    assert(out.getInt(0) == 2, s"expected 2 segments dropped, got $out")
    // the head reads only the surviving days — zero data was rewritten
    val n = spark.sql("SELECT COUNT(*) AS n FROM pdrop.db.ev").collect().head.getLong(0)
    assert(n == 60L, s"expected 60 surviving rows, got $n")
    assert(CollectionMeta.currentManifest(dir).segments.length == 3)
    // time travel across the drop still reads the full snapshot
    val before = spark.sql(
      s"SELECT COUNT(*) AS n FROM pdrop.db.ev VERSION AS OF $preDrop")
      .collect().head.getLong(0)
    assert(before == 100L, s"pre-drop snapshot must keep all rows, got $before")
    // guard: a date-string cutoff on a numeric-ordinal transform errors
    // instead of falling back to lexicographic order (which would compare
    // "20239" < "2026-06-03" and silently mass-drop nearly everything)
    val eNum = intercept[Exception](
      Collection(spark, dir.toString).dropPartitions("2026-06-03"))
    assert(eNum.getMessage.contains("integer ordinal"), eNum.getMessage)
    // guard: a mutated collection refuses (could lose tombstones/LWW heads)
    spark.sql("""CREATE TABLE pdrop.db.kv (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts)) TBLPROPERTIES('key'='id')""")
    spark.sql("INSERT INTO pdrop.db.kv SELECT * FROM pdrop_src")
    val kv = Collection(spark, Paths.get(w, "db", "kv").toString)
    kv.set(Seq((1L, java.sql.Timestamp.valueOf("2026-06-01 00:00:00")))
      .toDF("id", "ts"))
    val e = intercept[Exception](kv.dropPartitions(cutoff))
    assert(e.getMessage.contains("pure-append"), e.getMessage)
    // guard: undeclared layout refuses
    spark.sql("CREATE TABLE pdrop.db.plain (id BIGINT) USING hadro")
    spark.sql("INSERT INTO pdrop.db.plain VALUES (1)")
    val e2 = intercept[Exception](
      Collection(spark, Paths.get(w, "db", "plain").toString).dropPartitions("5"))
    assert(e2.getMessage.contains("partition transform"), e2.getMessage)
    spark.sql("DROP TABLE pdrop.db.ev")
    spark.sql("DROP TABLE pdrop.db.kv")
    spark.sql("DROP TABLE pdrop.db.plain")
  }

  test("co-identity-partitioned collections join with zero exchanges (SPJ)") {
    val w = setupCatalog("pspj")
    spark.sql("""CREATE TABLE pspj.db.l (k BIGINT, v BIGINT)
      USING hadro PARTITIONED BY (k)""")
    spark.sql("""CREATE TABLE pspj.db.r (k BIGINT, t STRING)
      USING hadro PARTITIONED BY (k)""")
    spark.range(0, 100).select(($"id" % 5).as("k"), $"id".as("v"))
      .createOrReplaceTempView("pspj_l")
    spark.range(0, 60).select(($"id" % 5).as("k"),
      concat(lit("t"), $"id").as("t")).createOrReplaceTempView("pspj_r")
    spark.sql("INSERT INTO pspj.db.l SELECT * FROM pspj_l")
    spark.sql("INSERT INTO pspj.db.r SELECT * FROM pspj_r")
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("pspj.db.l").join(spark.table("pspj.db.r"), "k")
        .groupBy($"k").agg(count(lit(1)).as("n"))
      val got = j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // 20 left rows x 12 right rows per key
      assert(got == (0L until 5L).map(_ -> 240L).toMap, got.toString)
      // value partitions are provably single-valued (exact min==max
      // stats), so the scans report identity(k) KeyGroupedPartitioning
      // and the join plans with ZERO exchanges — the value-partitioned
      // analog of the bucket SPJ contract
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a zero-exchange identity-partitioned join plan:\n$plan")
      // a second append doubles the segments (two per value): Spark must
      // coalesce same-key partitions into one group — still exchange-free,
      // counts doubled on the left side
      spark.sql("INSERT INTO pspj.db.l SELECT * FROM pspj_l")
      val j2 = spark.table("pspj.db.l").join(spark.table("pspj.db.r"), "k")
        .groupBy($"k").agg(count(lit(1)).as("n"))
      val got2 = j2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got2 == (0L until 5L).map(_ -> 480L).toMap, got2.toString)
      val plan2 = j2.queryExecution.executedPlan.toString
      assert(!plan2.contains("Exchange"),
        s"multi-segment-per-value join must stay exchange-free:\n$plan2")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      spark.sql("DROP TABLE pspj.db.l")
      spark.sql("DROP TABLE pspj.db.r")
    }
  }

  test("over-long identity values: SPJ refuses (inexact stats), joins stay correct") {
    // identity-string values past the 64-char stats bound truncate with
    // exact=false — the scan must then NOT report KeyGroupedPartitioning
    // (a truncated bound cannot prove single-valuedness), and the join
    // falls back to ordinary exchanges with correct results. Retention
    // is equally conservative: dropPartitions keeps inexact segments.
    val w = setupCatalog("plong")
    spark.sql("""CREATE TABLE plong.db.l (k STRING, v BIGINT)
      USING hadro PARTITIONED BY (k)""")
    spark.range(0, 30).select(
        concat(lit("verylongtenantprefix_" * 4), ($"id" % 3).cast("string")).as("k"),
        $"id".as("v"))
      .createOrReplaceTempView("plong_src")
    spark.sql("INSERT INTO plong.db.l SELECT * FROM plong_src")
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = spark.table("plong.db.l").groupBy($"k").agg(count(lit(1)).as("n"))
      assert(df.collect().map(_.getLong(1)).toSeq == Seq(10L, 10L, 10L))
      // the scan must report UNKNOWN partitioning (an Exchange plans)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"inexact stats must refuse KeyGrouped reporting:\n$plan")
      // retention: inexact bounds are conservatively KEPT, never dropped
      val c = Collection(spark,
        java.nio.file.Paths.get(w, "db", "l").toString)
      assert(c.dropPartitions("zzzz") == 0,
        "truncated-stats segments must never drop on a string cutoff")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      spark.sql("DROP TABLE plong.db.l")
    }
  }

  test("transform validation fails fast at CREATE") {
    setupCatalog("pval")
    // time transform over a non-time column
    val e1 = intercept[Exception](spark.sql(
      """CREATE TABLE pval.db.bad1 (id BIGINT, s STRING)
        USING hadro PARTITIONED BY (days(s))"""))
    assert(e1.getMessage.contains("does not support"), e1.getMessage)
    // hours needs sub-day resolution
    val e2 = intercept[Exception](spark.sql(
      """CREATE TABLE pval.db.bad2 (id BIGINT, d DATE)
        USING hadro PARTITIONED BY (hours(d))"""))
    assert(e2.getMessage.contains("does not support"), e2.getMessage)
    // one declared dimension only
    val e3 = intercept[Exception](spark.sql(
      """CREATE TABLE pval.db.bad3 (id BIGINT, ts TIMESTAMP, s STRING)
        USING hadro PARTITIONED BY (days(ts), s)"""))
    assert(e3.getMessage.contains("single"), e3.getMessage)
  }

  test("hours/months/years transforms: tag math and end-to-end hourly routing") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    // tag math against java.time ground truth (timestamps are epoch µs)
    def microsOf(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    def tag(micros: Long, t: String): String =
      HadroPartition.tagOf(TimestampType,
        new GenericInternalRow(Array[Any](micros)), 0, t)
    val ts = microsOf("2026-03-05T17:30:00Z")
    assert(tag(ts, "days") == java.time.LocalDate.of(2026, 3, 5).toEpochDay.toString)
    assert(tag(ts, "hours") == (microsOf("2026-03-05T17:00:00Z") / 3600000000L).toString)
    assert(tag(ts, "months") == ((2026 - 1970) * 12 + 2).toString)
    assert(tag(ts, "years") == (2026 - 1970).toString)
    // negative epochs floor correctly (floorDiv, not integer division)
    val pre = microsOf("1969-12-31T23:00:00Z")
    assert(tag(pre, "days") == "-1" && tag(pre, "hours") == "-1")
    // date-typed sources
    def dtag(epochDay: Int, t: String): String =
      HadroPartition.tagOf(DateType,
        new GenericInternalRow(Array[Any](epochDay)), 0, t)
    val d = java.time.LocalDate.of(2026, 3, 5).toEpochDay.toInt
    assert(dtag(d, "days") == d.toString && dtag(d, "years") == "56")
    // end-to-end: an hours-partitioned table routes per hour and prunes
    val w = setupCatalog("phours")
    spark.sql("""CREATE TABLE phours.db.ev (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (hours(ts))""")
    spark.range(0, 40).select($"id",
      to_timestamp(lit("2026-03-05 10:00:00"))
        .plus(expr("make_interval(0, 0, 0, 0, CAST(id % 4 AS INT), 0, 0)")).as("ts"))
      .createOrReplaceTempView("phours_src")
    spark.sql("INSERT INTO phours.db.ev SELECT * FROM phours_src")
    val segs = CollectionMeta.currentManifest(Paths.get(w, "db", "ev")).segments
    assert(segs.length == 4 && segs.flatMap(_.partition).distinct.length == 4,
      segs.map(_.partition).toString)
    val df = spark.sql("""SELECT COUNT(*) AS n FROM phours.db.ev
      WHERE ts >= TIMESTAMP '2026-03-05 12:00:00'
        AND ts < TIMESTAMP '2026-03-05 13:00:00'""")
    assert(df.collect().head.getLong(0) == 10L)
    val m = scanNode(df).metrics
    assert(m("hadroSegmentsRead").value == 1L && m("hadroSegmentsPruned").value == 3L)
    spark.sql("DROP TABLE phours.db.ev")
    // months over a DATE column exercises the DateType V2-function
    // binding on the INSERT's clustered distribution end-to-end
    spark.sql("""CREATE TABLE phours.db.mv (id BIGINT, d DATE)
      USING hadro PARTITIONED BY (months(d))""")
    spark.range(0, 60).select($"id",
      date_add(to_date(lit("2026-01-15")), ($"id" % 3 * 31).cast("int")).as("d"))
      .createOrReplaceTempView("phours_msrc")
    spark.sql("INSERT INTO phours.db.mv SELECT * FROM phours_msrc")
    val msegs = CollectionMeta.currentManifest(Paths.get(w, "db", "mv")).segments
    assert(msegs.length == 3 && msegs.flatMap(_.partition).sorted ==
      Seq("672", "673", "674"), msegs.map(_.partition).toString)
    spark.sql("DROP TABLE phours.db.mv")
  }

  test("schema evolution preserves the partition declaration") {
    val w = setupCatalog("pevol")
    spark.sql("""CREATE TABLE pevol.db.t (id BIGINT, ts TIMESTAMP)
      USING hadro PARTITIONED BY (days(ts))""")
    val dir = Paths.get(w, "db", "t")
    val c = Collection(spark, dir.toString)
    c.addColumn("note", org.apache.spark.sql.types.StringType)
    val meta = CollectionMeta.readSchema(dir).get
    assert(meta.partitionBy.contains("ts") && meta.partitionTransform.contains("days"),
      s"evolution dropped the partition spec: $meta")
    val e = intercept[Exception](c.dropColumn("ts"))
    assert(e.getMessage.contains("partition column"), e.getMessage)
    spark.sql("DROP TABLE pevol.db.t")
  }
}
