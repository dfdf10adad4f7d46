package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** REPLACE WHERE (predicate-scoped atomic overwrite,
  * `df.writeTo(t).overwrite(cond)` / SQL
  * `INSERT OVERWRITE t PARTITION (p = v)`): whole-segment replacement
  * proven by manifest statistics — replaced segments provably inside the
  * predicate region, kept segments provably disjoint, anything
  * unclassifiable fails fast; concurrent commits into the region
  * conflict at commit time. */
class ReplaceWhereSpec extends SparkSuite {
  import spark.implicits._

  private def setupCatalog(name: String): String = {
    val w = Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[HadroCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", w)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    w
  }

  test("boundary-aligned time range replaces whole days; untouched files by reference") {
    val w = setupCatalog("rwdays")
    spark.sql("""CREATE TABLE rwdays.db.ev (id BIGINT, ts TIMESTAMP, v DOUBLE)
      USING hadro PARTITIONED BY (days(ts))""")
    spark.range(0, 200)
      .select($"id",
        to_timestamp(lit("2026-05-01 00:00:00"))
          .plus(expr("make_interval(0, 0, 0, CAST(id % 4 AS INT), 0, CAST(id AS INT), 0)")).as("ts"),
        ($"id" * 1.5).as("v"))
      .createOrReplaceTempView("rwdays_src")
    spark.sql("INSERT INTO rwdays.db.ev SELECT * FROM rwdays_src")
    val dir = Paths.get(w, "db", "ev")
    val before = CollectionMeta.currentManifest(dir)
    val byTag = before.segments.map(s => s.partition.get -> s.file).toMap
    assert(byTag.size == 4)

    // reprocess days 1-2 (v * 10) via the declarative API
    spark.sql("""SELECT id, ts, v * 10 AS v FROM rwdays_src
        WHERE id % 4 IN (1, 2)""")
      .writeTo("rwdays.db.ev")
      .overwrite($"ts" >= to_timestamp(lit("2026-05-02 00:00:00")) &&
        $"ts" < to_timestamp(lit("2026-05-04 00:00:00")))

    val after = CollectionMeta.currentManifest(dir)
    assert(after.generation == before.generation + 1, "replace bumps the generation")
    val afterByTag = after.segments.map(s => s.partition.get -> s.file).toMap
    val tags = byTag.keys.toSeq.sortBy(_.toLong)
    // untouched days 0 and 3 carried byte-identical (same files)
    assert(afterByTag(tags(0)) == byTag(tags(0)))
    assert(afterByTag(tags(3)) == byTag(tags(3)))
    // replaced days got fresh files; old ones recorded dead but deferred
    assert(afterByTag(tags(1)) != byTag(tags(1)))
    assert(Files.exists(dir.resolve(byTag(tags(1)))), "deferred GC keeps the old file one generation")
    // content: days 0/3 original, days 1/2 the reprocessed half
    val sums = spark.sql("""SELECT CAST(id % 4 AS INT) AS d,
        SUM(CAST(v AS DECIMAL(18,1))) AS s, COUNT(*) AS n
        FROM rwdays.db.ev GROUP BY 1 ORDER BY 1""")
      .collect().map(r => r.getInt(0) -> ((r.getDecimal(1).doubleValue(), r.getLong(2)))).toMap
    def base(d: Int) = (0 until 200).filter(_ % 4 == d)
    assert(sums(0) == ((base(0).map(_ * 1.5).sum, base(0).size.toLong)))
    assert(sums(3) == ((base(3).map(_ * 1.5).sum, base(3).size.toLong)))
    assert(sums(1) == ((base(1).map(_ * 15.0).sum, base(1).size.toLong)))
    assert(sums(2) == ((base(2).map(_ * 15.0).sum, base(2).size.toLong)))
    spark.sql("DROP TABLE rwdays.db.ev")
  }

  test("SQL static partition overwrite replaces exactly the named identity partition") {
    val w = setupCatalog("rwident")
    spark.sql("""CREATE TABLE rwident.db.docs (id BIGINT, region STRING, v DOUBLE)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 90)
      .select($"id", concat(lit("r"), ($"id" % 3).cast("string")).as("region"),
        ($"id" * 1.0).as("v"))
      .createOrReplaceTempView("rwident_src")
    spark.sql("INSERT INTO rwident.db.docs SELECT * FROM rwident_src")
    val dir = Paths.get(w, "db", "docs")
    val byTag = CollectionMeta.currentManifest(dir).segments
      .map(s => s.partition.get -> s.file).toMap

    // static `PARTITION (region = 'r1')`: Spark plans OverwriteByExpression
    // (region = 'r1') and fills the column — REPLACE WHERE's SQL face
    spark.sql("""INSERT OVERWRITE rwident.db.docs PARTITION (region = 'r1')
      SELECT id, v * 100 FROM rwident_src WHERE region = 'r1' AND id < 10""")

    val afterByTag = CollectionMeta.currentManifest(dir).segments
      .map(s => s.partition.get -> s.file).toMap
    assert(afterByTag("r0") == byTag("r0") && afterByTag("r2") == byTag("r2"))
    assert(afterByTag("r1") != byTag("r1"))
    val counts = spark.sql("""SELECT region, COUNT(*) AS n,
        SUM(CAST(v AS DECIMAL(18,1))) AS s
        FROM rwident.db.docs GROUP BY 1 ORDER BY 1""")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).doubleValue()))).toMap
    assert(counts("r0") == ((30L, (0 until 90).filter(_ % 3 == 0).map(_ * 1.0).sum)))
    assert(counts("r1") == ((3L, Seq(1, 4, 7).map(_ * 100.0).sum + 0.0)))
    assert(counts("r2") == ((30L, (0 until 90).filter(_ % 3 == 2).map(_ * 1.0).sum)))
    spark.sql("DROP TABLE rwident.db.docs")
  }

  test("empty input region-delete drops the region's segments atomically") {
    val w = setupCatalog("rwdel")
    spark.sql("""CREATE TABLE rwdel.db.docs (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 60)
      .select($"id", concat(lit("r"), ($"id" % 2).cast("string")).as("region"))
      .createOrReplaceTempView("rwdel_src")
    spark.sql("INSERT INTO rwdel.db.docs SELECT * FROM rwdel_src")
    spark.table("rwdel.db.docs").where(lit(false))
      .writeTo("rwdel.db.docs").overwrite($"region" === "r0")
    val left = spark.table("rwdel.db.docs").select("region").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(left == Seq("r1"), left.toString)
    assert(spark.table("rwdel.db.docs").count() == 30L)
    spark.sql("DROP TABLE rwdel.db.docs")
  }

  test("unaligned region (straddling segment) fails fast with guidance") {
    val w = setupCatalog("rwbad")
    spark.sql("CREATE TABLE rwbad.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.range(0, 100).select($"id", ($"id" * 1.0).as("v"))
      .coalesce(1).createOrReplaceTempView("rwbad_src")
    spark.sql("INSERT INTO rwbad.db.t SELECT * FROM rwbad_src")
    val e = intercept[Exception] {
      spark.range(0, 10).select($"id", lit(0.0).as("v"))
        .writeTo("rwbad.db.t").overwrite($"id" < 50)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("cannot prove segment")), e.getMessage)
    // nothing changed
    assert(spark.table("rwbad.db.t").count() == 100L)
    spark.sql("DROP TABLE rwbad.db.t")
  }

  test("nulls inside the region block the proof; an all-null segment is disjoint") {
    val w = setupCatalog("rwnull")
    // one segment carrying BOTH r0 and NULL regions: region = 'r0' must
    // not drop it (the null rows don't match the predicate)
    spark.sql("CREATE TABLE rwnull.db.t (id BIGINT, region STRING) USING hadro")
    spark.range(0, 20)
      .select($"id", when($"id" % 2 === 0, lit("r0")).otherwise(lit(null)).as("region"))
      .coalesce(1).createOrReplaceTempView("rwnull_src")
    spark.sql("INSERT INTO rwnull.db.t SELECT * FROM rwnull_src")
    val e = intercept[Exception] {
      spark.range(0, 1).select($"id", lit("r0").as("region"))
        .writeTo("rwnull.db.t").overwrite($"region" === "r0")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("cannot prove segment")), e.getMessage)
    spark.sql("DROP TABLE rwnull.db.t")
  }

  test("pure-append only: a keyed (upsertable) collection refuses") {
    val w = Files.createTempDirectory("rwkeyed").resolve("c").toString
    Collection.create(spark, w,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), key = Some("id"))
    val c = Collection(spark, w)
    c.set(Seq((1L, "a2")).toDF("id", "s"))
    // drive the v2 overwrite() path directly (SQL routes AlwaysTrue to
    // truncate, which keyed collections do allow)
    val e2 = intercept[Exception] {
      import org.apache.spark.sql.connector.expressions.Expressions
      import org.apache.spark.sql.connector.expressions.filter.Predicate
      import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwriteV2}
      import org.apache.spark.sql.util.CaseInsensitiveStringMap
      val tbl = new HadroTable(Paths.get(w),
        HadroTable.reportedSchema(CollectionMeta.readSchema(Paths.get(w)).get))
      val info = new LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
        override def queryId(): String = "rwkeyed-test"
        override def schema(): org.apache.spark.sql.types.StructType =
          spark.read.format("hadro").load(w).schema
      }
      val pred = new Predicate("=", Array(Expressions.column("id"),
        Expressions.literal(Long.box(1L))))
      tbl.newWriteBuilder(info).asInstanceOf[SupportsOverwriteV2]
        .overwrite(Array(pred)).build().toBatch
    }
    assert(e2.getMessage != null && e2.getMessage.contains("pure-append"),
      e2.getMessage)
  }

  test("concurrent append into the region conflicts at commit; outside commutes") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo, SupportsOverwriteV2}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val w = setupCatalog("rwconc")
    spark.sql("""CREATE TABLE rwconc.db.docs (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 40)
      .select($"id", concat(lit("r"), ($"id" % 2).cast("string")).as("region"))
      .createOrReplaceTempView("rwconc_src")
    spark.sql("INSERT INTO rwconc.db.docs SELECT * FROM rwconc_src")

    val cat = spark.sessionState.catalogManager.catalog("rwconc")
      .asInstanceOf[TableCatalog]
    def plannedOverwrite() = {
      val table = cat.loadTable(Identifier.of(Array("db"), "docs"))
      val info = new LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
        override def queryId(): String = "rwconc-test"
        override def schema(): org.apache.spark.sql.types.StructType =
          spark.table("rwconc.db.docs").schema
      }
      // a V2 literal must carry the INTERNAL value (UTF8String) — the
      // Expressions.literal factory stores the raw external object
      val strLit = new org.apache.spark.sql.connector.expressions.Literal[Any] {
        override def value(): Any = UTF8String.fromString("r0")
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
      }
      val pred = new Predicate("=", Array(Expressions.column("region"), strLit))
      table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
        .newWriteBuilder(info).asInstanceOf[SupportsOverwriteV2]
        .overwrite(Array(pred)).build().toBatch // region pinned HERE
    }
    def oneRow(batch: org.apache.spark.sql.connector.write.BatchWrite) = {
      val factory = batch.createBatchWriterFactory(new PhysicalWriteInfo {
        override def numPartitions(): Int = 1
      })
      val writer = factory.createWriter(0, 0L)
      writer.write(new GenericInternalRow(
        Array[Any](9999L, UTF8String.fromString("r0"))))
      writer.commit()
    }

    // concurrent append INTO the region between plan and commit: conflict
    val b1 = plannedOverwrite()
    spark.sql("INSERT INTO rwconc.db.docs VALUES (1000, 'r0')")
    val e = intercept[IllegalStateException](b1.commit(Array(oneRow(b1))))
    assert(e.getMessage.contains("REPLACE WHERE"), e.getMessage)
    assert(spark.table("rwconc.db.docs").count() == 41L, "nothing dropped on conflict")

    // concurrent append OUTSIDE the region commutes: commit succeeds
    val b2 = plannedOverwrite()
    spark.sql("INSERT INTO rwconc.db.docs VALUES (2000, 'r1')")
    b2.commit(Array(oneRow(b2)))
    val counts = spark.table("rwconc.db.docs").groupBy("region").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("r0") == 1L, s"region replaced by the single new row: $counts")
    assert(counts("r1") == 21L, s"outside region kept + concurrent append: $counts")
    spark.sql("DROP TABLE rwconc.db.docs")
  }

  test("IN-set region replaces exactly the named identity partitions") {
    val w = setupCatalog("rwin")
    spark.sql("""CREATE TABLE rwin.db.docs (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 100)
      .select($"id", concat(lit("r"), ($"id" % 5).cast("string")).as("region"))
      .createOrReplaceTempView("rwin_src")
    spark.sql("INSERT INTO rwin.db.docs SELECT * FROM rwin_src")
    val dir = Paths.get(w, "db", "docs")
    val byTag = CollectionMeta.currentManifest(dir).segments
      .map(s => s.partition.get -> s.file).toMap
    // reprocess r1 and r3 only
    spark.sql("""SELECT id + 10000 AS id, region FROM rwin_src
        WHERE region IN ('r1', 'r3') AND id < 20""")
      .writeTo("rwin.db.docs").overwrite($"region".isin("r1", "r3"))
    val afterByTag = CollectionMeta.currentManifest(dir).segments
      .map(s => s.partition.get -> s.file).toMap
    Seq("r0", "r2", "r4").foreach(t =>
      assert(afterByTag(t) == byTag(t), s"untouched $t rewritten"))
    val counts = spark.table("rwin.db.docs").groupBy("region").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("r0" -> 20L, "r1" -> 4L, "r2" -> 20L,
      "r3" -> 4L, "r4" -> 20L), counts.toString)
    spark.sql("DROP TABLE rwin.db.docs")
  }

  test("rowlevel mode: arbitrary region — inside dropped whole, straddler vectored, atomic") {
    val w = setupCatalog("rwrl")
    spark.sql("CREATE TABLE rwrl.db.t (id BIGINT, v DOUBLE) USING hadro")
    // segment A: ids 0..49 (fully inside id < 60), segment B: ids 50..99
    // (straddles the boundary)
    spark.range(0, 50).select($"id", ($"id" * 1.0).as("v")).coalesce(1)
      .createOrReplaceTempView("rwrl_a")
    spark.range(50, 100).select($"id", ($"id" * 1.0).as("v")).coalesce(1)
      .createOrReplaceTempView("rwrl_b")
    spark.sql("INSERT INTO rwrl.db.t SELECT * FROM rwrl_a")
    spark.sql("INSERT INTO rwrl.db.t SELECT * FROM rwrl_b")
    val dir = Paths.get(w, "db", "t")
    val before = CollectionMeta.currentManifest(dir)
    assert(before.segments.length == 2)
    val (fileA, fileB) = (before.segments(0).file, before.segments(1).file)
    val vBefore = before.version

    // strict mode refuses the unaligned region...
    val e = intercept[Exception] {
      spark.range(0, 5).select(($"id" + 1000).as("id"), lit(0.0).as("v"))
        .writeTo("rwrl.db.t").overwrite($"id" < 60)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("rowlevel")), "refusal must name the opt-in")

    // ...rowlevel mode vectors the straddler's matching rows exactly
    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    try spark.range(0, 5).select(($"id" + 1000).as("id"), lit(7.0).as("v"))
      .writeTo("rwrl.db.t").overwrite($"id" < 60)
    finally spark.conf.unset("spark.hadro.overwrite.mode")

    val after = CollectionMeta.currentManifest(dir)
    val files = after.segments.map(_.file)
    assert(!files.contains(fileA), "fully-inside segment dropped whole")
    val segB = after.segments.find(_.file == fileB).getOrElse(
      fail("straddling segment must keep its file"))
    assert(segB.deleteVector.isDefined && segB.dvDeletes == 10L,
      s"straddler must vector ids 50..59, got ${segB.dvDeletes}")
    assert(after.generation == before.generation + 1)

    val ids = spark.table("rwrl.db.t").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == ((60L until 100L) ++ (1000L until 1005L)).toSeq, ids.take(10).toString)
    // time travel: the pre-overwrite snapshot still reads every row
    assert(spark.read.format("hadro")
      .option("hadro.versionAsOf", vBefore.toString)
      .load(dir.toString).count() == 100L)
    spark.sql("DROP TABLE rwrl.db.t")
  }

  test("rowlevel mode: concurrent dv delete on a straddler conflicts at commit") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo, SupportsOverwriteV2}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val w = setupCatalog("rwrlc")
    spark.sql("CREATE TABLE rwrlc.db.t (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO rwrlc.db.t SELECT id, id * 1.0 FROM range(0, 100, 1, 1)")
    val cat = spark.sessionState.catalogManager.catalog("rwrlc")
      .asInstanceOf[TableCatalog]
    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    val batch = try {
      val table = cat.loadTable(Identifier.of(Array("db"), "t"))
      val info = new LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
        override def queryId(): String = "rwrlc-test"
        override def schema(): org.apache.spark.sql.types.StructType =
          spark.table("rwrlc.db.t").schema
      }
      val pred = new Predicate("<", Array(Expressions.column("id"),
        Expressions.literal(Long.box(60L))))
      table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
        .newWriteBuilder(info).asInstanceOf[SupportsOverwriteV2]
        .overwrite(Array(pred)).build().toBatch // straddler pinned HERE
    } finally spark.conf.unset("spark.hadro.overwrite.mode")

    // concurrent dv DELETE changes the straddler's vector between plan
    // and commit — replacing it with ours would resurrect those rows
    spark.conf.set("spark.hadro.delete.mode", "dv")
    try spark.sql("DELETE FROM rwrlc.db.t WHERE id >= 90 AND id < 95")
    finally spark.conf.unset("spark.hadro.delete.mode")

    val factory = batch.createBatchWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    })
    val writer = factory.createWriter(0, 0L)
    writer.write(new GenericInternalRow(Array[Any](9999L, 1.0)))
    val msg = writer.commit()
    val ex = intercept[IllegalStateException](batch.commit(Array(msg)))
    assert(ex.getMessage.contains("REPLACE WHERE"), ex.getMessage)
    // nothing replaced: 100 - 5 dv-deleted rows remain
    assert(spark.table("rwrlc.db.t").count() == 95L)
    spark.sql("DROP TABLE rwrlc.db.t")
  }

  test("multi-column AND region classifies per leaf: aligned segments replace") {
    val w = setupCatalog("rwmc")
    spark.sql("""CREATE TABLE rwmc.db.t (id BIGINT, region STRING, v DOUBLE)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 90)
      .select($"id",
        concat(lit("r"), ($"id" % 3).cast("string")).as("region"),
        ($"id" * 1.0).as("v"))
      .createOrReplaceTempView("rwmc_src")
    spark.sql("INSERT INTO rwmc.db.t SELECT * FROM rwmc_src")
    val dir = Paths.get(w, "db", "t")
    val before = CollectionMeta.currentManifest(dir)
    val untouched = before.segments.filter(_.partition.exists(_ != "r0"))
      .map(_.file).toSet
    assert(untouched.nonEmpty)

    // r0 segment: ids 0,3,...,87 — all < 100, so BOTH leaves prove inside
    // on it; r1/r2 segments disjoint on the region leaf alone.
    spark.sql("SELECT id, region, v * 10 AS v FROM rwmc_src WHERE id % 3 = 0")
      .writeTo("rwmc.db.t")
      .overwrite($"region" === "r0" && $"id" < 100)

    val after = CollectionMeta.currentManifest(dir)
    assert(untouched.subsetOf(after.segments.map(_.file).toSet),
      "disjoint-region segments carried by reference")
    val got = spark.table("rwmc.db.t")
      .groupBy($"region").agg(sum($"v").as("sv")).orderBy($"region")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val expect = (0L until 90L).groupBy(i => s"r${i % 3}")
      .map { case (rg, ids) =>
        (rg, ids.map(i => if (rg == "r0") i * 10.0 else i * 1.0).sum) }
    got.foreach { case (rg, sv) => assert(sv == expect(rg), rg) }
    spark.sql("DROP TABLE rwmc.db.t")
  }

  test("OR of regions: union drops both branches' segments, keeps the rest") {
    val w = setupCatalog("rwor")
    spark.sql("""CREATE TABLE rwor.db.t (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 30)
      .select($"id", concat(lit("r"), ($"id" % 3).cast("string")).as("region"))
      .createOrReplaceTempView("rwor_src")
    spark.sql("INSERT INTO rwor.db.t SELECT * FROM rwor_src")
    val dir = Paths.get(w, "db", "t")
    val keepFile = CollectionMeta.currentManifest(dir).segments
      .filter(_.partition.exists(_ == "r1")).map(_.file)

    spark.sql("SELECT id + 1000 AS id, region FROM rwor_src WHERE id % 3 <> 1")
      .writeTo("rwor.db.t")
      .overwrite($"region" === "r0" || $"region" === "r2")

    val after = CollectionMeta.currentManifest(dir)
    assert(keepFile.forall(after.segments.map(_.file).toSet),
      "the disjoint-from-both-branches segment survives by reference")
    assert(spark.table("rwor.db.t").where($"region" !== "r1")
      .agg(min($"id")).head.getLong(0) >= 1000L)
    assert(spark.table("rwor.db.t").where($"region" === "r1").count() == 10L)
    spark.sql("DROP TABLE rwor.db.t")
  }

  test("multi-column straddler: segment mode refuses, rowlevel vectors exactly") {
    val w = setupCatalog("rwmcrl")
    spark.sql("""CREATE TABLE rwmcrl.db.t (id BIGINT, region STRING, v DOUBLE)
      USING hadro""")
    // ONE segment mixing regions: region leaf can never prove it in/out
    spark.range(0, 40)
      .select($"id", concat(lit("r"), ($"id" % 2).cast("string")).as("region"),
        ($"id" * 1.0).as("v"))
      .coalesce(1).createOrReplaceTempView("rwmcrl_src")
    spark.sql("INSERT INTO rwmcrl.db.t SELECT * FROM rwmcrl_src")
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM rwmcrl_src WHERE 1 = 0")
        .writeTo("rwmcrl.db.t")
        .overwrite($"region" === "r0" && $"id" < 20)
    }
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("rowlevel")), e.getMessage)

    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    try spark.sql(
      "SELECT id, region, v + 0.5 AS v FROM rwmcrl_src WHERE id % 2 = 0 AND id < 20")
      .writeTo("rwmcrl.db.t")
      .overwrite($"region" === "r0" && $"id" < 20)
    finally spark.conf.unset("spark.hadro.overwrite.mode")
    // even ids < 20 (region r0 ∧ id<20) replaced with v+0.5; all else intact
    val rows = spark.table("rwmcrl.db.t").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length == 40)
    rows.foreach { case (id, v) =>
      val expect = if (id % 2 == 0 && id < 20) id + 0.5 else id * 1.0
      assert(v == expect, s"id=$id")
    }
    spark.sql("DROP TABLE rwmcrl.db.t")
  }

  test("stats-opaque predicate (contains): segment mode refuses, rowlevel exact") {
    val w = setupCatalog("rwop")
    spark.sql("CREATE TABLE rwop.db.t (id BIGINT, name STRING) USING hadro")
    spark.range(0, 20)
      .select($"id", concat(lit("u"), ($"id" % 4).cast("string"), lit("-x")).as("name"))
      .coalesce(1).createOrReplaceTempView("rwop_src")
    spark.sql("INSERT INTO rwop.db.t SELECT * FROM rwop_src")
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM rwop_src WHERE 1 = 0")
        .writeTo("rwop.db.t").overwrite($"name".contains("u1"))
    }
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("no manifest-stats proof")), e.getMessage)

    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    try spark.sql("SELECT id, 'fresh' AS name FROM rwop_src WHERE id % 4 = 1")
      .writeTo("rwop.db.t").overwrite($"name".contains("u1"))
    finally spark.conf.unset("spark.hadro.overwrite.mode")
    assert(spark.table("rwop.db.t").where($"name" === "fresh").count() == 5L)
    assert(spark.table("rwop.db.t").where($"name".contains("u1")).count() == 0L)
    assert(spark.table("rwop.db.t").count() == 20L)
    spark.sql("DROP TABLE rwop.db.t")
  }

  test("startsWith region proves whole prefix-clustered segments in segment mode") {
    val w = setupCatalog("rwpre")
    spark.sql("CREATE TABLE rwpre.db.t (id BIGINT, src STRING) USING hadro")
    // two prefix-homogeneous segments
    spark.range(0, 10).select($"id", concat(lit("web-"), $"id".cast("string")).as("src"))
      .coalesce(1).createOrReplaceTempView("rwpre_a")
    spark.range(10, 20).select($"id", concat(lit("wiki-"), $"id".cast("string")).as("src"))
      .coalesce(1).createOrReplaceTempView("rwpre_b")
    spark.sql("INSERT INTO rwpre.db.t SELECT * FROM rwpre_a")
    spark.sql("INSERT INTO rwpre.db.t SELECT * FROM rwpre_b")
    val dir = Paths.get(w, "db", "t")
    val wikiFile = CollectionMeta.currentManifest(dir).segments
      .filter(_.stats.get("src").exists(_.min.exists(_.startsWith("wiki")))).map(_.file)
    assert(wikiFile.length == 1)

    // default SEGMENT mode: 'web-' segment provably inside [web-, web.),
    // 'wiki-' segment provably disjoint — no rowlevel opt-in needed
    spark.sql("SELECT id + 100 AS id, concat('web-', id) AS src FROM rwpre_a")
      .writeTo("rwpre.db.t").overwrite($"src".startsWith("web-"))

    val after = CollectionMeta.currentManifest(dir)
    assert(wikiFile.forall(after.segments.map(_.file).toSet),
      "disjoint prefix segment carried by reference")
    assert(spark.table("rwpre.db.t").where($"src".startsWith("web-"))
      .agg(min($"id")).head.getLong(0) >= 100L)
    assert(spark.table("rwpre.db.t").where($"src".startsWith("wiki-")).count() == 10L)
    spark.sql("DROP TABLE rwpre.db.t")
  }

  test("NOT region: negation keeps the matched segment, replaces the null-free rest") {
    val w = setupCatalog("rwnot")
    spark.sql("""CREATE TABLE rwnot.db.t (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.range(0, 30)
      .select($"id", concat(lit("r"), ($"id" % 3).cast("string")).as("region"))
      .createOrReplaceTempView("rwnot_src")
    spark.sql("INSERT INTO rwnot.db.t SELECT * FROM rwnot_src")
    val dir = Paths.get(w, "db", "t")
    val r0File = CollectionMeta.currentManifest(dir).segments
      .filter(_.partition.exists(_ == "r0")).map(_.file)

    // NOT(region = 'r0'): r0 segment inner-Inside -> Disjoint (kept);
    // r1/r2 inner-Disjoint + null-free -> Inside (replaced) — segment mode
    spark.sql("SELECT id + 500 AS id, region FROM rwnot_src WHERE id % 3 <> 0")
      .writeTo("rwnot.db.t").overwrite(!($"region" === "r0"))

    val after = CollectionMeta.currentManifest(dir)
    assert(r0File.forall(after.segments.map(_.file).toSet),
      "negated-region segment survives by reference")
    assert(spark.table("rwnot.db.t").where($"region" === "r0").count() == 10L)
    assert(spark.table("rwnot.db.t").where($"region" !== "r0")
      .agg(min($"id")).head.getLong(0) >= 500L)
    spark.sql("DROP TABLE rwnot.db.t")
  }

  test("keyed-but-never-mutated collection replaces under row-bag semantics") {
    // plain appends never flip `mutated`, so the collection scans
    // UNRESOLVED (both copies of a twice-appended key are live rows);
    // REPLACE WHERE is then a plain row-predicate delete + append — it
    // removes exactly the matching rows, duplicates included, and the
    // region proof needs no LWW reasoning
    val w = Files.createTempDirectory("rwkeyed2").resolve("c").toString
    Seq((1L, "v1"), (2L, "v1")).toDF("id", "s").coalesce(1)
      .write.format("hadro").mode("overwrite").option("hadro.key", "id").save(w)
    Seq((1L, "v2")).toDF("id", "s").coalesce(1)
      .write.format("hadro").mode("append").save(w)
    assert(!CollectionMeta.currentManifest(Paths.get(w)).mutated)
    assert(spark.read.format("hadro").load(w).where($"id" === 1L).count() == 2L)

    // region = the second segment exactly (it holds only the id=1 dupe)
    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    try Seq((9L, "x")).toDF("id", "s")
      .write.format("hadro").mode("overwrite")
      .option("hadro.replaceWhere", "s = 'v2'").save(w)
    finally spark.conf.unset("spark.hadro.overwrite.mode")
    val got = spark.read.format("hadro").load(w).orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "v1"), (2L, "v1"), (9L, "x")), got.mkString(","))
  }

  test("hadro.replaceWhere option scopes a path-based overwrite (no catalog)") {
    val dir = Files.createTempDirectory("rwopt").resolve("c").toString
    // two aligned segments: ids 0..49 and 50..99
    spark.range(0, 50).select($"id", ($"id" * 1.0).as("v")).coalesce(1)
      .write.format("hadro").mode("overwrite").save(dir)
    spark.range(50, 100).select($"id", ($"id" * 1.0).as("v")).coalesce(1)
      .write.format("hadro").mode("append").save(dir)
    val before = CollectionMeta.currentManifest(Paths.get(dir))
    assert(before.segments.length == 2)
    val keptFile = before.segments.head.file

    spark.range(50, 100).select($"id", ($"id" + 0.25).as("v")).coalesce(1)
      .write.format("hadro").mode("overwrite")
      .option("hadro.replaceWhere", "id >= 50").save(dir)

    val after = CollectionMeta.currentManifest(Paths.get(dir))
    assert(after.segments.map(_.file).contains(keptFile),
      "disjoint segment carried by reference")
    val got = spark.read.format("hadro").load(dir).orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 100)
    got.foreach { case (id, v) =>
      assert(v == (if (id >= 50) id + 0.25 else id * 1.0), s"id=$id") }

    // append mode cannot be region-scoped
    val e = intercept[Exception] {
      spark.range(0, 1).select($"id", lit(0.0).as("v"))
        .write.format("hadro").mode("append")
        .option("hadro.replaceWhere", "id >= 50").save(dir)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("requires mode")), e.getMessage)

    // a literal the column type cannot represent fails loudly, never a
    // silently-empty region
    val e2 = intercept[Exception] {
      spark.range(0, 1).select($"id", lit(0.0).as("v"))
        .write.format("hadro").mode("overwrite")
        .option("hadro.replaceWhere", "id >= 'notanumber'").save(dir)
    }
    assert(chain(e2).exists(c => c.getMessage != null &&
      (c.getMessage.contains("does not convert") ||
        c.getMessage.contains("not a supported overwrite predicate"))),
      e2.getMessage)
  }

  test("hadro.replaceWhere option: timestamp casts + rowlevel straddler") {
    val dir = Files.createTempDirectory("rwoptts").resolve("c").toString
    spark.range(0, 48)
      .select($"id",
        to_timestamp(lit("2026-06-01 00:00:00"))
          .plus(expr("make_interval(0,0,0,0, CAST(id AS INT), 0, 0)")).as("ts"),
        ($"id" * 1.0).as("v"))
      .coalesce(1).write.format("hadro").mode("overwrite").save(dir)

    spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
    try spark.range(24, 30)
      .select($"id",
        to_timestamp(lit("2026-06-01 00:00:00"))
          .plus(expr("make_interval(0,0,0,0, CAST(id AS INT), 0, 0)")).as("ts"),
        lit(9.0).as("v"))
      .write.format("hadro").mode("overwrite")
      .option("hadro.replaceWhere",
        "ts >= TIMESTAMP '2026-06-02 00:00:00' AND id < 30").save(dir)
    finally spark.conf.unset("spark.hadro.overwrite.mode")

    val got = spark.read.format("hadro").load(dir).orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length == 48)
    got.foreach { case (id, v) =>
      // region = hours 24..29: replaced with v = 9.0
      assert(v == (if (id >= 24 && id < 30) 9.0 else id * 1.0), s"id=$id") }
  }

  test("prefixSuccessor byte edges: increment, 0xFF truncation, all-0xFF tail") {
    import org.apache.spark.unsafe.types.UTF8String
    def succ(b: Array[Byte]): Option[Array[Byte]] =
      HadroReplaceWhere.prefixSuccessor(UTF8String.fromBytes(b)).map(_.getBytes)
    assert(succ("web-".getBytes("UTF-8")).map(new String(_, "ISO-8859-1"))
      .contains("web."))
    // last byte 0xFF: increment the PREVIOUS byte and truncate
    assert(succ(Array('a'.toByte, 0xFF.toByte)).map(_.toSeq)
      .contains(Seq('b'.toByte)))
    // all-0xFF prefix: no successor — the prefix set is the >= tail
    assert(succ(Array(0xFF.toByte, 0xFF.toByte)).isEmpty)
    // multi-byte UTF-8 prefix increments its final byte
    val snow = "☃".getBytes("UTF-8") // e2 98 83
    assert(succ(snow).map(_.toSeq)
      .contains(Seq(0xE2.toByte, 0x98.toByte, 0x84.toByte)))
  }

  test("parseCondition covers IN / IS NULL / <=> / boolean literals") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.sources
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("region", StringType)))
    def p(cond: String) = HadroReplaceWhere.parseCondition(cond, schema)
    assert(p("region IN ('r0', 'r1')") ==
      Seq(sources.In("region", Array[Any]("r0", "r1"))))
    assert(p("region IS NULL") == Seq(sources.IsNull("region")))
    assert(p("region <=> 'r0'") == Seq(sources.EqualNullSafe("region", "r0")))
    assert(p("NOT (id < 5 OR id > 10)") == Seq(sources.Not(
      sources.Or(sources.LessThan("id", 5L), sources.GreaterThan("id", 10L)))))
    assert(p("true") == Seq(sources.AlwaysTrue))
    // LIKE: affix-only patterns map to the affix filters
    assert(p("region LIKE 'ab%'") == Seq(sources.StringStartsWith("region", "ab")))
    assert(p("region LIKE '%ab'") == Seq(sources.StringEndsWith("region", "ab")))
    assert(p("region LIKE '%ab%'") == Seq(sources.StringContains("region", "ab")))
    assert(p("region LIKE 'ab'") == Seq(sources.EqualTo("region", "ab")))
    val eLike = intercept[IllegalArgumentException](p("region LIKE 'a%b'"))
    assert(eLike.getMessage.contains("interior wildcards"))
    val e = intercept[IllegalArgumentException](p("id % 2 = 0"))
    assert(e.getMessage.contains("not a supported overwrite predicate"))
    val e2 = intercept[IllegalArgumentException](p("missing_col = 1"))
    assert(e2.getMessage.contains("not in collection schema"))
  }

  test("rowlevel vector build scans ONLY straddling segments (scan metrics)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.util.QueryExecutionListener
    val w = setupCatalog("rwmet")
    spark.sql("""CREATE TABLE rwmet.db.ev (id BIGINT, ts TIMESTAMP, v DOUBLE)
      USING hadro PARTITIONED BY (days(ts))""")
    spark.range(0, 144)
      .select($"id",
        to_timestamp(lit("2026-07-01 00:00:00"))
          .plus(expr("make_interval(0,0,0,0, CAST(id AS INT), 0, 0)")).as("ts"),
        ($"id" * 1.0).as("v"))
      .createOrReplaceTempView("rwmet_src")
    spark.sql("INSERT INTO rwmet.db.ev SELECT * FROM rwmet_src")
    val dir = Paths.get(w, "db", "ev")
    assert(CollectionMeta.currentManifest(dir).segments.length == 6) // 6 days

    // region = day-1 noon .. day-2 noon: straddles exactly days 1 and 2;
    // days 0, 3, 4, 5 are provably disjoint and must never be scanned
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val seen = scala.collection.mutable.Buffer.empty[Long]
    val listener = new QueryExecutionListener {
      override def onSuccess(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        walk(qe.executedPlan).foreach {
          case b: BatchScanExec if b.metrics.contains("hadroSegmentsRead") =>
            seen.synchronized { seen += b.metrics("hadroSegmentsRead").value }
          case _ => ()
        }
      override def onFailure(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.conf.set("spark.hadro.overwrite.mode", "rowlevel")
      try spark.sql("""SELECT id, ts, v * 10 AS v FROM rwmet_src
          WHERE ts >= TIMESTAMP '2026-07-02 12:00:00'
            AND ts < TIMESTAMP '2026-07-03 12:00:00'""")
        .writeTo("rwmet.db.ev")
        .overwrite($"ts" >= lit("2026-07-02 12:00:00").cast("timestamp")
          && $"ts" < lit("2026-07-03 12:00:00").cast("timestamp"))
      finally spark.conf.unset("spark.hadro.overwrite.mode")
      // the listener bus is async — poll for the DV-build execution
      val deadline = System.nanoTime() + 10e9.toLong
      while (seen.synchronized(!seen.contains(2L)) && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)
    val reads = seen.synchronized(seen.toList)
    assert(reads.contains(2L),
      s"DV build must scan exactly the 2 straddlers, saw $reads")
    assert(!reads.exists(_ > 2L),
      s"no hadro scan during the overwrite may read disjoint days, saw $reads")
    // correctness of the replace itself
    val got = spark.table("rwmet.db.ev").agg(sum($"v")).head.getDouble(0)
    val expect = (0 until 144).map { i =>
      if (i >= 36 && i < 60) i * 10.0 else i * 1.0 }.sum
    assert(got == expect)
    spark.sql("DROP TABLE rwmet.db.ev")
  }

  test("untranslatable predicate still fails with guidance in both modes") {
    val w = setupCatalog("rwcomp")
    spark.sql("""CREATE TABLE rwcomp.db.t (id BIGINT, region STRING)
      USING hadro PARTITIONED BY (region)""")
    spark.sql("INSERT INTO rwcomp.db.t VALUES (1, 'r0'), (2, 'r1')")
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    for (mode <- Seq("segment", "rowlevel")) {
      spark.conf.set("spark.hadro.overwrite.mode", mode)
      try {
        val e = intercept[Exception] {
          spark.table("rwcomp.db.t").where(lit(false))
            .writeTo("rwcomp.db.t")
            .overwrite($"id" % 2 === 0)
        }
        assert(chain(e).exists(c => c.getMessage != null &&
          (c.getMessage.contains("does not translate") ||
            c.getMessage.contains("Table does not support overwrite by expression") ||
            c.getMessage.contains("cannot be represented"))), s"$mode: ${e.getMessage}")
      } finally spark.conf.unset("spark.hadro.overwrite.mode")
    }
    spark.sql("DROP TABLE rwcomp.db.t")
  }
}
