package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Additive schema evolution: ADD COLUMN (nullable) widens the collection
  * schema without rewriting data. Segments record their write-time field
  * count in the manifest; readers decode old segments with the write-time
  * prefix schema and null-fill appended columns, on both the row and the
  * columnar path. */
class EvolutionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"evo_$name").resolve("c").toString

  test("added column is null for old rows, populated for new writes") {
    val path = tmp("basic")
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = Collection.create(spark, path, src, numSegments = 3)
    c.addColumn("category", StringType)
    c.append(src.withColumn("n_nationkey", $"n_nationkey" + 100)
      .withColumn("category", concat(lit("cat_"), $"n_regionkey".cast("string"))))

    val back = spark.read.format("hadro").load(path)
    assert(back.schema.fieldNames.contains("category"))
    assert(back.count() == src.count() * 2)
    assert(back.filter($"n_nationkey" < 100 && $"category".isNull).count() == src.count())
    assert(back.filter($"n_nationkey" >= 100 && $"category".startsWith("cat_")).count() == src.count())
    // columnar path still engages on the flat schema (old + new segments mixed)
    back.collect()
    assert(back.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
  }

  test("evolution across the 8-field null-bitmap boundary decodes byte-exactly") {
    // 8 fields = 1 bitmap byte; the 9th pushes the bitmap to 2 bytes. Old
    // records must decode with the 1-byte write-time bitmap, not the new one.
    val path = tmp("bitmap")
    val cols = (1 to 8).map(i => s"c$i")
    val row8 = spark.range(0, 50).select(
      (col("id") +: cols.tail.map(n => (col("id") * 10 + lit(n.drop(1).toInt)).as(n))): _*)
      .withColumnRenamed("id", "c1")
    val c = Collection.create(spark, path, row8, numSegments = 2)
    c.addColumn("c9", LongType)
    c.append(row8.withColumn("c1", $"c1" + 1000).withColumn("c9", lit(99L)))

    val back = spark.read.format("hadro").load(path)
    assert(back.count() == 100)
    assert(back.filter($"c1" < 1000).agg(sum($"c2")).head().getLong(0) ==
      row8.agg(sum($"c2")).head().getLong(0))
    assert(back.filter($"c1" < 1000 && $"c9".isNull).count() == 50)
    assert(back.filter($"c1" >= 1000 && $"c9" === 99L).count() == 50)
  }

  test("keyed collections: point lookups and LWW survive evolution") {
    val path = tmp("keyed")
    val src = Seq.tabulate(200)(i => (i.toLong, s"v$i")).toDF("k", "v")
    val c = Collection.create(spark, path, src, key = Some("k"), numSegments = 4)
    c.addColumn("note", StringType)
    // upsert some keys WITH the new column (offset-index + bloom paths must
    // handle mixed-width segments)
    c.set(Seq((5L, "v5_new", "updated"), (300L, "fresh", "born-wide"))
      .toDF("k", "v", "note"))
    assert(c.get(5L).select($"v", $"note").as[(String, String)].head() == ("v5_new", "updated"))
    assert(c.get(7L).select($"v").as[String].head() == "v7")
    assert(c.get(7L).select($"note").head().isNullAt(0))
    assert(c.get(300L).select($"note").as[String].head() == "born-wide")
    assert(c.count() == 201)
  }

  test("addColumn validates: duplicates rejected, data never rewritten") {
    val path = tmp("validate")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    val c = Collection.create(spark, path, src)
    val filesBefore = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
      .segments.map(_.file).toSet
    intercept[IllegalArgumentException](c.addColumn("r_name", StringType))
    c.addColumn("extra", DoubleType)
    val after = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(after.segments.map(_.file).toSet == filesBefore, "evolution must not rewrite data")
    assert(spark.read.format("hadro").load(path).filter($"extra".isNull).count() == src.count())
  }

  test("compact() after evolution rewrites every row at full width") {
    val path = tmp("compact")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    val c = Collection.create(spark, path, src, numSegments = 2)
    c.addColumn("extra", LongType)
    c.append(src.limit(2).withColumn("r_regionkey", $"r_regionkey" + 50)
      .withColumn("extra", lit(7L)))
    c.compact()
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    val fullWidth = src.schema.length + 1 // original cols + extra
    assert(m.segments.forall(_.nFields.contains(fullWidth)),
      s"post-compaction widths: ${m.segments.map(_.nFields)}, want $fullWidth")
    val back = spark.read.format("hadro").load(path)
    assert(back.count() == 7)
    assert(back.filter($"extra" === 7L).count() == 2)
  }

  test("named index over a post-evolution column stays conservative on old segments") {
    val path = tmp("index")
    val src = Seq.tabulate(100)(i => (i.toLong, s"n$i")).toDF("id", "nm")
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.addColumn("tag", StringType)
    c.append(Seq((500L, "n500", "gold")).toDF("id", "nm", "tag"))
    c.indexes.add("by_tag", Seq("tag"))
    // old segments hold only nulls for tag; the probe must still find the
    // one real match and must NOT drop rows from old segments on other queries
    assert(c.where($"tag" === "gold").count() == 1)
    assert(c.where($"tag".isNull).count() == 100)
    assert(spark.read.format("hadro").load(path).count() == 101)
  }

  test("SQL ALTER TABLE ADD COLUMN evolves catalog tables in place") {
    val wh = Files.createTempDirectory("evo_cat").toString
    spark.conf.set("spark.sql.catalog.evocat", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.evocat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS evocat.db")
      spark.sql("CREATE TABLE evocat.db.t (id BIGINT, v STRING) USING hadro")
      spark.sql("INSERT INTO evocat.db.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("ALTER TABLE evocat.db.t ADD COLUMN score DOUBLE")
      spark.sql("INSERT INTO evocat.db.t VALUES (3, 'c', 1.5)")
      val rows = spark.sql(
        "SELECT id, v, score FROM evocat.db.t ORDER BY id").collect()
      assert(rows.length == 3)
      assert(rows(0).isNullAt(2) && rows(1).isNullAt(2))
      assert(rows(2).getDouble(2) == 1.5)
      // type changes still need a rewrite
      intercept[Exception](
        spark.sql("ALTER TABLE evocat.db.t ALTER COLUMN v TYPE BIGINT"))
      // rename + drop are metadata-only and in-place
      spark.sql("ALTER TABLE evocat.db.t RENAME COLUMN v TO label")
      spark.sql("ALTER TABLE evocat.db.t DROP COLUMN score")
      val after = spark.sql("SELECT id, label FROM evocat.db.t ORDER BY id").collect()
      assert(after.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
      assert(!spark.table("evocat.db.t").schema.fieldNames.contains("score"))
    } finally {
      spark.conf.unset("spark.sql.catalog.evocat")
      spark.conf.unset("spark.sql.catalog.evocat.warehouse")
    }
  }

  test("renamed column keeps data, key semantics, and stats pruning") {
    val path = tmp("rename")
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .repartitionByRange(8, $"c_custkey")
    val c = Collection.create(spark, path, src)
    c.renameColumn("c_acctbal", "balance")

    val back = spark.read.format("hadro").load(path)
    assert(back.schema.fieldNames.toSeq == Seq("c_custkey", "c_name", "balance"))
    assert(back.agg(sum($"balance")).head().getDouble(0) ==
      src.agg(sum($"c_acctbal")).head().getDouble(0))
    // stats were remapped in the manifest: a point filter on the RENAMED
    // range-clustered key still prunes segments
    c.renameColumn("c_custkey", "ckey")
    val df = spark.read.format("hadro").load(path).filter($"ckey" === 42L)
    df.collect()
    val node = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }.get
    assert(node.metrics("hadroSegmentsRead").value == 1L,
      s"rename must keep pruning: read ${node.metrics("hadroSegmentsRead").value} of 8")
    // duplicate/reserved names rejected
    intercept[Exception](c.renameColumn("c_name", "balance"))
    intercept[Exception](c.renameColumn("c_name", "_hadro_seq"))
  }

  test("dropped column disappears; re-added name starts fresh with nulls") {
    val path = tmp("drop")
    val rows = spark.range(0, 60)
      .select($"id", concat(lit("n"), $"id").as("name"),
        ($"id" * 2).cast("double").as("score"), ($"id" % 5).as("grp"))
    val c = Collection.create(spark, path, rows, numSegments = 3)
    c.dropColumn("score")

    val back = spark.read.format("hadro").load(path)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "grp"))
    // remaining columns decode correctly around the skipped physical slot
    assert(back.agg(sum($"grp")).head().getLong(0) ==
      rows.agg(sum($"grp")).head().getLong(0))
    assert(back.filter($"name" === "n7").select($"id").head().getLong(0) == 7L)
    // new writes omit the dropped column
    c.append(spark.range(1000, 1030)
      .select($"id", concat(lit("n"), $"id").as("name"), ($"id" % 5).as("grp")))
    assert(spark.read.format("hadro").load(path).count() == 90)
    // re-adding the NAME creates a fresh physical column: old rows are
    // null — dropped doubles can never resurrect into the new long column
    c.addColumn("score", LongType)
    c.append(spark.range(2000, 2010)
      .select($"id", concat(lit("n"), $"id").as("name"), ($"id" % 5).as("grp"),
        lit(7L).as("score")))
    val again = spark.read.format("hadro").load(path)
    assert(again.filter($"id" < 2000 && $"score".isNotNull).count() == 0)
    assert(again.filter($"score" === 7L).count() == 10)
  }

  test("drop guards: key, bucket, indexed, and last columns are protected") {
    val path = tmp("dropguard")
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = Collection.create(spark, path, src, key = Some("n_nationkey"))
    intercept[Exception](c.dropColumn("n_nationkey")) // key
    c.indexes.add("byname", Seq("n_name"))
    intercept[Exception](c.dropColumn("n_name")) // indexed
    c.indexes.remove("byname")
    c.dropColumn("n_name") // now allowed
    assert(!spark.read.format("hadro").load(path).schema.fieldNames.contains("n_name"))
  }

  test("widenColumn reads narrow + wide segments as one table, metadata-only") {
    val path = tmp("widen")
    val src = spark.range(0, 100)
      .select($"id", ($"id" % 7).cast("int").as("n"),
        ($"id" * 1.5).cast("float").as("f"),
        ($"id" * 0.25).cast("decimal(10,2)").as("d"))
    val c = Collection.create(spark, path, src, numSegments = 3)
    val filesBefore = CollectionMeta.currentManifest(
      java.nio.file.Paths.get(path)).segments.map(_.file)

    c.widenColumn("n", LongType)
    c.widenColumn("f", DoubleType)
    c.widenColumn("d", DecimalType(14, 4))
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.segments.map(_.file) == filesBefore, "widening must not rewrite data")
    assert(m.segments.forall(_.writeTypes.size == 3))

    c.append(spark.range(100, 110)
      .select($"id", ($"id" % 7).as("n"), ($"id" * 1.5).as("f"),
        ($"id" * 0.25).cast("decimal(14,4)").as("d")))
    val back = spark.read.format("hadro").load(path)
    assert(back.schema("n").dataType == LongType)
    assert(back.schema("f").dataType == DoubleType)
    assert(back.schema("d").dataType == DecimalType(14, 4))
    val out = back.orderBy($"id").collect()
    assert(out.length == 110)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id % 7)
      assert(r.getDouble(2) == (id * 1.5f).toFloat.toDouble || id >= 100)
      assert(r.getDecimal(3).compareTo(new java.math.BigDecimal(id * 0.25)
        .setScale(4, java.math.RoundingMode.HALF_UP)) == 0)
      if (id >= 100) assert(r.getDouble(2) == id * 1.5)
    }
    // filters over the widened column still prune/evaluate correctly
    assert(back.filter($"n" === 3L).count() == out.count(_.getLong(1) == 3L))
  }

  test("ADD COLUMN DEFAULT back-fills old rows on both reader paths") {
    val path = tmp("default")
    val src = spark.range(0, 40).select($"id", ($"id" * 2).as("v"))
    val c = Collection.create(spark, path, src, numSegments = 2)
    c.addColumn("tag", StringType, default = Some("'legacy'"))
    c.append(spark.range(40, 50).select($"id", ($"id" * 2).as("v"),
      when($"id" % 2 === 0, lit("fresh")).as("tag")))

    val back = spark.read.format("hadro").load(path)
    // columnar path (flat schema, no metadata columns)
    val rows = back.orderBy($"id").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id < 40) assert(r.getString(2) == "legacy", s"row $id must back-fill")
      else if (id % 2 == 0) assert(r.getString(2) == "fresh")
      else assert(r.isNullAt(2), "explicit null stays null — no default rewrite")
    }
    // row path (metadata column request disables vectorization)
    val viaRow = back.select($"id", $"tag", col("_hadro_seq"))
      .filter($"id" < 40).collect()
    assert(viaRow.forall(_.getString(1) == "legacy"))
    // filters evaluate over the FILLED value
    assert(back.filter($"tag" === "legacy").count() == 40)
    assert(back.filter($"tag".isNull).count() == 5)
    // min/max/count agg pushdown folds the default for pre-column segments
    val agg = back.agg(count($"tag"), min($"tag"), max($"tag")).head()
    assert(agg.getLong(0) == 45) // 40 back-filled + 5 explicit
    assert(agg.getString(1) == "fresh")
    assert(agg.getString(2) == "legacy")
    // a plain added column (no default) still null-fills
    c.addColumn("extra", IntegerType)
    assert(spark.read.format("hadro").load(path)
      .filter($"extra".isNull).count() == 50)
    // invalid defaults are rejected at ALTER time
    intercept[IllegalArgumentException](
      c.addColumn("bad", IntegerType, default = Some("'not-an-int'")))
    intercept[IllegalArgumentException](
      c.addColumn("bad2", IntegerType, default = Some("id + 1")))
  }

  test("restoreVersion across a widen keeps narrow segments decodable") {
    val path = tmp("restore_widen")
    val src = spark.range(0, 50)
      .select($"id", ($"id" % 5).cast("int").as("n"))
    val c = Collection.create(spark, path, src, numSegments = 2)
    val v1 = c.version
    c.widenColumn("n", LongType)
    c.append(spark.range(50, 60).select($"id", ($"id" % 5).as("n")))
    // rewind past the append — but NOT past the widen's physical truth:
    // the restored segments' bytes are int-encoded while the schema stays
    // long, so the write-time types recorded by the (undone) widen commit
    // must ride forward into the restored manifest or decode corrupts.
    c.restoreVersion(v1)
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.segments.forall(_.writeTypes.nonEmpty),
      "later widen's write-time types must merge into the restored manifest")
    val back = spark.read.format("hadro").load(path)
    assert(back.schema("n").dataType == LongType, "schema is not rolled back")
    val out = back.orderBy($"id").collect()
    assert(out.length == 50, "the post-widen append must be gone")
    out.foreach(r => assert(r.getLong(1) == r.getLong(0) % 5))
  }

  test("widen guards: narrowing, key, bucket, and indexed columns rejected") {
    val path = tmp("widenguard")
    val src = spark.range(0, 20)
      .select($"id".cast("int").as("id"), ($"id" % 3).cast("int").as("b"),
        ($"id" % 5).cast("int").as("x"), $"id".cast("float").as("f"))
    val c = Collection.create(spark, path, src, key = Some("id"))
    intercept[Exception](c.widenColumn("f", IntegerType)) // not a widening
    intercept[Exception](c.widenColumn("x", FloatType)) // int->float loses 2^24+
    intercept[Exception](c.widenColumn("id", LongType)) // key
    c.indexes.add("byx", Seq("x"))
    intercept[Exception](c.widenColumn("x", LongType)) // indexed
    c.indexes.remove("byx")
    c.widenColumn("x", LongType) // now allowed
    assert(spark.read.format("hadro").load(path).schema("x").dataType == LongType)
    // decimal: scale-up that can't hold the integer part is rejected
    val p2 = tmp("widenguard2")
    val c2 = Collection.create(spark, p2,
      spark.range(0, 5).select($"id", $"id".cast("decimal(10,2)").as("d")))
    intercept[Exception](c2.widenColumn("d", DecimalType(10, 4)))
    c2.widenColumn("d", DecimalType(12, 4))
  }

  test("widen then compact restores the columnar path at the wide type") {
    val path = tmp("widencompact")
    val src = spark.range(0, 50).select($"id", ($"id" % 9).cast("int").as("n"))
    val c = Collection.create(spark, path, src, numSegments = 2)
    c.widenColumn("n", LongType)
    // widened segments force the row path (uniform per scan)
    val before = spark.read.format("hadro").load(path)
    before.collect()
    assert(!before.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    c.compact()
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.segments.forall(_.writeTypes.isEmpty),
      "compaction re-encodes at the current type and clears writeTypes")
    val after = spark.read.format("hadro").load(path)
    assert(after.orderBy($"id").select(sum($"n")).head().getLong(0) ==
      (0L until 50L).map(_ % 9).sum)
    after.collect()
    assert(after.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
  }

  test("filters pruning every widened segment keep the columnar path") {
    // widened OLD segments + unwidened NEW segments with disjoint id
    // ranges: a filter selecting only new rows prunes the widened segments
    // via manifest stats, so the scan stays vectorized; scans that may
    // touch widened bytes drop to the row reader (uniform per scan) and
    // still read the mixed table correctly.
    val path = tmp("widenprune")
    val src = spark.range(0, 40).select($"id", ($"id" % 9).cast("int").as("n"))
    val c = Collection.create(spark, path, src, numSegments = 2)
    c.widenColumn("n", LongType)
    c.append(spark.range(1000, 1040).select($"id", ($"id" % 9).as("n")))

    val back = spark.read.format("hadro").load(path)
    // mixed scan: row reader, values correct across narrow + wide segments
    val all = back.orderBy($"id").collect()
    assert(all.length == 80)
    all.foreach(r => assert(r.getLong(1) == r.getLong(0) % 9))
    assert(!back.queryExecution.executedPlan.toString.contains("ColumnarToRow"))

    // id >= 1000 prunes both widened segments -> columnar plan, same rows
    val fresh = back.filter($"id" >= 1000L)
    assert(fresh.count() == 40)
    fresh.collect()
    assert(fresh.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a plan that cannot touch widened segments must stay vectorized")

    // a filter over the widened range keeps the row path and stays correct
    val old = back.filter($"id" < 40L)
    old.collect()
    assert(!old.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(old.count() == 40)
  }

  test("SQL ALTER TABLE ALTER COLUMN TYPE widens catalog tables in place") {
    val wh = Files.createTempDirectory("evo_sqlwiden").toString
    spark.conf.set("spark.sql.catalog.evo_w", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo_w.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo_w.db")
    spark.sql("CREATE TABLE evo_w.db.t (id BIGINT, n INT) USING hadro")
    spark.sql("INSERT INTO evo_w.db.t SELECT id, CAST(id % 10 AS INT) FROM range(0, 30)")
    spark.sql("ALTER TABLE evo_w.db.t ALTER COLUMN n TYPE BIGINT")
    assert(spark.table("evo_w.db.t").schema("n").dataType == LongType)
    spark.sql("INSERT INTO evo_w.db.t VALUES (100, 5000000000)")
    val out = spark.sql(
      "SELECT CAST(SUM(n) AS BIGINT) FROM evo_w.db.t").head().getLong(0)
    assert(out == (0L until 30L).map(_ % 10).sum + 5000000000L)
    intercept[Exception](
      spark.sql("ALTER TABLE evo_w.db.t ALTER COLUMN n TYPE INT")) // narrowing
    spark.sql("DROP TABLE evo_w.db.t")
  }

  test("mergeSchema write auto-adds unseen columns; off by default; types still checked") {
    val w = tmp("evo_merge")
    Collection.create(spark, w, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    // default: an unknown column still fails fast
    val e = intercept[Exception] {
      Seq((3L, "c", 1.5)).toDF("id", "s", "score").write.format("hadro")
        .mode("append").save(w)
    }
    assert(e.getMessage.contains("not in collection schema"), e.getMessage)
    // opt-in: the column is added (nullable, appended), old rows null-fill
    Seq((3L, "c", 1.5)).toDF("id", "s", "score").write.format("hadro")
      .mode("append").option("hadro.mergeSchema", "true").save(w)
    val rows = spark.read.format("hadro").load(w)
      .select("id", "s", "score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", null), (2L, "b", null), (3L, "c", 1.5)),
      rows.toString)
    val meta = CollectionMeta.readSchema(java.nio.file.Paths.get(w)).get
    assert(meta.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    assert(meta.schema("score").nullable, "merged columns are nullable")
    // merge never changes an EXISTING column's type
    val e2 = intercept[Exception] {
      Seq((4, "d", 2.5)).toDF("id", "s", "score").write.format("hadro")
        .mode("append").option("hadro.mergeSchema", "true").save(w)
    }
    assert(e2.getMessage.contains("type"), e2.getMessage)
    // reserved names refuse to merge
    val e3 = intercept[Exception] {
      Seq((5L, "e", true)).toDF("id", "s", "_hadro_x").write.format("hadro")
        .mode("append").option("hadro.mergeSchema", "true").save(w)
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
  }

  test("concurrent mergeSchema writers lose no columns (serialized read-merge-write)") {
    val w = tmp("evo_merge_conc")
    Collection.create(spark, w, Seq((1L, "a")).toDF("id", "s"))
    // two writers racing to add DIFFERENT columns: without the schema
    // lock one read-merge-write would discard the other's column while
    // its segments were already written at the wider nFields
    val t1 = new Thread(() =>
      Seq((2L, "b", 1.5)).toDF("id", "s", "x").write.format("hadro")
        .mode("append").option("hadro.mergeSchema", "true").save(w))
    val t2 = new Thread(() =>
      Seq((3L, "c", 7L)).toDF("id", "s", "y").write.format("hadro")
        .mode("append").option("hadro.mergeSchema", "true").save(w))
    t1.start(); t2.start(); t1.join(); t2.join()
    val meta = CollectionMeta.readSchema(java.nio.file.Paths.get(w)).get
    assert(meta.schema.fieldNames.toSet == Set("id", "s", "x", "y"),
      meta.schema.simpleString)
    val rows = spark.read.format("hadro").load(w)
      .select("id", "x", "y").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, null, null), (2L, 1.5, null), (3L, null, 7L)),
      rows.toString)
  }
}
