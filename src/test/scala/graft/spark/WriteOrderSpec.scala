package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Table-declared write order (Iceberg `WRITE ORDERED BY` analog):
  * `TBLPROPERTIES ('sortedBy' = 'col')` makes every catalog batch write
  * require a within-partition sort (RequiresDistributionAndOrdering), so
  * plain INSERTs land range-sorted segments and the manifest's `sortedBy`
  * declaration — hence SupportsReportOrdering, RemoveRedundantSorts, and
  * range-tight segment stats — survives without manual cluster() calls. */
class WriteOrderSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_wo_wh").toString
    spark.conf.set("spark.sql.catalog.wocat", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.wocat.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wocat.db")
    w
  }

  test("declared sortedBy: plain INSERT lands sorted segments and the " +
      "scan reports ordering") {
    warehouse
    spark.sql("""CREATE TABLE wocat.db.t (k BIGINT, v BIGINT) USING hadro
      TBLPROPERTIES ('sortedBy' = 'k')""")
    // deliberately unsorted input
    spark.sql("""INSERT INTO wocat.db.t
      SELECT (id * 37) % 2000 AS k, id AS v FROM range(0, 2000)""")
    val dir = java.nio.file.Paths.get(s"$warehouse/db/t")
    assert(CollectionMeta.currentManifest(dir).sortedBy.contains("k"),
      "catalog INSERT into a declared-order table must record sortedBy")
    // rows really are sorted within every partition
    val scan = spark.read.format("hadro").load(dir.toString)
    scan.select($"k")
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect()
      .foreach(s => assert(s == s.sorted, "partition not sorted by k"))
    // a redundant per-partition sort is planned away
    val sorted = scan.sortWithinPartitions("k")
    sorted.collect()
    val plan = sorted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Sort ["), s"redundant sort survived:\n$plan")

    // an unsorted PATH append clears the manifest declaration (the data
    // no longer proves uniform order) — but the TABLE property stands,
    // so the next catalog overwrite re-establishes it
    Seq((5L, 1L), (1L, 2L)).toDF("k", "v").coalesce(1)
      .write.format("hadro").mode("append").save(dir.toString)
    assert(CollectionMeta.currentManifest(dir).sortedBy.isEmpty)
    spark.sql("""INSERT OVERWRITE wocat.db.t
      SELECT (id * 37) % 100 AS k, id AS v FROM range(0, 100)""")
    assert(CollectionMeta.currentManifest(dir).sortedBy.contains("k"))
    spark.sql("DROP TABLE wocat.db.t")
  }

  test("sortedBy validates, alters, follows renames, clears on drop") {
    warehouse
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE wocat.db.bad (k BIGINT) USING hadro
        TBLPROPERTIES ('sortedBy' = 'nope')""")
    }
    assert(e.getMessage.contains("nope"))

    spark.sql("""CREATE TABLE wocat.db.alt (a BIGINT, b BIGINT) USING hadro
      TBLPROPERTIES ('sortedBy' = 'a')""")
    val dir = java.nio.file.Paths.get(s"$warehouse/db/alt")
    // re-point the declaration: later writes sort by b
    spark.sql("ALTER TABLE wocat.db.alt SET TBLPROPERTIES ('sortedBy' = 'b')")
    spark.sql("""INSERT INTO wocat.db.alt
      SELECT id AS a, (id * 37) % 500 AS b FROM range(0, 500)""")
    assert(CollectionMeta.currentManifest(dir).sortedBy.contains("b"))
    // rename follows
    spark.sql("ALTER TABLE wocat.db.alt RENAME COLUMN b TO b2")
    assert(CollectionMeta.readWriteOrder(dir).contains("b2"))
    spark.sql("""INSERT OVERWRITE wocat.db.alt
      SELECT id AS a, (id * 7) % 100 AS b2 FROM range(0, 100)""")
    assert(CollectionMeta.currentManifest(dir).sortedBy.contains("b2"))
    // SHOW TBLPROPERTIES surfaces the declaration
    val props = spark.sql("SHOW TBLPROPERTIES wocat.db.alt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("sortedBy").contains("b2")) // follows the rename
    // unset stops declaring (writes no longer sort or record)
    spark.sql("ALTER TABLE wocat.db.alt UNSET TBLPROPERTIES ('sortedBy')")
    assert(CollectionMeta.readWriteOrder(dir).isEmpty)
    // drop of the ordered column clears the declaration instead of
    // leaving INSERTs to fail resolution
    spark.sql("ALTER TABLE wocat.db.alt SET TBLPROPERTIES ('sortedBy' = 'b2')")
    spark.sql("ALTER TABLE wocat.db.alt DROP COLUMN b2")
    assert(CollectionMeta.readWriteOrder(dir).isEmpty)
    spark.sql("DROP TABLE wocat.db.alt")
  }

  test("multi-column sortedBy: lexicographic segment order, leading-column " +
      "declaration, rename follows the list") {
    warehouse
    spark.sql("""CREATE TABLE wocat.db.mc (a BIGINT, b BIGINT) USING hadro
      TBLPROPERTIES ('sortedBy' = 'a, b')""")
    spark.sql("""INSERT INTO wocat.db.mc
      SELECT (id * 37) % 20 AS a, (id * 13) % 1000 AS b FROM range(0, 1000)""")
    val dir = java.nio.file.Paths.get(s"$warehouse/db/mc")
    // manifest declares the LEADING column (prefix of the true order)
    assert(CollectionMeta.currentManifest(dir).sortedBy.contains("a"))
    // rows really are (a, b)-lexicographically sorted within partitions
    spark.read.format("hadro").load(dir.toString).select($"a", $"b")
      .mapPartitions(it =>
        Iterator.single(it.map(r => (r.getLong(0), r.getLong(1))).toSeq))
      .collect()
      .foreach(s => assert(s == s.sorted, "partition not sorted by (a, b)"))
    // rename of the SECOND column keeps the declaration coherent
    spark.sql("ALTER TABLE wocat.db.mc RENAME COLUMN b TO b2")
    assert(CollectionMeta.readWriteOrder(dir).contains("a,b2"))
    // drop of ANY declared column clears the whole declaration
    spark.sql("ALTER TABLE wocat.db.mc DROP COLUMN b2")
    assert(CollectionMeta.readWriteOrder(dir).isEmpty)
    spark.sql("DROP TABLE wocat.db.mc")
  }

  test("composite sortedBy bounds prune the straddling segment that " +
      "per-column stats keep; lying/unsorted writes record no bounds") {
    val dir = Files.createTempDirectory("wo_comp").resolve("c").toString
    def sortedWrite(df: org.apache.spark.sql.DataFrame): Unit =
      df.repartition(1).sortWithinPartitions("a", "b")
        .write.format("hadro").mode("append")
        .option("hadro.sortedBy", "a,b").save(dir)
    // segment 1: (A, 0..74); segment 2 STRADDLES the leading boundary:
    // (A, 75..149) then (B, 0..49) — its per-column stats are a:[A,B],
    // b:[0,149], which cover almost any (a, b) point
    sortedWrite((0L until 75L).map(b => ("A", b)).toDF("a", "b"))
    sortedWrite(((75L until 150L).map(b => ("A", b)) ++
      (0L until 50L).map(b => ("B", b))).toDF("a", "b"))
    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(dir))
    assert(m.segments.length == 2)
    m.segments.foreach { s =>
      assert(s.sortCols.contains("a,b"), s.sortCols.toString)
      assert(s.sortLo.length == 2 && s.sortHi.length == 2)
    }
    val straddler = m.segments.maxBy(_.ordinal)
    assert(straddler.sortLo == Seq("A", "75") && straddler.sortHi == Seq("B", "49"))

    // the two-column point (A, 10): per-column stats KEEP the straddler,
    // composite lexicographic bounds PRUNE it — strictly more pruning
    import org.apache.spark.sql.sources.{EqualTo, Filter}
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType)))
    val fs: Array[Filter] = Array(EqualTo("a", "A"), EqualTo("b", 10L))
    assert(SegmentSkipper.mightMatch(straddler, fs, schema),
      "per-column stats cannot prune the straddler")
    assert(!SegmentSkipper.compositeMightMatch(straddler, fs, schema),
      "composite bounds must prune the straddler")
    // and a point inside the straddler stays plannable both ways
    val fs2: Array[Filter] = Array(EqualTo("a", "B"), EqualTo("b", 10L))
    assert(SegmentSkipper.compositeMightMatch(straddler, fs2, schema))
    // range form: a = 'A' AND b >= 80 intersects only the straddler
    val fs3: Array[Filter] = Array(EqualTo("a", "A"),
      org.apache.spark.sql.sources.GreaterThanOrEqual("b", 80L))
    assert(SegmentSkipper.compositeMightMatch(straddler, fs3, schema))
    assert(!SegmentSkipper.compositeMightMatch(m.segments.minBy(_.ordinal), fs3, schema))

    // end-to-end: the scan plans ONE partition for (A, 10) and reads right
    val q = spark.read.format("hadro").load(dir)
      .filter($"a" === "A" && $"b" === 10L)
    assert(q.as[(String, Long)].collect().toSeq == Seq(("A", 10L)))
    assert(q.rdd.getNumPartitions == 1,
      "composite pruning must drop the straddler at planning time")

    // a write that CLAIMS the order but lies records no bounds (poisoned
    // by the writer's row-by-row verification), so pruning stays sound
    val dir2 = Files.createTempDirectory("wo_lie").resolve("c").toString
    Seq(("B", 1L), ("A", 2L), ("B", 0L)).toDF("a", "b")
      .repartition(1) // deliberately NOT sorted
      .write.format("hadro").mode("append")
      .option("hadro.sortedBy", "a,b").save(dir2)
    val lied = CollectionMeta.currentManifest(java.nio.file.Paths.get(dir2))
    assert(lied.segments.forall(_.sortCols.isEmpty),
      "unsorted data must poison the composite bounds")
    // null sort values poison too (lex placement of nulls is unknowable)
    val dir3 = Files.createTempDirectory("wo_null").resolve("c").toString
    Seq((Some("A"), 1L), (None, 2L)).toDF("a", "b")
      .repartition(1).sortWithinPartitions("a", "b")
      .write.format("hadro").mode("append")
      .option("hadro.sortedBy", "a,b").save(dir3)
    assert(CollectionMeta.currentManifest(java.nio.file.Paths.get(dir3))
      .segments.forall(_.sortCols.isEmpty))

    // rename follows the recorded per-segment columns
    Collection(spark, dir).renameColumn("b", "ts")
    val renamed = CollectionMeta.currentManifest(java.nio.file.Paths.get(dir))
    assert(renamed.segments.forall(_.sortCols.contains("a,ts")))
    // drop of a bound column clears the bounds
    Collection(spark, dir).addColumn("extra", org.apache.spark.sql.types.LongType)
    Collection(spark, dir).dropColumn("ts")
    val dropped = CollectionMeta.currentManifest(java.nio.file.Paths.get(dir))
    assert(dropped.segments.forall(s =>
      s.sortCols.isEmpty && s.sortLo.isEmpty && s.sortHi.isEmpty))
  }

  test("composite ordering report: redundant (a, b) sorts are planned away, " +
      "b-only sorts are not") {
    warehouse
    spark.sql("""CREATE TABLE wocat.db.ord (a BIGINT, b BIGINT, v BIGINT)
      USING hadro TBLPROPERTIES ('sortedBy' = 'a, b')""")
    spark.sql("""INSERT INTO wocat.db.ord
      SELECT (id * 37) % 20 AS a, (id * 13) % 1000 AS b, id AS v
      FROM range(0, 2000)""")
    val dir = s"$warehouse/db/ord"
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    val scan = spark.read.format("hadro").load(dir)
    // the FULL declared order is reported: a two-column within-partition
    // sort is redundant and planned away
    val p2 = finalPlan(scan.sortWithinPartitions("a", "b"))
    assert(!p2.contains("Sort ["), s"redundant (a, b) sort survived:\n$p2")
    // a sort the storage did NOT pay for stays planned
    val pb = finalPlan(scan.sortWithinPartitions("b"))
    assert(pb.contains("Sort ["), s"b-only sort must stay:\n$pb")
    // pruning the second column away still reports the leading prefix
    val p1 = finalPlan(scan.select("a").sortWithinPartitions("a"))
    assert(!p1.contains("Sort ["), s"leading-column sort survived:\n$p1")
    spark.sql("DROP TABLE wocat.db.ord")
  }

  test("declared order composes with bucketing: per-bucket sorted segments") {
    warehouse
    spark.sql("""CREATE TABLE wocat.db.bs (k BIGINT, v BIGINT) USING hadro
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES ('sortedBy' = 'v')""")
    spark.sql("""INSERT INTO wocat.db.bs
      SELECT id AS k, (id * 37) % 1000 AS v FROM range(0, 1000)""")
    val dir = java.nio.file.Paths.get(s"$warehouse/db/bs")
    val m = CollectionMeta.currentManifest(dir)
    assert(m.sortedBy.contains("v"))
    assert(m.segments.forall(_.bucket.isDefined))
    // each bucket's segment is internally sorted by v
    spark.read.format("hadro").load(dir.toString).select($"v")
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect()
      .foreach(s => assert(s == s.sorted, "bucket segment not sorted by v"))
    spark.sql("DROP TABLE wocat.db.bs")
  }
}
