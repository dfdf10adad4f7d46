package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.{ColumnStats, SegmentInfo}

/** Pushdown plumbing: filters/columns reach the scan, and min/max stats
  * prune segments (SURVEY §2.1 #4/#5, §2.2 #19). */
class PushdownSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  private def seg(min: Long, max: Long, rows: Long = 10, nulls: Long = 0) =
    SegmentInfo("f.data", 0, rows, 0, 0,
      Map("k" -> ColumnStats(Some(min.toString), Some(max.toString), nulls)))

  test("SegmentSkipper prunes by range and keeps on uncertainty") {
    val s = seg(100, 200)
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](EqualTo("k", 50L)), schema))
    assert(SegmentSkipper.mightMatch(s, Array[Filter](EqualTo("k", 150L)), schema))
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](GreaterThan("k", 200L)), schema))
    assert(SegmentSkipper.mightMatch(s, Array[Filter](GreaterThanOrEqual("k", 200L)), schema))
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](LessThan("k", 100L)), schema))
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](In("k", Array(1L, 99L, 201L))), schema))
    assert(SegmentSkipper.mightMatch(s, Array[Filter](In("k", Array(1L, 150L))), schema))
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](IsNull("k")), schema))
    // no stats for column -> conservative keep
    assert(SegmentSkipper.mightMatch(s, Array[Filter](EqualTo("s", "zzz")), schema))
  }

  test("SegmentSkipper handles string ranges and null-count pruning") {
    val s = SegmentInfo("f.data", 0, 10, 0, 0,
      Map("s" -> ColumnStats(Some("apple"), Some("mango"), 0),
        "n" -> ColumnStats(None, None, 10)))
    val strSchema = StructType(Seq(StructField("s", StringType), StructField("n", LongType)))
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](EqualTo("s", "zebra")), strSchema))
    assert(SegmentSkipper.mightMatch(s, Array[Filter](EqualTo("s", "banana")), strSchema))
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](LessThan("s", "apple")), strSchema))
    assert(SegmentSkipper.mightMatch(s, Array[Filter](GreaterThanOrEqual("s", "mango")), strSchema))
    // all-null column: IsNotNull prunes, IsNull keeps
    assert(!SegmentSkipper.mightMatch(s, Array[Filter](IsNotNull("n")), strSchema))
    assert(SegmentSkipper.mightMatch(s, Array[Filter](IsNull("n")), strSchema))
  }

  test("SegmentSkipper prunes prefix (StartsWith) and OR predicates") {
    val s = SegmentInfo("f.data", 0, 10, 0, 0,
      Map("s" -> ColumnStats(Some("https://de.site/a"), Some("https://de.site/z"), 0)))
    // range entirely below the prefix
    assert(!SegmentSkipper.mightMatch(s,
      Array[Filter](StringStartsWith("s", "https://en.")), schema))
    // range entirely above the prefix (ASCII successor upper bound)
    assert(!SegmentSkipper.mightMatch(s,
      Array[Filter](StringStartsWith("s", "https://aa.")), schema))
    // intersecting range kept
    assert(SegmentSkipper.mightMatch(s,
      Array[Filter](StringStartsWith("s", "https://de.")), schema))
    // non-ASCII last char: the upper bound is disabled, so a prefix BELOW
    // the range (which only the successor bound could prune) is kept
    assert(SegmentSkipper.mightMatch(s,
      Array[Filter](StringStartsWith("s", "https://cé")), schema))
    // OR: pruned only when BOTH branches are impossible
    val k = seg(100, 200)
    assert(!SegmentSkipper.mightMatch(k,
      Array[Filter](Or(EqualTo("k", 50L), EqualTo("k", 300L))), schema))
    assert(SegmentSkipper.mightMatch(k,
      Array[Filter](Or(EqualTo("k", 50L), EqualTo("k", 150L))), schema))
  }

  test("prefix filter prunes segments end-to-end on a sorted layout") {
    val path = Files.createTempDirectory("prefix").resolve("c").toString
    val rows = spark.range(0, 400)
      .select($"id", concat(lit("https://"),
        element_at(typedlit(Seq("aa", "de", "en", "fr")), ($"id" % 4 + 1).cast("int")),
        lit(".site/"), $"id".cast("string")).as("url"))
    val c = Collection.create(spark, path, rows, numSegments = 2)
    c.cluster(Seq("url"), numSegments = 8)

    val df = spark.read.format("hadro").load(path).filter($"url".startsWith("https://en."))
    val expected = rows.filter($"url".startsWith("https://en.")).collect().map(_.getLong(0)).sorted
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == expected.toSeq)
    val node = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }.get
    val read = node.metrics("hadroSegmentsRead").value
    assert(read <= 3, s"prefix filter should prune the sorted layout, read $read of 8")
  }

  test("point filter scans only matching segments") {
    val path = Files.createTempDirectory("push").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
      .repartitionByRange(8, $"c_custkey")
    Collection.create(spark, path, src)
    val df = spark.read.format("hadro").load(path).filter($"c_custkey" === 42L)
    // The physical scan must report the pushed filter…
    val explained = df.queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters") && explained.contains("c_custkey"))
    // …and produce the right row.
    assert(df.select($"c_custkey").as[Long].collect().toList == List(42L))
    // Partition count == segments kept after skipping: ranged segments
    // mean exactly 1 survives for a point lookup.
    val scans = df.queryExecution.executedPlan.collectLeaves()
    val parts = df.rdd.getNumPartitions
    assert(parts == 1, s"expected 1 surviving segment partition, got $parts")
  }

  test("column pruning reaches the reader schema") {
    val path = Files.createTempDirectory("prune").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/part.parquet")
    Collection.create(spark, path, src)
    val df = spark.read.format("hadro").load(path).select($"p_partkey")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("p_partkey") && !scan.contains("p_retailprice"))
    assert(df.count() == src.count())
  }

  test("limit pushdown plans only the segment prefix covering the limit") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val path = Files.createTempDirectory("limitpush").resolve("c").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    Collection.create(spark, path, src, numSegments = 8)
    def scanExec(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head

    val limited = spark.read.format("hadro").load(path).limit(5)
    val exec = scanExec(limited)
    assert(exec.scan.description().contains("PushedLimit: 5"),
      exec.scan.description())
    assert(exec.inputRDD.getNumPartitions < 8,
      "LIMIT 5 must not plan all 8 segments")
    assert(limited.count() == 5)

    // a filter disables the prefix prune (residual-filter contract) but
    // results stay correct
    val filtered = spark.read.format("hadro").load(path)
      .filter($"o_orderstatus" === "F").limit(5)
    assert(!scanExec(filtered).scan.description().contains("PushedLimit"),
      "limit must not push past residual filters")
    assert(filtered.count() == 5)

    // limit larger than the collection: all segments, all rows
    val all = spark.read.format("hadro").load(path).limit(10000000)
    assert(all.count() == src.count())
  }
}
