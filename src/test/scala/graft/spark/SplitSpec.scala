package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Oversized-segment splitting: a single big ingest task must not become a
  * single scan task. Writers record record-aligned split points every
  * `hadro.splitBytes`; the scan plans one InputPartition per range.
  * Mirrors the multi-segment intent the reference reserved but never built
  * (`/root/reference/hadro/engine.py:83`, the `00000000` naming). */
class SplitSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"split_$name").resolve("c").toString

  test("one oversized segment scans as many partitions with unchanged results") {
    val path = tmp("scan")
    val src = spark.read.parquet(s"$sf0001/part.parquet")
    // ONE writer task + tiny split cadence => one segment, many ranges
    src.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.splitBytes", 2 * 1024).save(path)

    val m = CollectionMeta.currentManifest(Paths.get(path))
    assert(m.segments.size == 1)
    val splits = m.segments.head.splits
    assert(splits.nonEmpty, "expected split points in a >2KB segment")
    // split offsets/rows strictly increase and stay inside the file
    assert(splits.map(_.offset) == splits.map(_.offset).sorted.distinct)
    assert(splits.last.offset < m.segments.head.bytes)
    assert(splits.map(_.row) == splits.map(_.row).sorted.distinct)

    val scan = spark.read.format("hadro").load(path)
    assert(scan.rdd.getNumPartitions == splits.size + 1)
    // content identical to the source (columnar path: flat schema)
    val got = scan.orderBy("p_partkey").collect()
    val want = src.orderBy("p_partkey").collect()
    assert(got.sameElements(want))
  }

  test("block stats prune split ranges under selective filters, results unchanged") {
    val path = tmp("blocks")
    val src = spark.read.parquet(s"$sf0001/part.parquet")
    // ONE sorted writer task + tiny split cadence: blocks carry disjoint
    // p_partkey ranges, so per-block min/max can actually prune
    src.orderBy("p_partkey").coalesce(1).write.format("hadro").mode("append")
      .option("hadro.splitBytes", 2 * 1024).save(path)

    val m = CollectionMeta.currentManifest(Paths.get(path))
    val seg = m.segments.head
    assert(seg.splits.nonEmpty)
    assert(seg.blockStats.length == seg.splits.length + 1,
      "multi-block segment records one stats entry per split range")
    // per-block sums are not recorded (aggregate pushdown is segment-level)
    assert(seg.blockStats.forall(_.values.forall(_.sum.isEmpty)))

    val nBlocks = seg.splits.size + 1
    val probe = src.orderBy("p_partkey").limit(1).collect().head.getLong(0)

    // point predicate: only the block(s) covering the key are planned
    val point = spark.read.format("hadro").load(path)
      .filter(col("p_partkey") === probe)
    assert(point.rdd.getNumPartitions < nBlocks,
      s"expected block pruning below $nBlocks partitions")
    assert(point.count() == 1)

    // range predicate: a prefix of blocks survives; results exact
    val mid = src.selectExpr("percentile_approx(p_partkey, 0.5)").collect().head.getLong(0)
    val range = spark.read.format("hadro").load(path)
      .filter(col("p_partkey") <= mid)
    assert(range.rdd.getNumPartitions < nBlocks)
    val got = range.orderBy("p_partkey").collect()
    val want = src.filter(col("p_partkey") <= mid).orderBy("p_partkey").collect()
    assert(got.sameElements(want))

    // unfiltered scans still plan every block
    assert(spark.read.format("hadro").load(path).rdd.getNumPartitions == nBlocks)
  }

  test("single-block segments record no block stats; legacy pruning unchanged") {
    val path = tmp("oneblock")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    src.coalesce(1).write.format("hadro").mode("append").save(path)
    val seg = CollectionMeta.currentManifest(Paths.get(path)).segments.head
    assert(seg.splits.isEmpty && seg.blockStats.isEmpty)
    val got = spark.read.format("hadro").load(path)
      .filter(col("r_regionkey") === 1).collect()
    assert(got.length == 1)
  }

  test("_hadro_seq stays globally unique and ordered across split ranges") {
    val path = tmp("seq")
    val src = spark.read.parquet(s"$sf0001/part.parquet")
    src.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.splitBytes", 2 * 1024).save(path)
    val seqs = spark.read.format("hadro").load(path)
      .select(col(HadroTable.SeqCol).as("seq")).as[Long].collect()
    assert(seqs.distinct.length == src.count()) // row reader path, no dup/gap
    assert(seqs.min == 0L && seqs.max == src.count() - 1)
  }

  test("keyed resolution and point lookups are split-transparent") {
    val path = tmp("keyed")
    val src = spark.read.parquet(s"$sf0001/part.parquet")
    val c = Collection.create(spark, path, src.coalesce(1), key = Some("p_partkey"))
    // force splits via a second oversized write carrying upserts
    src.coalesce(1).limit(100)
      .withColumn("p_name", lit("UPDATED"))
      .write.format("hadro").mode("append")
      .option("hadro.upsert", "true").option("hadro.splitBytes", 2 * 1024)
      .save(path)
    assert(c.count() == src.count())
    assert(c.toDF().filter($"p_name" === "UPDATED").count() == 100)
    assert(c.get(1L).select("p_name").as[String].head() == "UPDATED")
  }

  test("split points respect record alignment for wide rows") {
    val path = tmp("wide")
    // rows much larger than splitBytes: every range holds >= 1 whole record
    val wide = spark.range(64)
      .select($"id", concat_ws("", array_repeat(lit("x"), 4096)).as("payload"))
    wide.coalesce(1).write.format("hadro").mode("append")
      .option("hadro.splitBytes", 1024).save(path)
    val scan = spark.read.format("hadro").load(path)
    assert(scan.rdd.getNumPartitions > 1)
    assert(scan.count() == 64)
    assert(scan.agg(sum(length($"payload"))).head().getLong(0) == 64L * 4096)
  }

  test("maxSegmentBytes rotates one big task into bounded segment files") {
    val path = tmp("rotate")
    val src = spark.read.parquet(s"$sf0001/customer.parquet").coalesce(1) // ONE task
    src.write.format("hadro").mode("append")
      .option("hadro.maxSegmentBytes", "2048")
      .save(path)
    val m = CollectionMeta.currentManifest(Paths.get(path))
    assert(m.segments.size > 4, s"expected rotation, got ${m.segments.size} segment(s)")
    // rotation triggers after the crossing record: cap + one record of slack
    assert(m.segments.forall(_.bytes <= 2 * 2048),
      s"oversized segment: ${m.segments.map(_.bytes).max}")
    val back = spark.read.format("hadro").load(path)
    assert(back.count() == src.count())
    // task row order survives rotation (ordinals assigned in rotation order)
    val seqOrder = back.select(col("c_custkey"), col("_hadro_seq"))
      .orderBy("_hadro_seq").select($"c_custkey").as[Long].collect()
    assert(seqOrder.sameElements(src.select($"c_custkey").as[Long].collect()))
  }

  test("rotation preserves last-write-wins for repeated keys in one task") {
    val path = tmp("rotate_lww")
    // 1000 rows, 10 keys, single partition: each key's LAST row must win
    // even when its occurrences straddle rotation boundaries
    val src = spark.range(0, 1000).coalesce(1)
      .select(($"id" % 10).as("k"), concat(lit("v"), $"id").as("v"))
    Collection.create(spark, path, src.limit(0), key = Some("k"))
    src.write.format("hadro").mode("append")
      .option("hadro.upsert", "true")
      .option("hadro.maxSegmentBytes", "2048")
      .save(path)
    val c = Collection(spark, path)
    assert(CollectionMeta.currentManifest(Paths.get(path)).segments.size > 2)
    (0L until 10L).foreach { k =>
      assert(c.get(k).select($"v").as[String].head() == s"v${990 + k}",
        s"key $k must resolve to its last write")
    }
  }
}
