package graft.api

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.meta.CollectionMeta

/** Compaction under concurrency and across time travel:
  *   - a reader mid-scan when compact() commits must finish correctly
  *     (physical GC is deferred one truncate generation);
  *   - scanVersion on a pre-compaction version must raise the documented
  *     fail-fast error, never a reader FileNotFoundException;
  *   - the deferred garbage is reclaimed by the next truncate. */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"compact_$name").resolve("c").toString

  private def dataFiles(path: String): Set[String] =
    Files.list(Paths.get(path)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".data")).toSet

  test("compacting a 16-segment collection under a concurrent reader") {
    val path = tmp("reader")
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
    val c = Collection.create(spark, path, src, key = Some("c_custkey"), numSegments = 16)
    c.delete(src.filter($"c_custkey" % 7 === 0).select($"c_custkey"))
    assert(CollectionMeta.currentManifest(Paths.get(path)).segments.size >= 16)

    // reader plans against the PRE-compact manifest; toLocalIterator opens
    // segment files lazily, one partition at a time
    val expected = src.filter($"c_custkey" % 7 =!= 0).count()
    val it = c.toDF().select($"c_custkey").toLocalIterator()
    var seen = 0L
    while (seen < 5 && it.hasNext) { it.next(); seen += 1 } // mid-scan...

    c.compact() // ...the manifest swaps and pre-compact manifests are GC'd

    while (it.hasNext) { it.next(); seen += 1 } // files must still stream
    assert(seen == expected)
    // and a freshly planned read sees the compacted state, same rows
    assert(c.toDF().count() == expected)
    assert(c.scan().count() == expected) // raw log: only live rows remain
  }

  test("scanVersion on a pre-compaction version fails fast with the documented error") {
    val path = tmp("timetravel")
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = Collection.create(spark, path, src, key = Some("n_nationkey"), numSegments = 4)
    val vPre = c.version
    c.delete(0, 1)
    c.compact()
    val e = intercept[IllegalArgumentException](c.scanVersion(vPre).count())
    assert(e.getMessage.contains("hadro"), s"unexpected: ${e.getMessage}")
    assert(!e.getMessage.contains("FileNotFound"))
    // the CURRENT version still time-travels fine
    assert(c.scanVersion(c.version).count() == src.count() - 2)
  }

  test("deferred garbage is reclaimed by the following truncate") {
    val path = tmp("reclaim")
    val src = spark.read.parquet(s"$sf0001/supplier.parquet")
    val c = Collection.create(spark, path, src, key = Some("s_suppkey"), numSegments = 8)
    c.delete(1L, 2L)
    val gen0 = dataFiles(path) // base segments + the tombstone segments
    c.compact() // gen0 dereferenced, deferred (still on disk)
    val gen1 = dataFiles(path) -- gen0
    assert(gen0.subsetOf(dataFiles(path)), "gen0 should be deferred, not deleted")
    c.compact() // gen0 physically deleted, gen1 deferred
    val now = dataFiles(path)
    assert(gen0.intersect(now).isEmpty, s"gen0 not reclaimed: ${gen0.intersect(now)}")
    assert(gen1.subsetOf(now), "gen1 should be deferred, not deleted")
    assert(c.count() == src.count() - 2)
  }

  test("vacuum() reclaims deferred garbage on demand without a rewrite") {
    val path = tmp("vacuum")
    val src = spark.read.parquet(s"$sf0001/supplier.parquet")
    val c = Collection.create(spark, path, src, key = Some("s_suppkey"), numSegments = 4)
    val gen0 = dataFiles(path)
    c.compact() // gen0 dereferenced, deferred
    assert(gen0.subsetOf(dataFiles(path)))
    c.vacuum()
    val now = dataFiles(path)
    assert(gen0.intersect(now).isEmpty, s"vacuum left ${gen0.intersect(now)}")
    // live data untouched, dead-lists drained (idempotent)
    assert(c.count() == src.count())
    c.vacuum()
    assert(c.count() == src.count())
  }
}
