package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** Named composite-key indexes (`/root/reference/INTERFACE.md:32-38`):
  * `indexes.add(name, [fields])` builds per-segment blooms over the field
  * tuple; a query pinning every field with equality probes them at scan
  * planning and skips non-matching segments. */
class IndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"idx_$name").resolve("c").toString

  test("composite index prunes segments and preserves results") {
    val path = tmp("prune")
    val src = spark.read.parquet(s"$sf0001/part.parquet")
    // random 8-way split: per-column min/max stats cover the full value
    // range in EVERY segment, so only the composite bloom can prune
    val c = Collection.create(spark, path, src, numSegments = 8)
    c.indexes.add("brand_type", Seq("p_brand", "p_type"))
    assert(c.indexes.named() == Map("brand_type" -> Seq("p_brand", "p_type")))

    val probe = src.select($"p_brand", $"p_type").head()
    val (brand, container) = (probe.getString(0), probe.getString(1))
    val q = c.where($"p_brand" === brand && $"p_type" === container)
    val want = src.filter($"p_brand" === brand && $"p_type" === container)
    assert(q.orderBy("p_partkey").collect().sameElements(want.orderBy("p_partkey").collect()))
    // the pair lives in few segments; blooms must drop (most of) the rest
    assert(q.rdd.getNumPartitions < 8,
      s"expected composite-bloom pruning, got ${q.rdd.getNumPartitions} of 8 tasks")
  }

  test("writes after registration carry the sidecar from birth") {
    val path = tmp("birth")
    val src = spark.read.parquet(s"$sf0001/supplier.parquet")
    val c = Collection.create(spark, path, src, numSegments = 2)
    c.indexes.add("nat_name", Seq("s_nationkey", "s_name"))
    c.append(src.limit(5))
    val m = CollectionMeta.currentManifest(Paths.get(path))
    assert(m.segments.size == 3)
    assert(m.segments.forall(_.indexBlooms.contains("nat_name")))
    m.segments.foreach(s =>
      assert(Files.exists(Paths.get(path).resolve(s.indexBlooms("nat_name")))))
  }

  test("remove unregisters the index and deletes its sidecars") {
    val path = tmp("remove")
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = Collection.create(spark, path, src, numSegments = 3)
    c.indexes.add("nk_name", Seq("n_nationkey", "n_name"))
    val withIdx = CollectionMeta.currentManifest(Paths.get(path))
    assert(withIdx.segments.forall(_.indexBlooms.contains("nk_name")))
    c.indexes.remove("nk_name")
    assert(c.indexes.named().isEmpty)
    val m = CollectionMeta.currentManifest(Paths.get(path))
    assert(m.segments.forall(_.indexBlooms.isEmpty))
    withIdx.segments.foreach(s => assert(!Files.exists(
      Paths.get(path).resolve(s.file + ".idx-nk_name.bloom"))))
    // queries still correct without the index
    assert(c.where($"n_nationkey" === 3 && $"n_name".isNotNull).count() == 1)
  }

  test("re-adding an index over different fields never serves a stale cached bloom") {
    val path = tmp("readd")
    val src = spark.read.parquet(s"$sf0001/part.parquet")
    val c = Collection.create(spark, path, src, numSegments = 8)
    c.indexes.add("ix", Seq("p_brand", "p_type"))
    val probe = src.select($"p_brand", $"p_type", $"p_name", $"p_size").head()
    // warm the shared driver-side sidecar cache with the first build
    assert(c.where($"p_brand" === probe.get(0) && $"p_type" === probe.get(1)).count() ==
      src.filter($"p_brand" === probe.get(0) && $"p_type" === probe.get(1)).count())
    val firstBuild = CollectionMeta.currentManifest(Paths.get(path))
      .segments.flatMap(_.indexBlooms.get("ix")).toSet
    assert(firstBuild.nonEmpty)

    c.indexes.remove("ix")
    c.indexes.add("ix", Seq("p_name", "p_size"))
    val secondBuild = CollectionMeta.currentManifest(Paths.get(path))
      .segments.flatMap(_.indexBlooms.get("ix")).toSet
    // build-unique sidecar names: a cache keyed by path cannot alias builds.
    // The superseded files are NOT deleted yet — retained older manifest
    // versions still reference them, and time-travel reads against those
    // versions keep their index pruning; GC happens once the referencing
    // versions age out of the retention window.
    assert(firstBuild.intersect(secondBuild).isEmpty)
    firstBuild.foreach(f => assert(Files.exists(Paths.get(path).resolve(f))))

    // probing the NEW fields must find every matching row — a stale bloom
    // over the old fields would false-negative and silently drop segments
    val got = c.where($"p_name" === probe.get(2) && $"p_size" === probe.get(3)).count()
    val want = src.filter($"p_name" === probe.get(2) && $"p_size" === probe.get(3)).count()
    assert(got == want && got > 0)
  }

  test("index add validates name, type, and fields") {
    val path = tmp("validate")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    val c = Collection.create(spark, path, src)
    intercept[IllegalArgumentException](c.indexes.add("bad name", Seq("r_name")))
    intercept[IllegalArgumentException](c.indexes.add("x", Seq("r_name"), indexType = "b+tree"))
    intercept[IllegalArgumentException](c.indexes.add("x", Seq("nope")))
    intercept[IllegalArgumentException](c.indexes.add("x", Nil))
  }

  test("rebuild(name) swaps sidecar build-ids without rewriting data") {
    val path = tmp("rebuild_one")
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
    val c = Collection.create(spark, path, src, numSegments = 4)
    c.indexes.add("seg", Seq("c_mktsegment", "c_nationkey"))
    val m0 = CollectionMeta.currentManifest(Paths.get(path))
    val sidecars0 = m0.segments.flatMap(_.indexBlooms.get("seg")).toSet
    assert(sidecars0.nonEmpty)

    c.indexes.rebuild("seg")

    val m1 = CollectionMeta.currentManifest(Paths.get(path))
    // data files untouched — this is a sidecar-only operation
    assert(m1.segments.map(_.file) == m0.segments.map(_.file))
    // every sidecar reference swapped to the new build
    val sidecars1 = m1.segments.flatMap(_.indexBlooms.get("seg")).toSet
    assert(sidecars1.nonEmpty && sidecars0.intersect(sidecars1).isEmpty)
    // the rebuilt index still answers equality probes correctly
    val seg = src.select($"c_mktsegment").as[String].head()
    val nat = src.filter($"c_mktsegment" === seg).select($"c_nationkey").as[Long].head()
    val got = c.scan().filter($"c_mktsegment" === seg && $"c_nationkey" === nat).count()
    val want = src.filter($"c_mktsegment" === seg && $"c_nationkey" === nat).count()
    assert(got == want)
    // rebuilding an unknown index is a clear error
    intercept[IllegalArgumentException](c.indexes.rebuild("nope"))
  }

  test("superseded sidecars are swept when their last referencing manifest ages out") {
    val path = tmp("ageout")
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val c = Collection.create(spark, path, src, numSegments = 2)
    c.indexes.add("nk", Seq("n_nationkey"))
    val firstBuild = CollectionMeta.currentManifest(Paths.get(path))
      .segments.flatMap(_.indexBlooms.get("nk")).toSet
    assert(firstBuild.nonEmpty)
    // supersede the build; old sidecars survive (retained manifests still
    // reference them for time travel)
    c.indexes.add("nk", Seq("n_nationkey"))
    firstBuild.foreach(f => assert(Files.exists(Paths.get(path).resolve(f))))
    // age every referencing manifest out of the retention window with plain
    // appends — NO index op or compaction — and the per-commit ageout sweep
    // must physically delete the now-unreferenced first-build sidecars
    val one = src.limit(1)
    (1 to CollectionMeta.KeepVersions + 2).foreach(_ => c.append(one))
    firstBuild.foreach(f => assert(!Files.exists(Paths.get(path).resolve(f)),
      s"aged-out sidecar $f must be swept without an index op"))
    // the live build keeps serving
    assert(c.where($"n_nationkey" === 3).count() == 1)
  }
}
