package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Storage-partitioned joins over bucketed hadro collections: both sides
  * written with `hadro.bucketBy`/`hadro.buckets` report
  * KeyGroupedPartitioning, so the join plans with ZERO exchanges — the
  * DSv2 answer to "co-locate the two biggest tables" at 100 TB. */
class BucketedCollectionSpec extends SparkSuite {
  import spark.implicits._

  private def writeBucketed(src: org.apache.spark.sql.DataFrame, key: String,
      n: Int): String = {
    val path = Files.createTempDirectory("spj").resolve("c").toString
    src.repartition(n, pmod(xxhash64(col(key)), lit(n)))
      .write.format("hadro").mode("append")
      .option("hadro.bucketBy", key).option("hadro.buckets", n.toString)
      .save(path)
    path
  }

  test("segments carry bucket tags matching the engine-side expression") {
    val path = writeBucketed(
      spark.read.parquet(s"$sf0001/customer.parquet"), "c_custkey", 4)
    val m = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.bucketBy.contains("c_custkey") && m.numBuckets.contains(4))
    assert(m.segments.nonEmpty && m.segments.forall(_.bucket.isDefined))
    // per-bucket recount via the engine's own expression agrees with tags
    val expected = spark.read.parquet(s"$sf0001/customer.parquet")
      .groupBy(pmod(xxhash64($"c_custkey"), lit(4)).as("b"))
      .count().as[(Long, Long)].collect().toMap
    val byTag = m.segments.groupBy(_.bucket.get)
      .map { case (b, ss) => b.toLong -> ss.map(s => s.rows - s.tombstones).sum }
    assert(byTag == expected, s"tags $byTag vs engine $expected")
  }

  test("co-bucketed collections join with zero exchanges") {
    // Catalog-resolved tables: Spark resolves the scan's reported
    // bucket(n, col) transform against the relation's FunctionCatalog —
    // path-based reads have none and silently drop the partitioning.
    val wh = Files.createTempDirectory("spjwh").toString
    spark.conf.set("spark.sql.catalog.spjcat", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcat.warehouse", wh)
    def writeTo(src: org.apache.spark.sql.DataFrame, key: String, tbl: String): Unit =
      src.repartition(8, pmod(xxhash64(col(key)), lit(8)))
        .write.format("hadro").mode("append")
        .option("hadro.bucketBy", key).option("hadro.buckets", "8")
        .save(s"$wh/ns/$tbl")
    writeTo(spark.read.parquet(s"$sf0001/customer.parquet"), "c_custkey", "cust")
    writeTo(spark.read.parquet(s"$sf0001/orders.parquet"), "o_custkey", "ord")
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("spjcat.ns.cust")
        .join(spark.table("spjcat.ns.ord"), $"c_custkey" === $"o_custkey")
        .groupBy($"c_custkey").agg(count(lit(1)).as("n"))
      val rows = j.collect()
      // correctness against the parquet originals
      val expect = spark.read.parquet(s"$sf0001/customer.parquet")
        .join(spark.read.parquet(s"$sf0001/orders.parquet"),
          $"c_custkey" === $"o_custkey")
        .groupBy($"c_custkey").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
      // the join itself must be exchange-free: the only allowed shuffle is
      // the final aggregation's (none on the join keys because the
      // grouping rides the join's key-grouped distribution)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a zero-exchange storage-partitioned join plan:\n$plan")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("multi-column bucketing routes by the compound key (layout only)") {
    val wh = Files.createTempDirectory("spjmc").toString
    spark.conf.set("spark.sql.catalog.spjmc", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjmc.warehouse", wh)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey", $"l_quantity")
    def writeTo(tbl: String): Unit =
      li.repartition(8, pmod(xxhash64($"l_orderkey", $"l_suppkey"), lit(8)))
        .write.format("hadro").mode("append")
        .option("hadro.bucketBy", "l_orderkey,l_suppkey")
        .option("hadro.buckets", "8")
        .save(s"$wh/ns/$tbl")
    writeTo("a"); writeTo("b")
    val m = graft.meta.CollectionMeta
      .currentManifest(java.nio.file.Paths.get(s"$wh/ns/a"))
    assert(m.bucketBy.contains("l_orderkey,l_suppkey") && m.numBuckets.contains(8))
    assert(m.segments.forall(_.bucket.isDefined))
    // compound-key routing matches the engine-side two-arg xxhash64 fold
    val expected = li
      .groupBy(pmod(xxhash64($"l_orderkey", $"l_suppkey"), lit(8)).as("b"))
      .count().as[(Long, Long)].collect().toMap
    val byTag = m.segments.groupBy(_.bucket.get.toLong)
      .map { case (b, ss) => b -> ss.map(s => s.rows - s.tombstones).sum }
    assert(byTag == expected, s"tags $byTag vs engine $expected")
    // two-key joins stay correct (Spark's SPJ model matches one transform
    // per join key, so multi-column specs don't report partitioning — the
    // join shuffles, it never mis-groups)
    val a = spark.table("spjmc.ns.a").as("a")
    val b = spark.table("spjmc.ns.b").as("b")
    val got = a.join(b,
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_suppkey" === $"b.l_suppkey")
      .groupBy($"a.l_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = li.as("x").join(li.as("y"),
        $"x.l_orderkey" === $"y.l_orderkey" && $"x.l_suppkey" === $"y.l_suppkey")
      .groupBy($"x.l_orderkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("SPJ stays correct under skewed buckets with partially-clustered distribution") {
    // one hot key (= one hot bucket) on the probe side; the build side
    // stays uniform. With pushPartValues + partiallyClusteredDistribution
    // Spark may replicate the small side's hot partitions instead of
    // falling back to a shuffle — either way the result must be exact.
    val wh = Files.createTempDirectory("spjskew").toString
    spark.conf.set("spark.sql.catalog.spjskew", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjskew.warehouse", wh)
    val hot = spark.range(0, 2000).select(lit(7L).as("k"), $"id".as("v"))
      .unionByName(spark.range(0, 100).select($"id".as("k"), $"id".as("v")))
    val dim = spark.range(0, 100).select($"id".as("k"), ($"id" * 10).as("w"))
    def writeTo(df: org.apache.spark.sql.DataFrame, tbl: String): Unit =
      df.repartition(4, pmod(xxhash64(col("k")), lit(4)))
        .write.format("hadro").mode("append")
        .option("hadro.bucketBy", "k").option("hadro.buckets", "4")
        .save(s"$wh/ns/$tbl")
    writeTo(hot, "fact"); writeTo(dim, "dim")
    val savedConfs = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
      .map(k => k -> spark.conf.getOption(k))
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    savedConfs.foreach { case (k, _) => spark.conf.set(k, "true") }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("spjskew.ns.fact").as("f")
        .join(spark.table("spjskew.ns.dim").as("d"), $"f.k" === $"d.k")
        .groupBy($"f.k").agg(count(lit(1)).as("n"), sum($"w").as("sw"))
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = hot.as("f").join(dim.as("d"), $"f.k" === $"d.k")
        .groupBy($"f.k").agg(count(lit(1)).as("n"), sum($"w").as("sw"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expect)
      // the JOIN itself must not shuffle its inputs (storage-partitioned);
      // only the post-join aggregation may exchange (partially-clustered
      // replication makes partitions non-disjoint, so the agg re-shuffles
      // — that is correct). Inspect only the FINAL plan below the join.
      val plan = j.queryExecution.executedPlan.toString
      val finalSection = plan.split("== Initial Plan ==").head
      val joinIdx = finalSection.indexOf("Join")
      assert(joinIdx >= 0, plan)
      assert(!finalSection.substring(joinIdx).contains("Exchange"),
        s"join inputs must come from storage partitioning:\n$plan")
    } finally {
      savedConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("co-bucketed co-sorted collections join with zero exchanges AND zero sorts") {
    // The SMB-join contract: both sides bucketed on the key AND per-bucket
    // sorted (declared via hadro.sortedBy, one unsplit segment per bucket)
    // → the scan reports KeyGroupedPartitioning + per-partition ordering,
    // and the SortMergeJoin plans with no Exchange and no Sort at all.
    val wh = Files.createTempDirectory("smbjoin").toString
    spark.conf.set("spark.sql.catalog.smbcat", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.smbcat.warehouse", wh)
    val left = spark.range(0, 3000).select($"id".as("k"), ($"id" * 2).as("v"))
    val right = spark.range(0, 3000).select($"id".as("k"), ($"id" * 7).as("w"))
    def writeSorted(df: org.apache.spark.sql.DataFrame, tbl: String): Unit =
      df.repartition(4, pmod(xxhash64(col("k")), lit(4)))
        .sortWithinPartitions("k")
        .write.format("hadro").mode("overwrite")
        .option("hadro.bucketBy", "k").option("hadro.buckets", "4")
        .option("hadro.sortedBy", "k")
        .save(s"$wh/ns/$tbl")
    writeSorted(left, "lhs"); writeSorted(right, "rhs")
    val m = graft.meta.CollectionMeta
      .currentManifest(java.nio.file.Paths.get(s"$wh/ns/lhs"))
    assert(m.sortedBy.contains("k") && m.bucketBy.contains("k"))
    assert(m.segments.flatMap(_.bucket).distinct.size == m.segments.size,
      "one segment per bucket expected")

    val saved = Seq("spark.sql.sources.v2.bucketing.enabled")
      .map(k => k -> spark.conf.getOption(k))
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("smbcat.ns.lhs")
        .join(spark.table("smbcat.ns.rhs"), "k")
        .select($"k", $"v", $"w")
      val got = j.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == (0L until 3000L).map(i => (i, i * 2, i * 7)))
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("Sort "),
        s"co-sorted buckets must not re-sort:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("compaction preserves bucketing") {
    val path = writeBucketed(
      spark.read.parquet(s"$sf0001/customer.parquet"), "c_custkey", 4)
    val before = graft.meta.CollectionMeta
      .currentManifest(java.nio.file.Paths.get(path))
    val c = graft.api.Collection(spark, path)
    c.compact()
    val after = graft.meta.CollectionMeta
      .currentManifest(java.nio.file.Paths.get(path))
    assert(after.bucketBy.contains("c_custkey") && after.numBuckets.contains(4))
    assert(after.segments.nonEmpty && after.segments.forall(_.bucket.isDefined),
      "compacted segments must keep their bucket tags")
    def counts(m: graft.meta.Manifest) = m.segments.groupBy(_.bucket.get)
      .map { case (b, ss) => b -> ss.map(s => s.rows - s.tombstones).sum }
    assert(counts(after) == counts(before))
    assert(c.count() == spark.read.parquet(s"$sf0001/customer.parquet").count())
  }

  test("SQL PARTITIONED BY (bucket(n, col)) declares bucketing; INSERT inherits it") {
    val wh = Files.createTempDirectory("spjsql").toString
    spark.conf.set("spark.sql.catalog.spjsql", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjsql.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjsql.db")
    spark.sql("""CREATE TABLE spjsql.db.cust
      (c_custkey BIGINT, c_name STRING)
      USING hadro PARTITIONED BY (bucket(4, c_custkey))""")
    spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_name")
      .createOrReplaceTempView("spjsql_src")
    // a PLAIN insert — no hadro.* options, no manual repartition
    spark.sql("INSERT INTO spjsql.db.cust SELECT * FROM spjsql_src")
    val m = graft.meta.CollectionMeta
      .currentManifest(java.nio.file.Paths.get(s"$wh/db/cust"))
    assert(m.bucketBy.contains("c_custkey") && m.numBuckets.contains(4))
    assert(m.segments.nonEmpty && m.segments.forall(_.bucket.isDefined),
      "plain INSERT must inherit the declared bucketing")
    // catalog writes require a bucket-clustered distribution with one
    // partition per bucket, so the INSERT lands exactly n segments —
    // not tasks×n small files
    assert(m.segments.size == 4,
      s"expected 4 one-per-bucket segments, got ${m.segments.map(s => (s.file, s.bucket))}")
    assert(m.segments.map(_.bucket.get).sorted == Seq(0, 1, 2, 3))
    // the table reports its layout
    val ddl = spark.sql("DESCRIBE TABLE EXTENDED spjsql.db.cust")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(ddl.contains("bucket(4, c_custkey)"), ddl)
    assert(spark.table("spjsql.db.cust").count() ==
      spark.read.parquet(s"$sf0001/customer.parquet").count())
  }

  test("Z-order clustering preserves bucketing (single-bucket, z-ordered segments)") {
    val path = writeBucketed(
      spark.read.parquet(s"$sf0001/customer.parquet"), "c_custkey", 4)
    val c = graft.api.Collection(spark, path)
    c.cluster(Seq("c_custkey", "c_nationkey"), numSegments = 4)
    val m = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.bucketBy.contains("c_custkey") && m.numBuckets.contains(4))
    assert(m.segments.nonEmpty && m.segments.forall(_.bucket.isDefined),
      "clustered rewrite must re-tag segments from the declared spec")
    assert(c.count() == spark.read.parquet(s"$sf0001/customer.parquet").count())
  }

  test("streaming epochs into a declared-bucketed collection keep the layout") {
    val stage = Files.createTempDirectory("spjstream_src")
    val ckpt = Files.createTempDirectory("spjstream_ckpt").toString
    // declare the bucketing at creation (batch write with options), then
    // stream MORE rows in with no options at all
    val src = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_name")
    val path = writeBucketed(src, "c_custkey", 4)
    src.withColumn("c_custkey", $"c_custkey" + 1000000L)
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val q = spark.readStream.schema(src.schema).parquet(stage.toString)
      .writeStream.format("hadro").option("checkpointLocation", ckpt)
      .start(path)
    q.processAllAvailable()
    q.stop()
    val m = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m.bucketBy.contains("c_custkey") && m.numBuckets.contains(4))
    assert(m.segments.forall(_.bucket.isDefined),
      "streamed segments must inherit the declared bucketing")
    assert(spark.read.format("hadro").load(path).count() == src.count() * 2)
  }

  test("a fully-pruned bucketed scan plans empty without reporting partitioning") {
    val path = writeBucketed(
      spark.read.parquet(s"$sf0001/customer.parquet"), "c_custkey", 4)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // the filter prunes every segment via min/max stats
      val df = spark.read.format("hadro").load(path)
        .filter($"c_custkey" === -99999L)
      assert(df.count() == 0L)
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("a failing bucketed write aborts cleanly, leaving no stray segments") {
    val path = writeBucketed(
      spark.read.parquet(s"$sf0001/nation.parquet"), "n_nationkey", 4)
    def dataFiles() = {
      val d = new java.io.File(path)
      d.listFiles().map(_.getName).filter(_.endsWith(".data")).toSet
    }
    val before = dataFiles()
    // ANSI division by zero blows up one task mid-write
    intercept[Exception] {
      spark.read.parquet(s"$sf0001/nation.parquet")
        .withColumn("n_regionkey",
          (lit(1) / (col("n_nationkey") - col("n_nationkey"))).cast("int"))
        .write.format("hadro").mode("append").save(path)
    }
    assert(dataFiles() == before,
      "aborted bucketed tasks must delete every per-bucket segment file")
    assert(spark.read.format("hadro").load(path).count() == 25L)
  }

  test("plain appends inherit bucketing; a conflicting spec degrades safely") {
    val path = writeBucketed(
      spark.read.parquet(s"$sf0001/nation.parquet"), "n_nationkey", 4)
    // option-less append: the spec persisted at creation applies
    spark.read.parquet(s"$sf0001/nation.parquet")
      .withColumn("n_nationkey", ($"n_nationkey" + 100).cast("int"))
      .write.format("hadro").mode("append").save(path)
    val m1 = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m1.bucketBy.contains("n_nationkey"))
    assert(m1.segments.forall(_.bucket.isDefined),
      "an option-less append must inherit the declared bucketing")
    // an append under a CONFLICTING spec clears the manifest spec: old
    // tags no longer describe one uniform layout, so scans must stop
    // reporting KeyGroupedPartitioning — but reads stay correct
    spark.read.parquet(s"$sf0001/nation.parquet")
      .withColumn("n_nationkey", ($"n_nationkey" + 200).cast("int"))
      .write.format("hadro").mode("append")
      .option("hadro.bucketBy", "n_nationkey").option("hadro.buckets", "8")
      .save(path)
    val m2 = graft.meta.CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(m2.bucketBy.isEmpty && m2.numBuckets.isEmpty)
    assert(spark.read.format("hadro").load(path).count() == 75L)
  }
}
