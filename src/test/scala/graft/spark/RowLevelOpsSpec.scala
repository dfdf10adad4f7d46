package graft.spark

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.api.Collection
import graft.meta.CollectionMeta

/** SQL UPDATE / MERGE INTO / complex DELETE through SupportsRowLevelOperations:
  * keyed collections take the delta (merge-on-read append) path, non-keyed
  * the group-based stats-pruned copy-on-write path. */
class RowLevelOpsSpec extends SparkSuite {
  import spark.implicits._

  private def freshCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"rlo_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[HadroCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("UPDATE on a keyed collection appends new versions in one commit") {
    val wh = freshCatalog("rlo_ku")
    val path = s"$wh/db/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    val verBefore = CollectionMeta.currentManifest(java.nio.file.Paths.get(path)).version
    val segsBefore = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
      .segments.map(_.file).toSet

    spark.sql("UPDATE rlo_ku.db.t SET v = v * 10 WHERE id >= 2")

    val m = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    // merge-on-read: every pre-existing segment file survives untouched
    assert(segsBefore.subsetOf(m.segments.map(_.file).toSet),
      "delta UPDATE must not rewrite existing segments")
    assert(m.version == verBefore + 1, "one atomic commit")
    // merge-on-read: the RESOLVED view reflects the update (raw scans keep
    // reference-scan() parity and still show shadowed versions — h32 shape)
    val out = Collection(spark, path).toDF().select($"id", $"v")
      .orderBy($"id").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10.0), (2L, 200.0), (3L, 300.0)))
  }

  test("keyed DELETE with a non-pushable predicate routes through the " +
      "delta path (tombstone-only write schema accepted)") {
    // Regression (found by the rollup model check): Spark narrows a pure
    // DELETE's delta write schema to the touched columns, so the
    // insert-completeness check (every non-nullable field present) must
    // not apply — a delete-only plan never inserts. A modulo predicate
    // cannot push into deleteWhere, forcing exactly this path.
    val wh = freshCatalog("rlo_kd")
    val path = s"$wh/db/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)

    spark.sql("DELETE FROM rlo_kd.db.t WHERE id % 2 = 1")

    val out = Collection(spark, path).toDF().select($"id")
      .orderBy($"id").as[Long].collect().toSeq
    assert(out == Seq(2L, 4L), s"got $out")
    // and a later upsert of a deleted key resurrects it (tombstone, not dv)
    Collection(spark, path).set(Seq((1L, "a2", 11.0)).toDF("id", "name", "v"))
    val out2 = Collection(spark, path).toDF().select($"id", $"v")
      .orderBy($"id").as[(Long, Double)].collect().toSeq
    assert(out2 == Seq((1L, 11.0), (2L, 20.0), (4L, 40.0)), s"got $out2")
  }

  test("UPDATE on a MUTATED keyed collection sees only resolved versions") {
    val wh = freshCatalog("rlo_km")
    val path = s"$wh/db/t"
    Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    val c = Collection(spark, path)
    c.set(Seq((1L, 100.0)).toDF("id", "v")) // shadow id=1's v=5.0

    // cond matches the SHADOWED version of id=1 but not its latest:
    // resolved semantics must leave id=1 alone and update only id=2
    spark.sql("UPDATE rlo_km.db.t SET v = -1 WHERE v = 5.0")

    val out = c.toDF().select($"id", $"v").orderBy($"id")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 100.0), (2L, -1.0)),
      s"stale-version update leaked: $out")
  }

  test("key-changing UPDATE tombstones the old key") {
    val wh = freshCatalog("rlo_kc")
    val path = s"$wh/db/t"
    Seq((1L, "x"), (2L, "y")).toDF("id", "s")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)

    spark.sql("UPDATE rlo_kc.db.t SET id = 99 WHERE id = 1")

    val out = Collection(spark, path).toDF().select($"id", $"s").orderBy($"id")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "y"), (99L, "x")), s"got $out")
  }

  test("key-changing UPDATE across scan tasks loses no rows") {
    // SET id = id + 1 with one key per segment: key k's tombstone is
    // written by the task scanning segment k, its re-insert (from key k-1)
    // by a DIFFERENT task. Commit must order every tombstone segment
    // before every data segment GLOBALLY — per-task ordering alone gives
    // the tombstone of key k a higher ordinal than its insert whenever
    // task k's message flattens after task k-1's, silently deleting the
    // row under last-write-wins.
    val wh = freshCatalog("rlo_kx")
    val path = s"$wh/db/t"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "s")
      .repartition(4, $"id")
    df.write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    assert(CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
      .segments.count(_.rows > 0) >= 2, "need multiple scan tasks")

    spark.sql("UPDATE rlo_kx.db.t SET id = id + 1")

    val out = Collection(spark, path).toDF().select($"id", $"s").orderBy($"id")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "a"), (3L, "b"), (4L, "c"), (5L, "d")), s"got $out")
  }

  test("UPDATE on a non-keyed collection rewrites only affected segments") {
    val wh = freshCatalog("rlo_cow")
    val path = s"$wh/db/t"
    // range-clustered ingest: 4 segments with disjoint id ranges
    spark.range(0, 4000).toDF("id").withColumn("v", lit(1.0))
      .repartitionByRange(4, col("id"))
      .write.format("hadro").mode("append").save(path)
    val before = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    assert(before.segments.size == 4)

    spark.sql("UPDATE rlo_cow.db.t SET v = 2.0 WHERE id BETWEEN 100 AND 110")

    val after = CollectionMeta.currentManifest(java.nio.file.Paths.get(path))
    val kept = before.segments.map(_.file).toSet
      .intersect(after.segments.map(_.file).toSet)
    assert(kept.size == 3,
      s"stats pruning must rewrite exactly the one affected segment; kept $kept")
    // carried rows of the rewritten segment survive; others untouched
    val out = spark.sql(
      "SELECT CAST(COUNT(*) AS LONG), CAST(SUM(v) AS DOUBLE) FROM rlo_cow.db.t")
      .as[(Long, Double)].head()
    assert(out == ((4000L, 4000.0 + 11.0)), s"got $out")
  }

  test("MERGE INTO a keyed collection: update + insert + delete branches") {
    val wh = freshCatalog("rlo_mg")
    val path = s"$wh/db/t"
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    Seq((1L, 11.0), (3L, -1.0), (4L, 40.0)).toDF("id", "v")
      .createOrReplaceTempView("rlo_mg_src")
    val verBefore = CollectionMeta.currentManifest(java.nio.file.Paths.get(path)).version

    spark.sql("""MERGE INTO rlo_mg.db.t t USING rlo_mg_src s ON t.id = s.id
      WHEN MATCHED AND s.v < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")

    assert(CollectionMeta.currentManifest(java.nio.file.Paths.get(path)).version
      == verBefore + 1, "one atomic commit for all three branches")
    val out = Collection(spark, path).toDF().select($"id", $"v").orderBy($"id")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 11.0), (2L, 20.0), (4L, 40.0)), s"got $out")
  }

  test("MERGE with NOT MATCHED BY SOURCE: delete + update branches") {
    val wh = freshCatalog("rlo_ms")
    val path = s"$wh/db/t"
    Seq((1L, 10.0), (2L, -5.0), (3L, 30.0), (4L, 40.0)).toDF("id", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    Seq((1L, 100.0), (5L, 50.0)).toDF("id", "v")
      .createOrReplaceTempView("rlo_ms_src")

    spark.sql("""MERGE INTO rlo_ms.db.t t USING rlo_ms_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
      WHEN NOT MATCHED BY SOURCE AND t.v < 0 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v + 1""")

    // 1 matched-updated, 2 deleted (v<0, no source match), 3/4 bumped,
    // 5 inserted
    val out = Collection(spark, path).toDF().select($"id", $"v").orderBy($"id")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 100.0), (3L, 31.0), (4L, 41.0), (5L, 50.0)), s"got $out")
  }

  test("MERGE INTO a non-keyed collection takes the CoW path") {
    val wh = freshCatalog("rlo_mgc")
    val path = s"$wh/db/t"
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("hadro").mode("append").save(path)
    Seq((2L, 22.0), (5L, 50.0)).toDF("id", "v")
      .createOrReplaceTempView("rlo_mgc_src")

    spark.sql("""MERGE INTO rlo_mgc.db.t t USING rlo_mgc_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")

    val out = spark.sql("SELECT id, v FROM rlo_mgc.db.t ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10.0), (2L, 22.0), (5L, 50.0)), s"got $out")
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target with the source's new column") {
    val wh = freshCatalog("rlo_se")
    val path = s"$wh/db/t"
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    // upstream grew a column: the CDC upsert source now carries `tag`
    Seq((2L, 22.0, "x"), (3L, 30.0, "y")).toDF("id", "v", "tag")
      .createOrReplaceTempView("rlo_se_src")

    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO rlo_se.db.t t
      USING rlo_se_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")

    // the widening is durable collection metadata, not a statement artifact
    val meta = CollectionMeta.readSchema(java.nio.file.Paths.get(path)).get
    assert(meta.schema.fieldNames.contains("tag"),
      s"schema not widened: ${meta.schema.simpleString}")
    // widened in place: old rows null-fill, merged rows carry the value
    // (resolved view — raw SQL scans keep shadowed versions, h32 shape)
    val out = Collection(spark, path).toDF()
      .select($"id", $"v", $"tag").orderBy($"id")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(out == Seq((1L, 10.0, None), (2L, 22.0, Some("x")),
      (3L, 30.0, Some("y"))), s"got $out")
  }

  test("MERGE schema evolution is conf-gated: no clause = frozen, and " +
      "spark.hadro.mergeSchema.rowLevel=false disables the clause too") {
    val wh = freshCatalog("rlo_sea")
    val path = s"$wh/db/t"
    Seq((1L, 10.0)).toDF("id", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    Seq((1L, 11.0, 7L), (4L, 40.0, 8L)).toDF("id", "v", "extra")
      .createOrReplaceTempView("rlo_sea_src")
    // WITHOUT the clause there is never evolution (Spark's own gate):
    // the merge flows, the extra source column does not reach the table
    spark.sql("""MERGE INTO rlo_sea.db.t t USING rlo_sea_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val meta0 = CollectionMeta.readSchema(java.nio.file.Paths.get(path)).get
    assert(!meta0.schema.fieldNames.contains("extra"),
      "plain MERGE must not evolve the schema")
    // conf=false: the table stops declaring the evolution capability, so
    // even the explicit clause leaves the schema frozen
    spark.conf.set("spark.hadro.mergeSchema.rowLevel", "false")
    try {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO rlo_sea.db.t t
        USING rlo_sea_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    } finally spark.conf.unset("spark.hadro.mergeSchema.rowLevel")
    val meta1 = CollectionMeta.readSchema(java.nio.file.Paths.get(path)).get
    assert(!meta1.schema.fieldNames.contains("extra"),
      "conf=false must disable WITH SCHEMA EVOLUTION")
    // default (conf unset = enabled): the clause widens
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO rlo_sea.db.t t
      USING rlo_sea_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val out = Collection(spark, path).toDF()
      .select($"id", $"v", $"extra").orderBy($"id")
      .as[(Long, Double, Option[Long])].collect().toSeq
    assert(out == Seq((1L, 11.0, Some(7L)), (4L, 40.0, Some(8L))), s"got $out")
  }

  test("MERGE WITH SCHEMA EVOLUTION widens a NON-keyed target too (CoW path)") {
    val wh = freshCatalog("rlo_sec")
    val path = s"$wh/db/t"
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("hadro").mode("append").save(path) // non-keyed -> CoW
    Seq((2L, 22.0, "x"), (5L, 50.0, "y")).toDF("id", "v", "tag")
      .createOrReplaceTempView("rlo_sec_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO rlo_sec.db.t t
      USING rlo_sec_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(CollectionMeta.readSchema(java.nio.file.Paths.get(path)).get
      .schema.fieldNames.contains("tag"))
    // CoW: plain SQL read IS the resolved view for non-keyed tables
    val out = spark.sql("SELECT id, v, tag FROM rlo_sec.db.t ORDER BY id")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(out == Seq((1L, 10.0, None), (2L, 22.0, Some("x")),
      (5L, 50.0, Some("y"))), s"got $out")
  }

  test("MERGE schema evolution refusals stay intact: reserved names and " +
      "non-widening type changes") {
    val wh = freshCatalog("rlo_ser")
    val path = s"$wh/db/t"
    Seq((1L, 10.0)).toDF("id", "v")
      .write.format("hadro").mode("append").option("hadro.key", "id").save(path)
    // reserved-name column can never be merged in
    Seq((1L, 11.0, "z")).toDF("id", "v", "_hadro_seq")
      .createOrReplaceTempView("rlo_ser_bad")
    intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO rlo_ser.db.t t
        USING rlo_ser_bad s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *""")
    }
    // a type CHANGE to an existing column is not additive evolution
    Seq((1L, "not a double")).toDF("id", "v")
      .createOrReplaceTempView("rlo_ser_ty")
    intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO rlo_ser.db.t t
        USING rlo_ser_ty s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *""")
    }
    // the collection is unharmed
    val out = spark.sql("SELECT id, v FROM rlo_ser.db.t ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10.0)), s"got $out")
  }

  test("DELETE with a subquery predicate routes through the row-level path") {
    val wh = freshCatalog("rlo_dq")
    val path = s"$wh/db/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.format("hadro").mode("append").save(path) // non-keyed → CoW
    Seq(2L, 3L).toDF("id").createOrReplaceTempView("rlo_dq_bad")

    spark.sql("DELETE FROM rlo_dq.db.t WHERE id IN (SELECT id FROM rlo_dq_bad)")

    val out = spark.sql("SELECT id FROM rlo_dq.db.t ORDER BY id")
      .as[Long].collect().toSeq
    assert(out == Seq(1L), s"got $out")
  }

  test("complex-typed literals are rejected at canDelete, not at runtime") {
    import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Lit}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.ArrayData
    // equality against an ARRAY literal: functions.lit cannot rebuild the
    // converted Seq, so translation must fail HERE (canDelete → false →
    // Spark's standard analysis error), never later inside deleteWhere
    val arrayLit = new V2Lit[Any] {
      override def value: Any = ArrayData.toArrayData(Array(1, 2))
      override def dataType: DataType = ArrayType(IntegerType)
    }
    val arrayEq = new Predicate("=", Array(Expressions.column("tags"), arrayLit))
    assert(HadroDeleteSupport.toV1(arrayEq).isEmpty)
    assert(!HadroDeleteSupport.canDelete(Array(arrayEq)))
    // the atomic shapes still translate
    val intEq = new Predicate("=", Array(
      Expressions.column("id"), Expressions.literal(7)))
    assert(HadroDeleteSupport.canDelete(Array(intEq)))
  }
}
