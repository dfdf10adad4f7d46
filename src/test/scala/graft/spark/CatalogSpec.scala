package graft.spark

import java.nio.file.Files

import graft.SparkSuite

/** SQL-name access to hadro collections via the DSv2 TableCatalog. */
class CatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.testcat", classOf[HadroCatalog].getName)
    spark.conf.set("spark.sql.catalog.testcat.warehouse", w)
    w
  }

  test("CREATE TABLE / INSERT INTO / SELECT / DROP round-trip via SQL names") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db")
    spark.sql("CREATE TABLE testcat.db.books (title STRING, author STRING) USING hadro")
    spark.sql("INSERT INTO testcat.db.books VALUES ('dune', 'herbert'), ('hamlet', 'shakespeare')")
    val rows = spark.sql("SELECT title, author FROM testcat.db.books ORDER BY title")
      .as[(String, String)].collect()
    assert(rows.toSeq == Seq(("dune", "herbert"), ("hamlet", "shakespeare")))

    // SHOW TABLES sees it; DROP removes it
    assert(spark.sql("SHOW TABLES IN testcat.db").collect().map(_.getString(1)).contains("books"))
    spark.sql("DROP TABLE testcat.db.books")
    assert(!spark.sql("SHOW TABLES IN testcat.db").collect().map(_.getString(1)).contains("books"))
  }

  test("catalog tables and path API address the same collection") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db")
    spark.sql("CREATE TABLE testcat.db.nums (id BIGINT, v DOUBLE) USING hadro")
    spark.sql("INSERT INTO testcat.db.nums SELECT id, id * 1.5 FROM range(10)")
    // same collection via the path-based reader, with pushdown and all
    val viaPath = spark.read.format("hadro").load(s"$warehouse/db/nums")
    assert(viaPath.count() == 10)
    assert(viaPath.filter($"id" === 3L).select($"v").as[Double].head() == 4.5)
    // and keyed Collection handles work on top of it too
    val c = graft.api.Collection(spark, s"$warehouse/db/nums")
    assert(c.count() == 10)
  }

  test("read options (time travel) work through catalog identifiers") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db")
    spark.sql("CREATE TABLE testcat.db.tt (id BIGINT) USING hadro")
    spark.sql("INSERT INTO testcat.db.tt SELECT id FROM range(5)")
    val v1 = graft.meta.CollectionMeta
      .currentManifest(java.nio.file.Paths.get(s"$warehouse/db/tt")).version
    spark.sql("INSERT INTO testcat.db.tt SELECT id FROM range(5, 10)")
    assert(spark.table("testcat.db.tt").count() == 10)
    val snapshot = spark.read.option("hadro.versionAsOf", v1).table("testcat.db.tt")
    assert(snapshot.count() == 5)
    spark.sql("DROP TABLE testcat.db.tt")
  }

  test("schema contract: additive ALTER evolves, destructive ALTER and duplicate CREATE fail") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db")
    spark.sql("CREATE TABLE testcat.db.fixed (a INT) USING hadro")
    // additive nullable evolution is in-place (EvolutionSpec covers data)
    spark.sql("ALTER TABLE testcat.db.fixed ADD COLUMN b INT")
    assert(spark.table("testcat.db.fixed").schema.fieldNames.sameElements(Array("a", "b")))
    // destructive changes would invalidate persisted segment bytes
    intercept[Exception](spark.sql("ALTER TABLE testcat.db.fixed DROP COLUMN a"))
    intercept[Exception](spark.sql("ALTER TABLE testcat.db.fixed RENAME COLUMN a TO z"))
    intercept[Exception](spark.sql("CREATE TABLE testcat.db.fixed (a INT) USING hadro"))
    spark.sql("DROP TABLE testcat.db.fixed")
  }
}
