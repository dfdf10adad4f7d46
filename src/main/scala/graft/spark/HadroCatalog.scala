package graft.spark

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.CollectionMeta

/** DSv2 TableCatalog over a warehouse directory of hadro collections, so
  * pure-SQL users address collections by NAME instead of path:
  *
  * {{{
  * spark.sql.catalog.graft=graft.spark.HadroCatalog
  * spark.sql.catalog.graft.warehouse=/data/graft
  *
  * CREATE TABLE graft.db.events (id BIGINT, v DOUBLE) USING hadro;
  * INSERT INTO graft.db.events VALUES (1, 2.0);
  * SELECT * FROM graft.db.events;
  * DROP TABLE graft.db.events;
  * }}}
  *
  * Layout: `<warehouse>/<namespace...>/<table>` is one collection directory
  * (`_hadro/` metadata + segments). A table exists iff its collection has a
  * persisted schema — no separate catalog state to drift out of sync.
  * The catalog resolves names to the SAME [[HadroTable]] the path-based
  * `format("hadro")` API uses, so every capability (pushdown, stats,
  * streaming, time travel options) carries over unchanged. */
class HadroCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.warehouse=<dir>")
    warehouse = Paths.get(w)
    Files.createDirectories(warehouse)
  }

  override def name(): String = catalogName

  /** Declares column-DEFAULT support so the analyzer accepts
    * `ADD COLUMN ... DEFAULT <expr>` for hadro tables and fills INSERTs
    * that omit a defaulted column from the schema's CURRENT_DEFAULT. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def tableDir(ident: Identifier): Path =
    ident.namespace().foldLeft(warehouse)(_ resolve _).resolve(ident.name())

  private def isTable(dir: Path): Boolean =
    CollectionMeta.readSchema(dir).isDefined

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(_ resolve _)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    CollectionMeta.listDir(dir)
      .filter(p => Files.isDirectory(p) && isTable(p))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) {
      // Iceberg-style METADATA TABLES: `SELECT * FROM cat.db.t.files` /
      // `.history` — the identifier parses as namespace [db, t] + name
      // "files". Resolved only when the base really is a table, so a
      // genuine missing-table error is unchanged.
      val ns = ident.namespace()
      if (ns.nonEmpty && HadroMetadataTable.kinds(ident.name().toLowerCase)) {
        val baseDir = tableDir(Identifier.of(ns.init, ns.last))
        if (isTable(baseDir))
          return new HadroMetadataTable(baseDir, ident.name().toLowerCase)
      }
      throw new NoSuchTableException(ident)
    }
    new HadroTable(dir,
      HadroTable.reportedSchema(CollectionMeta.readSchema(dir).get),
      viaCatalog = true)
  }

  /** SQL time travel, version form: `SELECT ... FROM t VERSION AS OF 3` or
    * `VERSION AS OF 'release-2026-08'`. A numeric version is a manifest
    * version (monotonic commit counter, the same number
    * [[graft.api.Collection.version]] returns); a non-numeric string is a
    * named TAG (`CALL system.create_tag`) resolved through `refs.json`.
    * Fails fast with the retained range when the version was GC'd or
    * crosses a compaction — tagged versions never are (pinned). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException =>
          CollectionMeta.readRefs(dir).getOrElse(version,
            throw new IllegalArgumentException(
              s"hadro: VERSION AS OF expects a numeric manifest version or " +
                s"a tag name, got '$version' (tags: " +
                s"${CollectionMeta.readRefs(dir).keys.toSeq.sorted.mkString(", ")})"))
      }
    CollectionMeta.manifestAt(dir, v) // validates retention + reconstructability
    new HadroTable(dir,
      HadroTable.reportedSchema(CollectionMeta.readSchema(dir).get),
      viaCatalog = true, pinnedVersion = Some(v))
  }

  /** SQL time travel, instant form: `SELECT ... FROM t TIMESTAMP AS OF
    * '2026-01-01 00:00:00'`. Spark hands the instant as microseconds since
    * epoch; it resolves to the newest retained version committed at or
    * before it (commit times are stamped in the manifest). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = CollectionMeta.versionAsOfTimestamp(dir, timestamp)
    CollectionMeta.manifestAt(dir, v)
    new HadroTable(dir,
      HadroTable.reportedSchema(CollectionMeta.readSchema(dir).get),
      viaCatalog = true, pinnedVersion = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    // Two declarable layouts:
    //   CREATE TABLE t (...) USING hadro PARTITIONED BY (bucket(8, k))
    //     — storage bucketing: writes route rows to per-bucket segments
    //       and scans report KeyGroupedPartitioning (storage-partitioned
    //       joins).
    //   CREATE TABLE t (...) USING hadro PARTITIONED BY (days(ts))
    //     — value partitioning (identity/years/months/days/hours): writes
    //       route rows to one segment per transform VALUE, so segment
    //       min/max stats on the source column become one-partition tight
    //       and the stats skipper prunes time-range scans to exactly the
    //       matching partitions. The 100 TB event-log layout.
    // Multi-transform specs stay rejected — one declared dimension;
    // further clustering comes from write order + cluster().
    var bucketSpec: Option[(Seq[String], Int)] = None
    var partitionSpec: Option[(String, String)] = None // (col, transform)
    partitions.toSeq match {
      case Seq() => ()
      case Seq(t) if t.name() == "bucket" =>
        val cols = t.references().flatMap(_.fieldNames()).toSeq
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Number] => l.value().asInstanceOf[Number].intValue()
        }
        require(cols.nonEmpty && n.isDefined,
          s"hadro: bucket transform must be bucket(<n>, <col>[, <col>...]), got $t")
        cols.foreach { c =>
          val f = schema.fields.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"hadro: bucket column '$c' not in schema ${schema.simpleString}"))
          f.dataType match {
            case LongType | IntegerType | StringType => ()
            case dt => throw new IllegalArgumentException(
              s"hadro: bucketBy supports long/int/string columns, '$c' is ${dt.simpleString}")
          }
        }
        bucketSpec = Some((cols, n.get))
      case Seq(t) if HadroPartition.Transforms.contains(t.name()) =>
        val cols = t.references().flatMap(_.fieldNames()).toSeq
        require(cols.length == 1,
          s"hadro: ${t.name()} partition transform takes one column, got $t")
        HadroPartition.validate(schema, cols.head, t.name())
        partitionSpec = Some((cols.head, t.name()))
      case _ => throw new IllegalArgumentException(
        "hadro: PARTITIONED BY supports a single bucket(<n>, <col>...), " +
          "identity (<col>), or years/months/days/hours(<ts>) transform; " +
          "tables otherwise cluster by write partitioning")
    }
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    Files.createDirectories(dir)
    val key = Option(properties.get("key")).filter(_.nonEmpty)
    key.foreach(k => require(schema.fieldNames.contains(k),
      s"key '$k' not in schema ${schema.simpleString}"))
    // `TBLPROPERTIES('compress'='zstd')` / OPTIONS: per-record payload
    // compression, fixed at creation (see SchemaMeta.compress)
    val compress = Option(properties.get("compress")).filter(_.nonEmpty)
      .filterNot(_.equalsIgnoreCase("none")).map(_.toLowerCase)
    compress.foreach(c => require(c == "zstd" || c == "zstd-dict",
      s"compress must be zstd|zstd-dict|none, got '$c'"))
    // CHECK constraints: TBLPROPERTIES ('constraint.<name>' = '<expr>') —
    // validated through the full analyzer BEFORE the schema persists, so
    // a bad constraint fails the CREATE cleanly instead of leaving a
    // ghost table behind.
    val constraintProps = properties.asScala.toSeq.collect {
      case (k, v) if k.startsWith("constraint.") && k.length > "constraint.".length =>
        k.stripPrefix("constraint.") -> v
    }
    constraintProps.foreach { case (n, text) =>
      HadroWriteInit.bindConstraint(schema, n, text)
    }
    // Declared write order: TBLPROPERTIES ('sortedBy' = '<col>') — every
    // catalog batch write then requires a within-partition sort on it
    // (RequiresDistributionAndOrdering), keeping segments range-sorted
    // and the manifest's sortedBy declaration alive with zero manual
    // cluster() calls. Validated here so a typo fails the CREATE.
    val sortedBy = Option(properties.get("sortedBy")).filter(_.nonEmpty)
    sortedBy.foreach(HadroCatalog.validateWriteOrder(schema, _))
    CollectionMeta.writeSchema(dir, schema, key,
      bucketSpec.map(_._1.mkString(",")), bucketSpec.map(_._2), compress,
      partitionSpec.map(_._1), partitionSpec.map(_._2))
    sortedBy.foreach(c => CollectionMeta.writeWriteOrder(dir, Some(c)))
    if (constraintProps.nonEmpty)
      CollectionMeta.writeConstraints(dir, constraintProps.toMap)
    new HadroTable(dir,
      HadroTable.reportedSchema(CollectionMeta.readSchema(dir).get),
      viaCatalog = true)
  }

  /** ALTER TABLE: in-place, metadata-only evolution — ADD COLUMN
    * (nullable; old segments null-fill via write-time width), RENAME
    * COLUMN (positional decode never references names; stats and index
    * declarations are remapped in one manifest commit), and DROP COLUMN
    * (the physical slot stays under a reserved invisible name so decode
    * can skip its bytes forever; see [[graft.api.Collection.dropColumn]]).
    * Type changes would invalidate persisted bytes and need a rewrite. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "hadro: only top-level ADD COLUMN is supported")
        require(add.isNullable,
          "hadro: added columns must be nullable (existing rows have no value)")
        // ADD COLUMN ... DEFAULT <expr>: the parsed SQL text rides in the
        // change; Collection.addColumn freezes its folded literal into the
        // field metadata (EXISTS_DEFAULT back-fill + CURRENT_DEFAULT
        // insert-fill) and keeps key/bucket declarations intact.
        graft.api.Collection(org.apache.spark.sql.SparkSession.active, dir.toString)
          .addColumn(add.fieldNames().head, add.dataType(),
            Option(add.defaultValue()).flatMap(d => Option(d.getSql)))
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames().length == 1,
          "hadro: only top-level RENAME COLUMN is supported")
        graft.api.Collection(org.apache.spark.sql.SparkSession.active, dir.toString)
          .renameColumn(rn.fieldNames().head, rn.newName())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "hadro: only top-level DROP COLUMN is supported")
        graft.api.Collection(org.apache.spark.sql.SparkSession.active, dir.toString)
          .dropColumn(del.fieldNames().head)
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames().length == 1,
          "hadro: only top-level ALTER COLUMN TYPE is supported")
        graft.api.Collection(org.apache.spark.sql.SparkSession.active, dir.toString)
          .widenColumn(ut.fieldNames().head, ut.newDataType())
      case sp: TableChange.SetProperty if sp.property == "sortedBy" =>
        val meta = CollectionMeta.readSchema(dir).getOrElse(
          throw new NoSuchTableException(ident))
        HadroCatalog.validateWriteOrder(
          org.apache.spark.sql.types.StructType(
            meta.schema.fields.filterNot(CollectionMeta.isDropped)), sp.value)
        CollectionMeta.writeWriteOrder(dir, Some(sp.value))
      case rp: TableChange.RemoveProperty if rp.property == "sortedBy" =>
        CollectionMeta.writeWriteOrder(dir, None)
      case sp: TableChange.SetProperty if sp.property.startsWith("constraint.") =>
        // ALTER TABLE t SET TBLPROPERTIES ('constraint.<n>' = '<expr>'):
        // analyzer-validated AND retro-checked against existing rows (one
        // distributed scan) before it publishes.
        graft.api.Collection(org.apache.spark.sql.SparkSession.active, dir.toString)
          .addConstraint(sp.property.stripPrefix("constraint."), sp.value)
      case rp: TableChange.RemoveProperty if rp.property.startsWith("constraint.") =>
        graft.api.Collection(org.apache.spark.sql.SparkSession.active, dir.toString)
          .dropConstraint(rp.property.stripPrefix("constraint."))
      case other =>
        throw new UnsupportedOperationException(
          s"hadro: unsupported ALTER TABLE change $other — rename/drop/add " +
            "and safe type WIDENING evolve in place; anything else needs a rewrite")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) return false
    deleteRecursively(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    CollectionMeta.listDir(warehouse)
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => Array(p.getFileName.toString))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = namespace.foldLeft(warehouse)(_ resolve _)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    CollectionMeta.listDir(dir)
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    val dir = namespace.foldLeft(warehouse)(_ resolve _)
    if (!Files.isDirectory(dir) || isTable(dir)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    Files.createDirectories(namespace.foldLeft(warehouse)(_ resolve _))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("hadro: namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(warehouse)(_ resolve _)
    if (!Files.isDirectory(dir)) return false
    if (!cascade && CollectionMeta.listDir(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    deleteRecursively(dir)
    true
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      CollectionMeta.listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // ---------------------------------------------------------- functions
  // FunctionCatalog exists for TWO reasons: (1) scans of bucketed
  // collections report `bucket(n, col)` KeyGroupedPartitioning, and Spark
  // resolves that transform against the relation's function catalog —
  // without this, the reported partitioning is silently dropped and
  // storage-partitioned joins never engage; (2) writes into a
  // time-partitioned table require a distribution clustered by the
  // declared transform (`days(ts)`), which the planner likewise resolves
  // here before it can plan the shuffle.

  private val timeTransforms = Seq("years", "months", "days", "hours")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    ("bucket" +: timeTransforms)
      .map(n => Identifier.of(Array.empty[String], n)).toArray

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket") && ident.namespace().isEmpty)
      HadroBucketFunction
    else if (ident.namespace().isEmpty &&
        timeTransforms.contains(ident.name().toLowerCase))
      new HadroTimeTransformFunction(ident.name().toLowerCase)
    else throw new NoSuchFunctionException(ident)

  // --------------------------------------------------------- procedures
  // SQL maintenance: `CALL <catalog>.system.<proc>('ns.table', ...)` —
  // compaction, bin-packing, clustering, index rebuilds, vacuum. Bodies in
  // [[HadroProcedures]]; table-name resolution reuses this catalog's rules.

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      HadroProcedures.names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"hadro: procedures live in the 'system' namespace " +
        s"(CALL $catalogName.system.<proc>), got $ident")
    def dirOf(tbl: String): Path = {
      val parts = tbl.split("\\.").toSeq
      require(parts.nonEmpty && parts.forall(_.nonEmpty),
        s"hadro: procedure table argument must be 'ns.table', got '$tbl'")
      tableDir(Identifier.of(parts.init.toArray, parts.last))
    }
    HadroProcedures.load(ident.name(), catalogName, { tbl =>
      val dir = dirOf(tbl)
      if (!isTable(dir)) {
        val parts = tbl.split("\\.").toSeq
        throw new NoSuchTableException(Identifier.of(parts.init.toArray, parts.last))
      }
      dir
    }, dirOf)
  }
}

/** `bucket(n, key) = floorMod(xxhash64(key), n)` — the SAME formula the
  * writer tags segments with (`HadroDataWriter.bucketOf`) and the same
  * xxhash64 (seed 42) users co-partition shuffles with. Spark binds this
  * when resolving a bucketed scan's reported partitioning; the
  * canonicalName ties the two sides of a storage-partitioned join
  * together (equal name + equal numBuckets = co-partitioned). */
object HadroCatalog {
  /** Validates a declared write order ("c1[, c2...]"): every column must
    * exist in the (logical) schema and be orderable. */
  private[spark] def validateWriteOrder(schema: StructType, spec: String): Unit = {
    val cols = spec.split(",").map(_.trim).filter(_.nonEmpty)
    require(cols.nonEmpty, "hadro: sortedBy must name at least one column")
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"hadro: sortedBy column '$c' not in schema ${schema.simpleString}"))
      require(graft.format.StatsCollector.isOrderable(f.dataType),
        s"hadro: sortedBy column '$c' must be orderable, is ${f.dataType.simpleString}")
    }
  }
}

object HadroBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): floorMod(xxhash64(col), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket expects (numBuckets, col...), got ${inputType.simpleString}")
    val keyTypes = inputType.fields.drop(1).map(_.dataType).toSeq
    keyTypes.foreach {
      case LongType | IntegerType | StringType => ()
      case dt => throw new UnsupportedOperationException(
        s"hadro bucket: unsupported key type ${dt.simpleString}")
    }
    new HadroBucketBound(keyTypes)
  }
}

final class HadroBucketBound(keyTypes: Seq[DataType])
    extends ScalarFunction[java.lang.Integer] {
  override def inputTypes(): Array[DataType] = IntegerType +: keyTypes.toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.hadro.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): java.lang.Integer = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = input.getInt(0)
    var h = 42L // xxhash64 fold: seed chains left-to-right, nulls skip
    keyTypes.zipWithIndex.foreach { case (kt, i) =>
      if (!input.isNullAt(i + 1))
        h = kt match {
          case LongType => XXH64.hashLong(input.getLong(i + 1), h)
          case IntegerType => XXH64.hashInt(input.getInt(i + 1), h)
          case _ => XXH64.hashUTF8String(input.getUTF8String(i + 1), h)
        }
    }
    java.lang.Math.floorMod(h, n.toLong).toInt
  }
}

/** Read-only SQL METADATA TABLES over a collection's manifest state —
  * `SELECT * FROM cat.db.t.files` / `cat.db.t.history` (Iceberg's
  * metadata-table shape): the per-segment physical inventory and the
  * commit audit as plain queryable relations, no CALL needed. Rows come
  * straight from manifest JSON on the driver (metadata-scale: O(#segments)
  * and O(retained versions) — never data-proportional), served via a
  * local scan like the procedures' results. */
final class HadroMetadataTable(dir: Path, kind: String) extends Table
    with SupportsRead {
  import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
  import org.apache.spark.unsafe.types.UTF8String

  override def name(): String = s"$dir#$kind"
  override def schema(): StructType = HadroMetadataTable.schemas(kind)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = schema()
        override def rows(): Array[InternalRow] = kind match {
          case "files" =>
            CollectionMeta.currentManifest(dir).segments.map { s =>
              InternalRow(
                UTF8String.fromString(s.file), s.ordinal, s.rows,
                s.tombstones, s.dvDeletes, s.bytes,
                s.bucket.map(Int.box).orNull,
                s.partition.map(UTF8String.fromString).orNull,
                s.deleteVector.map(UTF8String.fromString).orNull)
            }.toArray
          case "history" =>
            // branch column: null = main-line commit; a name = staged
            // write-audit-publish snapshot (invisible to main readers)
            CollectionMeta.retainedManifests(dir).sortBy(-_.version).map { m =>
              InternalRow(m.version, m.segments.size.toLong,
                m.segments.map(s => s.rows - s.tombstones - s.dvDeletes).sum,
                m.segments.map(_.bytes).sum, m.mutated, m.generation,
                m.committedAtMs,
                m.branch.map(UTF8String.fromString).orNull)
            }.toArray
          case "detail" =>
            // DESCRIBE DETAIL analog: one row of table-level facts
            val m = CollectionMeta.currentManifest(dir)
            val meta = CollectionMeta.readSchema(dir)
            Array(InternalRow(
              UTF8String.fromString(dir.toString),
              m.version, m.generation,
              m.segments.size.toLong,
              m.segments.map(s => s.rows - s.tombstones - s.dvDeletes).sum,
              m.segments.map(_.bytes).sum,
              meta.flatMap(_.keyField).map(UTF8String.fromString).orNull,
              meta.flatMap(_.compress).map(UTF8String.fromString).orNull,
              m.sortedBy.map(UTF8String.fromString).orNull,
              m.bucketBy.map(UTF8String.fromString).orNull,
              m.numBuckets.map(Int.box).orNull,
              meta.flatMap(_.partitionBy).map(UTF8String.fromString).orNull,
              meta.flatMap(_.partitionTransform).map(UTF8String.fromString).orNull,
              meta.map(_.priorPartitionTransforms).filter(_.nonEmpty)
                .map(h => UTF8String.fromString(h.mkString(","))).orNull,
              CollectionMeta.readConstraints(dir).size,
              CollectionMeta.readRefs(dir).size,
              m.committedAtMs))
          case "blocks" =>
            // per-block stats inventory (multi-block segments only): one
            // row per (split range, column) — the observability face of
            // intra-segment pruning. Metadata-scale: manifest JSON only.
            CollectionMeta.currentManifest(dir).segments
              .filter(s => s.blockStats.length == s.splits.length + 1)
              .flatMap { s =>
                val starts = graft.meta.SplitPoint(0L, 0L) +: s.splits
                s.blockStats.zipWithIndex.flatMap { case (bs, i) =>
                  val rows = (if (i + 1 < starts.length) starts(i + 1).row
                    else s.rows) - starts(i).row
                  bs.toSeq.sortBy(_._1).map { case (c, cs) =>
                    InternalRow(UTF8String.fromString(s.file), i,
                      starts(i).row, rows, UTF8String.fromString(c),
                      cs.min.map(UTF8String.fromString).orNull,
                      cs.max.map(UTF8String.fromString).orNull,
                      cs.nullCount)
                  }
                }
              }.toArray
          case "partitions" =>
            // per-partition physical inventory: the observability face of
            // partition routing — one row per live value-partition tag
            // (untagged segments roll up under a NULL partition). The
            // numbers a user needs before a drop_partitions/overwrite/
            // compact_partitions decision, straight from manifest JSON.
            CollectionMeta.currentManifest(dir).segments
              .groupBy(_.partition).toSeq
              .sortBy { case (t, _) => (t.isEmpty, t.getOrElse("")) }
              .map { case (tag, ss) =>
                InternalRow(
                  tag.map(UTF8String.fromString).orNull,
                  ss.size.toLong,
                  ss.map(s => s.rows - s.tombstones - s.dvDeletes).sum,
                  ss.map(_.tombstones).sum, ss.map(_.dvDeletes).sum,
                  ss.map(_.bytes).sum,
                  ss.map(_.ordinal).min, ss.map(_.ordinal).max)
              }.toArray
          case "constraints" =>
            CollectionMeta.readConstraints(dir).toSeq.sortBy(_._1).map {
              case (n, text) =>
                InternalRow(UTF8String.fromString(n), UTF8String.fromString(text))
            }.toArray
          case "refs" =>
            // named refs (tags + branch heads), pinned-version metadata
            // joined from the manifest; kind distinguishes the two
            val branchBases = CollectionMeta.readBranches(dir)
            CollectionMeta.readRefs(dir).toSeq.sortBy(_._1).map {
              case (name, v) =>
                val at = try Some(CollectionMeta.manifestAt(dir, v))
                  catch { case _: Exception => None }
                InternalRow(UTF8String.fromString(name), v,
                  at.map(m => Long.box(m.committedAtMs)).orNull,
                  at.map(m => Long.box(
                    m.segments.map(s => s.rows - s.tombstones - s.dvDeletes).sum))
                    .orNull,
                  UTF8String.fromString(
                    if (branchBases.contains(name)) "branch" else "tag"),
                  branchBases.get(name).map(Long.box).orNull)
            }.toArray
          case "consumers" =>
            // per-CURSOR-TAG consumer-lag dashboard (the loop_health verb
            // as a queryable relation): one row per tag (branch heads are
            // writers, not consumers — excluded) with the head version,
            // the version lag, the WALL-CLOCK lag derived from commit
            // timestamps, and the registered consumer STATE directory
            // (componentsCycle's tag→state registry; NULL for plain
            // snapshot pins) — `SELECT * FROM cat.db.pairs.consumers`
            // answers "which nightly consumer fell behind, by how long,
            // and into which state does it fold" without a CALL.
            // Metadata-scale: refs/consumers JSON + two manifests.
            val head = CollectionMeta.currentManifest(dir)
            val registry = CollectionMeta.readConsumers(dir)
            CollectionMeta.cursorTags(dir).toSeq
              .sortBy(_._1).map { case (name, v) =>
                val at = try Some(CollectionMeta.manifestAt(dir, v))
                  catch { case _: Exception => None }
                InternalRow(UTF8String.fromString(name), v, head.version,
                  head.version - v,
                  at.map(m => Long.box(m.committedAtMs)).orNull,
                  head.committedAtMs,
                  at.map(m => Long.box(
                    math.max(0L, head.committedAtMs - m.committedAtMs)))
                    .orNull,
                  registry.get(name).map(UTF8String.fromString).orNull)
              }.toArray
          case "stats" =>
            // ANALYZE output (`CALL system.analyze`), schema field order
            val m = CollectionMeta.currentManifest(dir)
            val logical = CollectionMeta.readSchema(dir)
              .map(s => CollectionMeta.logicalSchema(s.schema))
              .map(_.fieldNames.toSeq).getOrElse(Seq.empty)
            logical.flatMap(name => m.colStats.get(name).map { cs =>
              def render(l: Option[Long], d: Option[Double]) =
                l.map(_.toString).orElse(d.map(_.toString))
                  .map(UTF8String.fromString).orNull
              InternalRow(UTF8String.fromString(name), cs.distinctCount,
                cs.nullCount, cs.avgLen, cs.maxLen,
                render(cs.minLong, cs.minDouble),
                render(cs.maxLong, cs.maxDouble),
                m.analyzedVersion)
            }).toArray
        }
      }
    }
}

object HadroMetadataTable {
  import org.apache.spark.sql.types.BooleanType
  val schemas: Map[String, StructType] = Map(
    "files" -> new StructType()
      .add("file", StringType).add("ordinal", LongType)
      .add("n_rows", LongType).add("n_tombstones", LongType)
      .add("n_dv_deletes", LongType).add("n_bytes", LongType)
      .add("bucket", IntegerType).add("partition", StringType)
      .add("delete_vector", StringType),
    "history" -> new StructType()
      .add("version", LongType).add("n_segments", LongType)
      .add("n_rows", LongType).add("n_bytes", LongType)
      .add("mutated", BooleanType).add("generation", LongType)
      .add("committed_at_ms", LongType).add("branch", StringType),
    "stats" -> new StructType()
      .add("column", StringType).add("ndv", LongType)
      .add("null_count", LongType).add("avg_len", LongType)
      .add("max_len", LongType).add("min_value", StringType)
      .add("max_value", StringType).add("analyzed_version", LongType),
    "refs" -> new StructType()
      .add("tag", StringType).add("version", LongType)
      .add("committed_at_ms", LongType).add("n_rows", LongType)
      .add("kind", StringType).add("fork_base", LongType),
    "blocks" -> new StructType()
      .add("file", StringType).add("block_idx", IntegerType)
      .add("start_row", LongType).add("n_rows", LongType)
      .add("column", StringType).add("min_value", StringType)
      .add("max_value", StringType).add("null_count", LongType),
    "partitions" -> new StructType()
      .add("partition", StringType).add("n_segments", LongType)
      .add("n_rows", LongType).add("n_tombstones", LongType)
      .add("n_dv_deletes", LongType).add("n_bytes", LongType)
      .add("min_ordinal", LongType).add("max_ordinal", LongType),
    "constraints" -> new StructType()
      .add("name", StringType).add("expression", StringType),
    "consumers" -> new StructType()
      .add("tag", StringType).add("version", LongType)
      .add("head_version", LongType).add("lag", LongType)
      .add("pinned_at_ms", LongType).add("head_at_ms", LongType)
      .add("lag_ms", LongType).add("state_dir", StringType),
    "detail" -> new StructType()
      .add("location", StringType).add("version", LongType)
      .add("generation", LongType).add("n_segments", LongType)
      .add("n_rows", LongType).add("n_bytes", LongType)
      .add("key", StringType).add("compress", StringType)
      .add("sorted_by", StringType).add("bucket_by", StringType)
      .add("num_buckets", IntegerType).add("partition_by", StringType)
      .add("partition_transform", StringType)
      .add("prior_partition_transforms", StringType)
      .add("n_constraints", IntegerType)
      .add("n_tags", IntegerType).add("committed_at_ms", LongType))
  val kinds: Set[String] = schemas.keySet
}
