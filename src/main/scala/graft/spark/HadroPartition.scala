package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Declared value partitioning (`PARTITIONED BY (days(ts))`, `(region)`):
  * the shared transform semantics used by CREATE-time validation
  * ([[HadroCatalog.createTable]]), writer-side routing
  * ([[HadroDataWriter]] — one open segment per transform value a task
  * sees), and the catalog-resolved V2 functions Spark binds when it
  * clusters an INSERT's input by the transform.
  *
  * The engine deliberately does NOT grow a partition-aware scan path:
  * routing by transform value makes each segment's existing min/max
  * stats on the source column one-partition tight, so the stats-based
  * segment skipper prunes `ts >= X AND ts < Y` to exactly the matching
  * partitions with zero new read-side code. At 100 TB that is the
  * Iceberg observation — partition pruning IS stats pruning once the
  * layout guarantees value-disjoint files. */
private[graft] object HadroPartition {

  val Transforms: Set[String] = Set("identity", "years", "months", "days", "hours")

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** CREATE-time type rules: time transforms need a time-typed source
    * (`hours` needs sub-day resolution, so timestamp only); identity
    * takes any segment-stats-comparable scalar. */
  def validate(schema: StructType, col: String, transform: String): Unit = {
    require(Transforms.contains(transform),
      s"hadro: unsupported partition transform '$transform' " +
        s"(supported: ${Transforms.toSeq.sorted.mkString(", ")})")
    val f = schema.fields.find(_.name == col).getOrElse(
      throw new IllegalArgumentException(
        s"hadro: partition column '$col' not in schema ${schema.simpleString}"))
    (transform, f.dataType) match {
      case ("identity", LongType | IntegerType | StringType | DateType) => ()
      case ("hours", TimestampType | TimestampNTZType) => ()
      case ("years" | "months" | "days",
        TimestampType | TimestampNTZType | DateType) => ()
      case (t, dt) => throw new IllegalArgumentException(
        s"hadro: partition transform $t($col) does not support " +
          s"${dt.simpleString} (identity: long/int/string/date; " +
          "years/months/days: timestamp/date; hours: timestamp)")
    }
  }

  private def epochDaysToMonths(epochDays: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(epochDays)
    (d.getYear - 1970L) * 12L + (d.getMonthValue - 1L)
  }

  /** Identity-string tag: cap pathological identity strings — two values
    * sharing a truncated tag merely share a segment, never a result.
    * Shared with the partition-management surface so a DROP PARTITION
    * identifier maps to the exact tag the writer produced. */
  def stringTag(s: String): String =
    if (s.length <= 48) s else s.take(40) + "~" + Integer.toHexString(s.hashCode)

  /** Transform value for one row, as the segment tag. Deterministic and
    * engine-internal — only EQUALITY matters (equal value = same
    * segment); pruning reads the source column's stats, not the tag. */
  def tagOf(dt: DataType, row: InternalRow, ord: Int, transform: String): String = {
    if (row.isNullAt(ord)) return "__null__"
    def micros: Long = row.getLong(ord) // timestamp internal repr
    (transform, dt) match {
      case ("identity", LongType) => row.getLong(ord).toString
      case ("identity", IntegerType | DateType) => row.getInt(ord).toString
      case ("identity", StringType) => stringTag(row.getUTF8String(ord).toString)
      case ("days", DateType) => row.getInt(ord).toString
      case ("days", _) => java.lang.Math.floorDiv(micros, MicrosPerDay).toString
      case ("hours", _) => java.lang.Math.floorDiv(micros, MicrosPerHour).toString
      case ("months", DateType) => epochDaysToMonths(row.getInt(ord)).toString
      case ("months", _) =>
        epochDaysToMonths(java.lang.Math.floorDiv(micros, MicrosPerDay)).toString
      case ("years", DateType) =>
        (java.time.LocalDate.ofEpochDay(row.getInt(ord)).getYear - 1970).toString
      case ("years", _) =>
        (java.time.LocalDate.ofEpochDay(
          java.lang.Math.floorDiv(micros, MicrosPerDay)).getYear - 1970).toString
      case (t, d) => throw new IllegalStateException(
        s"hadro: unreachable partition tag $t over ${d.simpleString}")
    }
  }

  /** The SMALLEST source value (internal representation: micros for
    * timestamps, epoch days for dates, the value itself for numeric
    * identity) whose [[tagOf]] ordinal is `ordinal` — i.e. the lower
    * boundary of partition `ordinal` under `transform`. Lets retention
    * compare exact per-segment stats bounds against a cutoff ordinal
    * without ever parsing tags, so the comparison stays correct across a
    * partition-spec respec (old segments tagged under a coarser prior
    * transform drop by the same stats rule). */
  def lowerBoundOf(dt: DataType, transform: String, ordinal: Long): Long =
    (transform, dt) match {
      case ("identity", _) => ordinal
      case ("hours", _) => ordinal * MicrosPerHour
      case ("days", DateType) => ordinal
      case ("days", _) => ordinal * MicrosPerDay
      case ("months", _) =>
        val d = java.time.LocalDate.of(1970, 1, 1).plusMonths(ordinal)
        if (dt == DateType) d.toEpochDay else d.toEpochDay * MicrosPerDay
      case ("years", _) =>
        val d = java.time.LocalDate.of(1970 + ordinal.toInt, 1, 1)
        if (dt == DateType) d.toEpochDay else d.toEpochDay * MicrosPerDay
      case (t, d) => throw new IllegalStateException(
        s"hadro: no partition lower bound for $t over ${d.simpleString}")
    }
}

/** V2 time-transform functions (`days(ts)` etc.) served by
  * [[HadroCatalog]]'s FunctionCatalog: Spark resolves a partitioned
  * table's declared transform against these when it clusters an
  * INSERT's input ([[graft.spark.HadroDataSource]] write builder
  * requires `Distributions.clustered(days(col))` for catalog writes).
  * Only the GROUPING matters for distribution — the produced int is the
  * same epoch-relative ordinal the writer tags segments with, so the
  * two sides agree by construction. */
final class HadroTimeTransformFunction(transform: String) extends UnboundFunction {
  override def name(): String = transform
  override def description(): String =
    s"$transform(ts): epoch-relative $transform ordinal (partition transform)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"$transform expects one time-typed argument, got ${inputType.simpleString}")
    val dt = inputType.fields(0).dataType
    dt match {
      case TimestampType | TimestampNTZType => ()
      case DateType if transform != "hours" => ()
      case other => throw new UnsupportedOperationException(
        s"hadro $transform: unsupported input type ${other.simpleString}")
    }
    new HadroTimeTransformBound(transform, dt)
  }
}

final class HadroTimeTransformBound(transform: String, dt: DataType)
    extends ScalarFunction[java.lang.Integer] {
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = transform
  override def canonicalName(): String = s"graft.hadro.$transform"

  override def produceResult(input: InternalRow): java.lang.Integer = {
    if (input.isNullAt(0)) return null
    val tag = HadroPartition.tagOf(dt, input, 0, transform)
    java.lang.Integer.valueOf(tag.toInt)
  }
}
