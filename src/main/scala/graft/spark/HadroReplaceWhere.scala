package graft.spark

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.format.StatsCollector
import graft.meta.SegmentInfo

/** REPLACE WHERE — predicate-scoped atomic overwrite
  * (`df.writeTo(t).overwrite(cond)`, SQL
  * `INSERT OVERWRITE t PARTITION (p = v)`): one commit deletes every row
  * matching the predicate and appends the incoming batch.
  *
  * The engine's contract is WHOLE-SEGMENT replacement proven by
  * statistics. The predicate must compile to a one-column value interval
  * (conjunctions of `=`, `<`, `<=`, `>`, `>=` over a single orderable
  * column), and every live segment must be provably INSIDE the interval
  * (dropped with the commit) or provably DISJOINT from it (kept, its file
  * untouched) from its min/max manifest bounds. A segment the stats
  * cannot classify — one that straddles the boundary, carries nulls
  * inside the region, or lacks bounds — fails fast with guidance instead
  * of guessing: the user either aligns the predicate to the layout or
  * runs DELETE + append.
  *
  * Two properties follow from proving over the SOURCE column's bounds
  * rather than partition tags:
  *   - On a value-partitioned collection (`PARTITIONED BY (days(ts))`)
  *     per-value routing makes every segment's bounds one-partition
  *     tight, so any partition-aligned region classifies cleanly — the
  *     daily-reprocess `ts >= D AND ts < D+1` shape is the steady state.
  *     And it stays correct across a partition-spec respec: old
  *     coarser-routed segments classify by their actual bounds, never by
  *     a tag whose ordinal space changed meaning.
  *   - It generalizes beyond partitioning: a range-clustered (cluster()
  *     / sortedBy) collection accepts REPLACE WHERE on the cluster key
  *     wherever the region lands on segment boundaries.
  *
  * Truncated (inexact) string bounds are Iceberg-conservative — min is a
  * prefix (<= true min), max an ASCII successor (> true max) — so both
  * proofs stay sound on them; only the classification can get refused
  * where exact bounds would have accepted.
  *
  * At 100 TB this is a manifest-only planning step (O(#segments) driver
  * work, no data read) followed by writing just the incoming batch —
  * the replaced terabytes are dropped by reference. */
private[spark] object HadroReplaceWhere {

  /** One-column region. Rows with NULL in `col` never match (SQL
    * comparison semantics), so a segment is inside only if it has zero
    * nulls in `col`. Two shapes:
    *   - [[Interval]]: internal-typed bounds, each (value, inclusive);
    *     `lo`/`hi` absent = unbounded on that side.
    *   - [[PointSet]]: `col IN (v1, v2, ...)` / a conjunction of
    *     equalities — the "reprocess these partitions" shape; a segment
    *     is inside only when provably single-valued on a member. */
  sealed trait Region { def col: String; def dt: DataType }
  final case class Interval(col: String, dt: DataType,
      lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)]) extends Region
  final case class PointSet(col: String, dt: DataType,
      points: Seq[Any]) extends Region

  sealed trait Cls
  case object Inside extends Cls
  case object Disjoint extends Cls
  case object Straddle extends Cls

  private def lt(a: Any, b: Any): Boolean = StatsCollector.lt(a, b)
  private def eq(a: Any, b: Any): Boolean = !lt(a, b) && !lt(b, a)

  /** Compile the overwrite predicates (implicitly conjoined) into the
    * value region, or throw with guidance. */
  def compile(predicates: Seq[Predicate], schema: StructType): Region = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      "hadro: REPLACE WHERE (overwrite-by-predicate) supports " +
        "conjunctions of =, <, <=, >, >=, or a single IN, over ONE " +
        s"orderable column, proving whole segments in or out of the region — $why. " +
        "For arbitrary predicates run DELETE then append, or use " +
        "dynamic partition overwrite (`overwritePartitions`).")
    def flat(f: Filter): Seq[Filter] = f match {
      case And(l, r) => flat(l) ++ flat(r)
      case x => Seq(x)
    }
    val leaves = predicates.map(p => HadroDeleteSupport.toV1(p).getOrElse(
      fail(s"predicate $p does not translate"))).flatMap(flat)
    // IS NOT NULL conjuncts are implied by any comparison (and by the
    // inside-proof's zero-null requirement) — drop them before the
    // single-column check so Spark's null-guard injection never rejects.
    val cmps = leaves.filterNot(_.isInstanceOf[IsNotNull])
    if (cmps.isEmpty) fail("no comparison predicate remains")
    val cols = cmps.flatMap(_.references).distinct
    if (cols.length != 1) fail(
      s"predicates reference columns ${cols.mkString(", ")}")
    val col = cols.head
    val field = schema.fields.find(_.name == col).getOrElse(
      fail(s"column '$col' not in collection schema"))
    if (!StatsCollector.isOrderable(field.dataType))
      fail(s"column '$col' type ${field.dataType.simpleString} has no " +
        "manifest min/max bounds")
    val conv = CatalystTypeConverters.createToCatalystConverter(field.dataType)
    var lo: Option[(Any, Boolean)] = None
    var hi: Option[(Any, Boolean)] = None
    def toInternal(v: Any): Any = {
      val iv = try conv(v) catch {
        case _: Exception => fail(s"literal $v does not convert to " +
          field.dataType.simpleString)
      }
      if (iv == null) fail("null literal in comparison")
      iv
    }
    def tightenLo(v: Any, incl: Boolean): Unit = lo = lo match {
      case None => Some((v, incl))
      case Some((b, bi)) =>
        if (lt(b, v)) Some((v, incl))
        else if (eq(b, v)) Some((b, bi && incl))
        else Some((b, bi))
    }
    def tightenHi(v: Any, incl: Boolean): Unit = hi = hi match {
      case None => Some((v, incl))
      case Some((b, bi)) =>
        if (lt(v, b)) Some((v, incl))
        else if (eq(b, v)) Some((b, bi && incl))
        else Some((b, bi))
    }
    // `col IN (...)` (or IN ∧ equalities): a finite point set — the
    // "reprocess these partitions" shape. Mixing IN with range bounds
    // is rejected (the combined region would need both proof forms).
    if (cmps.exists(_.isInstanceOf[In])) {
      var points: Option[Seq[Any]] = None
      def intersect(vs: Seq[Any]): Unit = points = points match {
        case None => Some(vs)
        case Some(cur) => Some(cur.filter(c => vs.exists(v => eq(c, v))))
      }
      cmps.foreach {
        case In(_, vs) =>
          intersect(vs.toSeq.filter(_ != null).map(toInternal))
        case EqualTo(_, v) => intersect(Seq(toInternal(v)))
        case EqualNullSafe(_, v) if v != null => intersect(Seq(toInternal(v)))
        case other => fail(s"IN mixed with unsupported predicate $other")
      }
      return PointSet(col, field.dataType, points.getOrElse(Seq.empty))
    }
    cmps.foreach {
      case EqualTo(_, v) =>
        val iv = toInternal(v); tightenLo(iv, incl = true); tightenHi(iv, incl = true)
      // SQL static partition overwrite (`PARTITION (p = v)`) arrives as a
      // null-safe equality; with a non-null literal it is plain equality
      // (null <=> v is false). `p <=> NULL` has no interval form — fail.
      case EqualNullSafe(_, v) if v != null =>
        val iv = toInternal(v); tightenLo(iv, incl = true); tightenHi(iv, incl = true)
      case GreaterThan(_, v) => tightenLo(toInternal(v), incl = false)
      case GreaterThanOrEqual(_, v) => tightenLo(toInternal(v), incl = true)
      case LessThan(_, v) => tightenHi(toInternal(v), incl = false)
      case LessThanOrEqual(_, v) => tightenHi(toInternal(v), incl = true)
      case other => fail(s"unsupported predicate $other")
    }
    Interval(col, field.dataType, lo, hi)
  }

  /** Classify one live segment against the region from its manifest
    * bounds. Disjoint-proofs may use widened (inexact) bounds — a widened
    * range that misses the region means the true range does too; the
    * inside-proof is equally sound on widened bounds ([widened-min,
    * widened-max] inside the region contains the true range) but
    * additionally requires zero nulls and zero tombstones (neither is
    * deleted by a value predicate, so a segment carrying them is never
    * wholly replaceable). */
  def classify(seg: SegmentInfo, region: Region): Cls =
    seg.stats.get(region.col) match {
      case None => Straddle
      case Some(cs) if cs.min.isEmpty || cs.max.isEmpty =>
        // all-null column (or no bounds recorded): null rows never match
        // a comparison, so an all-null segment is untouched by the region
        if (cs.nullCount >= seg.rows && seg.rows > 0) Disjoint else Straddle
      case Some(cs) =>
        val pmn = StatsCollector.parse(cs.min.get, region.dt)
        val pmx = StatsCollector.parse(cs.max.get, region.dt)
        if (pmn == null || pmx == null) return Straddle
        val wholly = cs.nullCount == 0L && seg.tombstones == 0L &&
          seg.dvDeletes == 0L
        region match {
          case iv: Interval =>
            val disjoint =
              iv.lo.exists { case (b, incl) =>
                lt(pmx, b) || (!incl && eq(pmx, b)) } ||
              iv.hi.exists { case (b, incl) =>
                lt(b, pmn) || (!incl && eq(pmn, b)) }
            if (disjoint) return Disjoint
            val inside = wholly &&
              iv.lo.forall { case (b, incl) =>
                if (incl) !lt(pmn, b) else lt(b, pmn) } &&
              iv.hi.forall { case (b, incl) =>
                if (incl) !lt(b, pmx) else lt(pmx, b) }
            if (inside) Inside else Straddle
          case ps: PointSet =>
            // disjoint: no member lands within [min, max] (sound on
            // widened bounds — a wider range missing every member means
            // the true range does too)
            if (ps.points.forall(v => lt(v, pmn) || lt(pmx, v))) Disjoint
            // inside: the segment is provably single-valued on a member.
            // Inexact (truncated) bounds can never prove min == max —
            // the truncated min prefix is strictly below its successor —
            // so this clause only fires on exact stats, by construction.
            else if (wholly && eq(pmn, pmx) &&
              ps.points.exists(v => eq(v, pmn))) Inside
            else Straddle
        }
    }

  /** Partition the live segments into (inside, kept, straddling). In the
    * default segment mode a straddler is a refusal; in row-level mode it
    * is exact work — the predicate is evaluated per row and the matches
    * get deletion-vectored, so inside/disjoint proofs become pure
    * optimizations (drop whole / skip entirely). */
  def split3(segments: Seq[SegmentInfo], region: Region)
      : (Seq[SegmentInfo], Seq[SegmentInfo], Seq[SegmentInfo]) = {
    val inside = Seq.newBuilder[SegmentInfo]
    val kept = Seq.newBuilder[SegmentInfo]
    val straddle = Seq.newBuilder[SegmentInfo]
    segments.foreach { s =>
      classify(s, region) match {
        case Inside => inside += s
        case Disjoint => kept += s
        case Straddle => straddle += s
      }
    }
    (inside.result(), kept.result(), straddle.result())
  }

  /** Partition the live segments into (inside, kept), or Left(file) of
    * the first segment the stats cannot classify. */
  def split(segments: Seq[SegmentInfo],
      region: Region): Either[String, (Seq[SegmentInfo], Seq[SegmentInfo])] = {
    val (inside, kept, straddle) = split3(segments, region)
    straddle.headOption match {
      case Some(s) => Left(s.file)
      case None => Right((inside, kept))
    }
  }
}
