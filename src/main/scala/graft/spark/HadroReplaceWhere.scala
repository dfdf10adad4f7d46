package graft.spark

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.format.StatsCollector
import graft.meta.SegmentInfo

/** REPLACE WHERE — predicate-scoped atomic overwrite
  * (`df.writeTo(t).overwrite(cond)`, SQL
  * `INSERT OVERWRITE t PARTITION (p = v)`): one commit deletes every row
  * matching the predicate and appends the incoming batch.
  *
  * The engine's contract is WHOLE-SEGMENT replacement proven by
  * statistics. The predicate compiles to a [[RegionExpr]] — an AND/OR
  * tree whose leaves are one-column value intervals, `IN` point sets, and
  * null tests — and every live segment is classified against the tree
  * from its min/max manifest bounds: provably INSIDE (every live row
  * matches; dropped with the commit), provably DISJOINT (no row matches;
  * kept, its file untouched), or STRADDLING. Tree nodes compose the
  * three-valued leaf proofs under SQL semantics: `AND` is inside when
  * both sides are, disjoint when either side is (a conjunct that is
  * never TRUE makes the conjunction never TRUE, NULLs included); `OR`
  * mirrors. Multi-column regions (`region = 'eu' AND ts >= D`) and
  * unions of ranges therefore classify segment-by-segment with no
  * single-column restriction. A segment the stats cannot classify —
  * one that straddles a boundary, carries nulls inside the region, or
  * lacks bounds — fails fast with guidance in the default segment mode
  * (the user aligns the predicate to the layout, runs DELETE + append,
  * or opts into `spark.hadro.overwrite.mode=rowlevel`, which
  * deletion-vectors straddlers' matching rows exactly).
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

  /** AND/OR proof tree over region leaves. Each node classifies a
    * segment three-valued (every-row-matches / no-row-matches / unknown)
    * and the combinators are sound under SQL NULL semantics: a conjunct
    * that is never TRUE makes the AND never TRUE (even where the other
    * side is NULL), a disjunct that is always TRUE makes the OR always
    * TRUE. [[ROpaque]] wraps a filter that translates to a row filter
    * but has no stats proof (NOT, string affixes) — it classifies every
    * segment Straddle, so it is only ever usable in row-level mode. */
  sealed trait RegionExpr
  final case class RLeaf(region: Region) extends RegionExpr
  final case class RNull(col: String) extends RegionExpr
  final case class RNotNull(col: String) extends RegionExpr
  final case class ROpaque(desc: String) extends RegionExpr
  final case class RAnd(l: RegionExpr, r: RegionExpr) extends RegionExpr
  final case class ROr(l: RegionExpr, r: RegionExpr) extends RegionExpr
  final case class RNot(inner: RegionExpr) extends RegionExpr
  case object RTrue extends RegionExpr
  case object RFalse extends RegionExpr

  sealed trait Cls
  case object Inside extends Cls
  case object Disjoint extends Cls
  case object Straddle extends Cls

  private def lt(a: Any, b: Any): Boolean = StatsCollector.lt(a, b)
  private def eq(a: Any, b: Any): Boolean = !lt(a, b) && !lt(b, a)

  /** Columns the tree proves over (for error messages and the
    * NOT-negation null check). */
  def cols(e: RegionExpr): Seq[String] = e match {
    case RLeaf(r) => Seq(r.col)
    case RNull(c) => Seq(c)
    case RNotNull(c) => Seq(c)
    case RAnd(l, r) => (cols(l) ++ cols(r)).distinct
    case ROr(l, r) => (cols(l) ++ cols(r)).distinct
    case RNot(i) => cols(i)
    case _ => Seq.empty
  }

  /** True if any leaf is stats-opaque — segment mode can then never
    * classify, so its refusal should point at row-level mode directly. */
  def hasOpaque(e: RegionExpr): Boolean = e match {
    case ROpaque(_) => true
    case RAnd(l, r) => hasOpaque(l) || hasOpaque(r)
    case ROr(l, r) => hasOpaque(l) || hasOpaque(r)
    case RNot(i) => hasOpaque(i)
    case _ => false
  }

  /** Exclusive upper bound of the `startsWith(p)` set under UTF8String's
    * unsigned-byte order: increment p's last non-0xFF byte and truncate.
    * [p, successor) is then EXACTLY the prefix set (a string sorts inside
    * iff its first bytes equal p), so the interval proof is not merely
    * conservative. All-0xFF prefixes have no successor — the prefix set
    * is the whole tail `>= p` (any string sorting at-or-after p must
    * reproduce p's maximal bytes). The successor may not be valid UTF-8;
    * it exists only in-memory for binary comparison against parsed
    * bounds and is never rendered to the manifest. */
  private[spark] def prefixSuccessor(p: UTF8String): Option[UTF8String] = {
    val b = p.getBytes.clone()
    var i = b.length - 1
    while (i >= 0 && b(i) == -1) i -= 1
    if (i < 0) None
    else {
      val t = java.util.Arrays.copyOf(b, i + 1)
      t(i) = (t(i) + 1).toByte
      Some(UTF8String.fromBytes(t))
    }
  }

  /** Translate the V2 overwrite predicates to V1 row filters, or throw
    * with guidance — both modes evaluate or prove exactly these filters,
    * so an untranslatable predicate fails in either. */
  def toFilters(predicates: Seq[Predicate]): Seq[Filter] =
    predicates.map(p => HadroDeleteSupport.toV1(p).getOrElse(
      throw new IllegalArgumentException(
        s"hadro: REPLACE WHERE predicate $p does not translate to a row " +
          "filter — run DELETE then append, or use dynamic partition " +
          "overwrite (`overwritePartitions`)")))

  /** Compile the overwrite row filters (implicitly conjoined) into the
    * proof tree, or throw with guidance. Comparisons and null tests
    * become provable leaves, other filters become [[ROpaque]]. */
  def compile(v1: Seq[Filter], schema: StructType): RegionExpr = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      "hadro: REPLACE WHERE (overwrite-by-predicate) supports AND/OR " +
        "trees of =, <, <=, >, >=, IN and null tests over orderable " +
        s"columns, proving whole segments in or out of the region — $why. " +
        "For arbitrary predicates run DELETE then append, use dynamic " +
        "partition overwrite (`overwritePartitions`), or set " +
        "spark.hadro.overwrite.mode=rowlevel.")
    if (v1.isEmpty) fail("no predicate given")

    def interval(col: String,
        lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)]): RegionExpr = {
      val field = schema.fields.find(_.name == col).getOrElse(
        fail(s"column '$col' not in collection schema"))
      if (!StatsCollector.isOrderable(field.dataType))
        return ROpaque(s"$col:${field.dataType.simpleString}")
      val conv = CatalystTypeConverters.createToCatalystConverter(field.dataType)
      def toInternal(v: Any): Option[Any] =
        if (v == null) None
        else try Option(conv(v)) catch { case _: Exception => None }
      val li = lo.map { case (v, i) => toInternal(v).map((_, i)) }
      val hiI = hi.map { case (v, i) => toInternal(v).map((_, i)) }
      if (li.exists(_.isEmpty) || hiI.exists(_.isEmpty))
        // null/inconvertible literal: the comparison is never TRUE
        RFalse
      else RLeaf(Interval(col, field.dataType, li.flatten, hiI.flatten))
    }
    def points(col: String, vs: Seq[Any]): RegionExpr = {
      val field = schema.fields.find(_.name == col).getOrElse(
        fail(s"column '$col' not in collection schema"))
      if (!StatsCollector.isOrderable(field.dataType))
        return ROpaque(s"$col:${field.dataType.simpleString}")
      val conv = CatalystTypeConverters.createToCatalystConverter(field.dataType)
      val internal = vs.filter(_ != null).flatMap(v =>
        try Option(conv(v)) catch { case _: Exception => None })
      if (internal.isEmpty) RFalse
      else RLeaf(PointSet(col, field.dataType, internal))
    }
    def build(f: Filter): RegionExpr = f match {
      case And(l, r) => RAnd(build(l), build(r))
      case Or(l, r) => ROr(build(l), build(r))
      case IsNull(c) => RNull(c)
      case IsNotNull(c) => RNotNull(c)
      case AlwaysTrue() => RTrue
      case AlwaysFalse() => RFalse
      case EqualTo(c, v) =>
        interval(c, Some((v, true)), Some((v, true)))
      // SQL static partition overwrite (`PARTITION (p = v)`) arrives as
      // a null-safe equality; with a non-null literal it is plain
      // equality (null <=> v is false); `p <=> NULL` is IS NULL.
      case EqualNullSafe(c, null) => RNull(c)
      case EqualNullSafe(c, v) =>
        interval(c, Some((v, true)), Some((v, true)))
      case GreaterThan(c, v) => interval(c, Some((v, false)), None)
      case GreaterThanOrEqual(c, v) => interval(c, Some((v, true)), None)
      case LessThan(c, v) => interval(c, None, Some((v, false)))
      case LessThanOrEqual(c, v) => interval(c, None, Some((v, true)))
      case In(c, vs) => points(c, vs.toIndexedSeq)
      // startsWith compiles to an EXACT binary-order interval
      // [p, prefixSuccessor(p)) — the "replace this source prefix"
      // shape on a prefix-clustered collection proves whole segments.
      case StringStartsWith(c, p) if p.isEmpty => RNotNull(c)
      case StringStartsWith(c, p)
          if schema.fields.exists(f => f.name == c &&
            f.dataType == org.apache.spark.sql.types.StringType) =>
        val lo = UTF8String.fromString(p)
        RLeaf(Interval(c, org.apache.spark.sql.types.StringType,
          Some((lo, true)), prefixSuccessor(lo).map((_, false))))
      case Not(f) => RNot(build(f))
      // translatable but not stats-provable (string affixes):
      // row-level mode evaluates it exactly; segment mode refuses.
      case other => ROpaque(other.toString)
    }
    v1.map(build).reduce(RAnd(_, _))
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

  /** Classify one segment against the proof tree. Combinator soundness
    * (SQL three-valued logic, where Inside = "every live row evaluates
    * TRUE" and Disjoint = "no live row evaluates TRUE"):
    *   - AND: either side never TRUE ⇒ conjunction never TRUE (NULL on
    *     the other side cannot rescue it); both sides always TRUE ⇒
    *     always TRUE.
    *   - OR: either side always TRUE ⇒ always TRUE; both sides never
    *     TRUE ⇒ never TRUE (NULL|FALSE is not TRUE).
    * Null-test leaves prove from the column's manifest nullCount; the
    * Inside proofs keep the leaf rule's zero-tombstone/zero-dv
    * conservatism so a wholly-dropped file never carries resolution
    * state. */
  def classifyTree(seg: SegmentInfo, e: RegionExpr): Cls = e match {
    case RLeaf(r) => classify(seg, r)
    case RTrue => Inside
    case RFalse => Disjoint
    case ROpaque(_) => Straddle
    case RNull(c) => seg.stats.get(c) match {
      case Some(cs) if cs.nullCount == 0L => Disjoint
      case Some(cs) if cs.nullCount >= seg.rows && seg.rows > 0 &&
        seg.tombstones == 0L && seg.dvDeletes == 0L => Inside
      case _ => Straddle
    }
    case RNotNull(c) => seg.stats.get(c) match {
      case Some(cs) if cs.nullCount >= seg.rows && seg.rows > 0 => Disjoint
      case Some(cs) if cs.nullCount == 0L &&
        seg.tombstones == 0L && seg.dvDeletes == 0L => Inside
      case _ => Straddle
    }
    case RAnd(l, r) => (classifyTree(seg, l), classifyTree(seg, r)) match {
      case (Disjoint, _) | (_, Disjoint) => Disjoint
      case (Inside, Inside) => Inside
      case _ => Straddle
    }
    case ROr(l, r) => (classifyTree(seg, l), classifyTree(seg, r)) match {
      case (Inside, _) | (_, Inside) => Inside
      case (Disjoint, Disjoint) => Disjoint
      case _ => Straddle
    }
    // NOT negates under three-valued logic: inner always-TRUE ⇒ NOT
    // never TRUE (NULLs cannot occur where inner is TRUE). The converse
    // needs inner ALWAYS-FALSE, not merely never-TRUE — guaranteed when
    // every referenced column is null-free and no leaf is opaque (each
    // leaf then evaluates two-valued), plus the usual zero-tombstone/
    // zero-dv conservatism for a wholly-dropped file.
    case RNot(inner) => classifyTree(seg, inner) match {
      case Inside => Disjoint
      case Disjoint if !hasOpaque(inner) &&
        cols(inner).forall(c => seg.stats.get(c).exists(_.nullCount == 0L)) &&
        seg.tombstones == 0L && seg.dvDeletes == 0L => Inside
      case _ => Straddle
    }
  }

  /** Parse a `hadro.replaceWhere` option condition (the Delta-style
    * `df.write.mode("overwrite").option("replaceWhere", cond)` shape for
    * path-based writes without a catalog) into V1 row filters. The
    * string is parsed by Catalyst's SQL expression parser; attributes
    * must be top-level columns of the stored schema and literals are
    * cast to the column's type eagerly (a literal the column type cannot
    * represent is an error here, never a silently-empty region). */
  def parseCondition(cond: String, schema: StructType): Seq[Filter] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"hadro: hadro.replaceWhere condition '$cond' is not a supported " +
        s"overwrite predicate — $why. Supported: AND/OR/NOT trees of " +
        "=, <=>, <, <=, >, >=, IN, IS [NOT] NULL, LIKE-prefix " +
        "(startsWith), over the collection's columns.")
    val parsed = try
      new org.apache.spark.sql.catalyst.parser.CatalystSqlParser()
        .parseExpression(cond)
    catch { case e: Exception => fail(s"parse error: ${e.getMessage}") }
    def colName(e: ce.Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.length == 1 => Some(a.nameParts.head)
      case _ => None
    }
    def field(c: String): org.apache.spark.sql.types.StructField =
      schema.fields.find(_.name == c).getOrElse(
        fail(s"column '$c' not in collection schema"))
    // Cast the literal to the COLUMN's type up front (session timezone
    // for timestamp strings) and surface an un-representable literal as
    // an error: the downstream compiler treats an inconvertible literal
    // as never-TRUE, which is correct for typed nulls but would silently
    // no-op a typo'd option string.
    def litVal(l: ce.Literal, c: String): Any = {
      val dt = field(c).dataType
      val internal =
        if (l.dataType == dt) l.value
        else {
          val cast = ce.Cast(l, dt, Option(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
          if (!cast.resolved) fail(
            s"literal ${l.sql} cannot cast to '$c' ${dt.simpleString}")
          try cast.eval(null) catch {
            case e: Exception => fail(s"literal ${l.sql} does not convert " +
              s"to '$c' ${dt.simpleString}: ${e.getMessage}")
          }
        }
      if (internal == null && l.value != null) fail(
        s"literal ${l.sql} does not convert to '$c' ${dt.simpleString}")
      CatalystTypeConverters.createToScalaConverter(dt)(internal)
    }
    def cmp(l: ce.Expression, r: ce.Expression,
        direct: (String, Any) => Filter,
        flipped: (String, Any) => Filter): Option[Filter] = (l, r) match {
      case (a, lit: ce.Literal) =>
        colName(a).map(c => direct(c, litVal(lit, c)))
      case (lit: ce.Literal, a) =>
        colName(a).map(c => flipped(c, litVal(lit, c)))
      case _ => None
    }
    def build(e: ce.Expression): Filter = e match {
      case ce.And(l, r) => And(build(l), build(r))
      case ce.Or(l, r) => Or(build(l), build(r))
      case ce.Not(c) => Not(build(c))
      case ce.EqualTo(l, r) =>
        cmp(l, r, EqualTo, EqualTo).getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.EqualNullSafe(l, r) =>
        cmp(l, r, EqualNullSafe, EqualNullSafe)
          .getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.LessThan(l, r) =>
        cmp(l, r, LessThan, GreaterThan).getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.LessThanOrEqual(l, r) =>
        cmp(l, r, LessThanOrEqual, GreaterThanOrEqual)
          .getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.GreaterThan(l, r) =>
        cmp(l, r, GreaterThan, LessThan).getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.GreaterThanOrEqual(l, r) =>
        cmp(l, r, GreaterThanOrEqual, LessThanOrEqual)
          .getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.In(a, vs) if vs.forall(_.isInstanceOf[ce.Literal]) =>
        colName(a).map(c => In(c,
          vs.map(v => litVal(v.asInstanceOf[ce.Literal], c)).toArray))
          .getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.IsNull(a) =>
        colName(a).map(IsNull).getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.IsNotNull(a) =>
        colName(a).map(IsNotNull).getOrElse(fail(s"unsupported ${e.sql}"))
      case ce.StartsWith(a, p: ce.Literal) =>
        colName(a).map(c => StringStartsWith(c,
          litVal(p, c).asInstanceOf[String]))
          .getOrElse(fail(s"unsupported ${e.sql}"))
      // LIKE with a literal pattern whose only wildcards are a leading
      // and/or trailing bare `%` maps to the affix filters ('ab%' is the
      // provable prefix-interval leaf; '%ab' / '%ab%' are stats-opaque
      // but exact in rowlevel mode); no-wildcard patterns are equality.
      case ce.Like(a, p: ce.Literal, escape) =>
        val c = colName(a).getOrElse(fail(s"unsupported ${e.sql}"))
        val pat = litVal(p, c).asInstanceOf[String]
        def clean(s: String): Boolean =
          !s.contains('%') && !s.contains('_') && !s.contains(escape)
        val leading = pat.startsWith("%")
        val trailing = pat.endsWith("%") && pat.length > (if (leading) 1 else 0)
        val core = pat.substring(if (leading) 1 else 0,
          pat.length - (if (trailing) 1 else 0))
        if (!clean(core)) fail(
          s"LIKE pattern '$pat' has interior wildcards — only prefix%, " +
            "%suffix, %infix% and exact literal patterns are supported")
        (leading, trailing) match {
          case (false, false) => EqualTo(c, core)
          case (false, true) => StringStartsWith(c, core)
          case (true, false) => StringEndsWith(c, core)
          case (true, true) => StringContains(c, core)
        }
      case ce.Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) =>
        if (b) AlwaysTrue else AlwaysFalse
      case other => fail(s"unsupported ${other.sql}")
    }
    Seq(build(parsed))
  }

  /** Partition the live segments into (inside, kept, straddling). In the
    * default segment mode a straddler is a refusal; in row-level mode it
    * is exact work — the predicate is evaluated per row and the matches
    * get deletion-vectored, so inside/disjoint proofs become pure
    * optimizations (drop whole / skip entirely). */
  def split3(segments: Seq[SegmentInfo], region: RegionExpr)
      : (Seq[SegmentInfo], Seq[SegmentInfo], Seq[SegmentInfo]) = {
    val inside = Seq.newBuilder[SegmentInfo]
    val kept = Seq.newBuilder[SegmentInfo]
    val straddle = Seq.newBuilder[SegmentInfo]
    segments.foreach { s =>
      classifyTree(s, region) match {
        case Inside => inside += s
        case Disjoint => kept += s
        case Straddle => straddle += s
      }
    }
    (inside.result(), kept.result(), straddle.result())
  }
}
