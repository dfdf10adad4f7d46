package graft.spark

import java.nio.file.Path

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.meta.CollectionMeta

/** Streaming source over a hadro collection: the append-only segment log is
  * tailed by MANIFEST ORDINAL — each committed segment has a monotonically
  * increasing ordinal, so an offset is simply "next ordinal to read" and a
  * micro-batch is the half-open ordinal range committed since the last
  * batch. No files are listed or re-read; planning is one manifest read.
  *
  * Semantics: by default an insert-only changefeed of the log tail
  * (tombstone records are skipped, shadowed versions are NOT resolved —
  * resolution is a batch-view or stateful-stream concern). With
  * `hadro.changefeed=full` the stream carries `_hadro_seq` and
  * `_hadro_deleted` as regular columns and INCLUDES tombstone records —
  * the full CDC view a stateful LWW consumer needs (st05). Metadata-column
  * SELECTION on a stream remains unsupported (Spark does not route
  * metadata columns through streaming column pruning) — the changefeed
  * option exists precisely so streams never need it.
  *
  * Truncate/compaction resets ordinals; the manifest GENERATION (bumped by
  * every truncate, carried in offsets) makes the discontinuity detectable
  * even after the new log outgrows the old ordinals. Default behavior is
  * fail-fast with the cause; `hadro.onTruncate=restart` re-tails the
  * rewritten log from ordinal 0. `hadro.maxOrdinalsPerTrigger` bounds how
  * many segment ordinals one micro-batch admits (backfill pacing).
  */
/** `version` (manifest version at this offset, -1 = untracked) exists for
  * CHANGEFEED streams only: consecutive offsets' manifest pair is what
  * lets a micro-batch synthesize CDC delete rows from deletion-vector
  * drift, and a version-only advance (a dv DELETE with no new ordinals)
  * is a real batch for such a stream. Plain streams keep version = -1 and
  * serialize exactly as before — checkpoint-compatible both ways. */
final case class HadroOffset(nextOrdinal: Long, generation: Long = 0L,
    version: Long = -1L) extends Offset {
  override def json(): String =
    if (version < 0L) s"""{"nextOrdinal":$nextOrdinal,"generation":$generation}"""
    else s"""{"nextOrdinal":$nextOrdinal,"generation":$generation,"version":$version}"""
}

final class HadroMicroBatchStream(path: Path, storedSchema: StructType,
    required: StructType, onTruncate: String = "fail",
    maxOrdinalsPerTrigger: Long = 0L,
    startingVersion: Option[String] = None,
    maxBytesPerTrigger: Long = 0L,
    endingVersion: Option[String] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics {

  /** Backlog observability in StreamingQueryProgress: how many committed
    * segment ordinals the query has not consumed yet — the first question
    * about a 100 TB backfill ("is it keeping up?") answered per batch
    * without logs. A generation mismatch reports the full remaining log
    * (the stream will restart or fail per onTruncate). */
  override def metrics(latestConsumed: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val m = CollectionMeta.currentManifest(path)
    val behind =
      if (!latestConsumed.isPresent) m.nextOrdinal
      else latestConsumed.get() match {
        case HadroOffset(next, gen, _) if gen == m.generation =>
          math.max(0L, m.nextOrdinal - next)
        case _ => m.nextOrdinal
      }
    java.util.Map.of(
      "segmentsBehind", behind.toString,
      "logGeneration", m.generation.toString)
  }

  require(onTruncate == "fail" || onTruncate == "restart",
    s"hadro.onTruncate must be fail|restart, got '$onTruncate'")
  require(maxOrdinalsPerTrigger >= 0,
    s"hadro.maxOrdinalsPerTrigger must be >= 0, got $maxOrdinalsPerTrigger")
  require(maxBytesPerTrigger >= 0,
    s"hadro.maxBytesPerTrigger must be >= 0, got $maxBytesPerTrigger")
  require(startingVersion.forall(v =>
      v.equalsIgnoreCase("latest") ||
        (v.nonEmpty && v.forall(_.isDigit)) ||
        CollectionMeta.readRefs(path).contains(v)),
    s"hadro.startingVersion must be a version number, 'latest', or a tag " +
      s"name, got '${startingVersion.getOrElse("")}' " +
      s"(tags: ${CollectionMeta.readRefs(path).keys.toSeq.sorted.mkString(", ")})")
  require(endingVersion.forall(v =>
      (v.nonEmpty && v.forall(_.isDigit)) ||
        CollectionMeta.readRefs(path).contains(v)),
    s"hadro.endingVersion must be a version number or a tag name, got " +
      s"'${endingVersion.getOrElse("")}' " +
      s"(tags: ${CollectionMeta.readRefs(path).keys.toSeq.sorted.mkString(", ")})")

  /** Bounded replay (Delta's `endingVersion`): the stream consumes every
    * change committed AT OR BEFORE version v (inclusive, by ordinal cap —
    * the dual of `startingVersion`'s resume point) and then idles;
    * composed with `Trigger.AvailableNow` it terminates, giving a
    * reproducible replay of an exact version window on the streaming
    * API. Resolved lazily so a dropped tag errors at first use with the
    * descriptive message, like startingVersion. The version must still
    * be retained, and its generation must match the live log when a
    * batch is planned — a truncate/compaction past the cap makes the
    * ordinal window meaningless (fail, regardless of onTruncate:
    * restarting from 0 under a bounded replay would silently change
    * what "version v" means). */
  private lazy val endingCap: Option[HadroOffset] = endingVersion.map { s =>
    val v = CollectionMeta.readRefs(path).get(s).getOrElse {
      if (s.isEmpty || !s.forall(_.isDigit)) throw new IllegalArgumentException(
        s"hadro.endingVersion must be a version number or a tag name, " +
          s"got '$s' (tags: " +
          s"${CollectionMeta.readRefs(path).keys.toSeq.sorted.mkString(", ")})")
      s.toLong
    }
    val m = CollectionMeta.manifestAt(path, v)
    HadroOffset(m.nextOrdinal, m.generation, m.version)
  }

  /** Whether this stream is a CHANGEFEED (full) stream — the only mode
    * whose offsets track manifest versions, whose batches are planned
    * against the PINNED end-version manifest, and whose micro-batches
    * synthesize CDC delete rows from deletion-vector drift between the
    * batch's two manifest versions. */
  private val wantDeleted: Boolean =
    required.fieldNames.contains(HadroTable.DeletedCol)

  /** Manifest version to stamp into an offset: changefeed streams track
    * it (dv-drift CDC and version-only batch advance), plain streams stay
    * at -1 for byte-identical checkpoints and no spurious empty batches. */
  private def ver(v: Long): Long = if (wantDeleted) v else -1L

  private def applyEndingCap(end: Long, liveGeneration: Long): Long =
    endingCap match {
      case Some(cap) =>
        require(cap.generation == liveGeneration,
          s"hadro: endingVersion ${endingVersion.get} predates a " +
            "truncate/compaction/overwrite of the log (generation " +
            s"${cap.generation} vs $liveGeneration) — the bounded replay " +
            "window no longer exists; replay from a full snapshot")
        math.min(cap.nextOrdinal, end)
      case None => end
    }

  /** Version cap mirroring [[applyEndingCap]]: a bounded replay also pins
    * the dv-drift window — deletes committed AFTER the cap version belong
    * to a later (un-replayed) change set, never this stream. */
  private def applyEndingCapVersion(v: Long): Long =
    endingCap.map(c => math.min(c.version, v)).getOrElse(v)

  /** Where a FRESH query (no checkpoint) begins — Delta-style
    * `startingVersion`. Default: ordinal 0, the whole retained log
    * (backfill-then-tail). `latest`: only appends landing after query
    * start. A version number v: every segment committed in version v or
    * later, INCLUSIVE — the CDC resume point "give me all changes since
    * snapshot v", positioned as version v-1's end ordinal. v-1 must still
    * be retained (same fail-fast as time travel; at 100 TB resuming from
    * an expired snapshot must error, not silently backfill everything).
    * Restarts from a checkpoint never consult this — the committed offset
    * wins (Spark only calls initialOffset absent a checkpoint). */
  override def initialOffset(): Offset = startingVersion match {
    case None =>
      val m = CollectionMeta.currentManifest(path)
      // ordinal 0 replays the whole log AT the start version's dv state
      // (the first batch has no previously-emitted segments to drift)
      HadroOffset(0L, m.generation, ver(m.version))
    case Some(s) if s.equalsIgnoreCase("latest") =>
      val m = CollectionMeta.currentManifest(path)
      HadroOffset(m.nextOrdinal, m.generation, ver(m.version))
    case Some(s) =>
      // a TAG resumes from "all changes AFTER the pinned snapshot" — the
      // natural CDC handoff: tag the snapshot a consumer ingested, stream
      // from the tag. Tags pin their manifest, so this never expires
      // under the consumer (unlike a bare version number).
      val tagged = CollectionMeta.readRefs(path).get(s)
      // the constructor validated s against refs.json, but the tag may
      // have been dropped between stream definition and first start —
      // keep the descriptive error rather than a raw NumberFormatException
      val v = tagged.map(_ + 1).getOrElse {
        if (s.isEmpty || !s.forall(_.isDigit)) throw new IllegalArgumentException(
          s"hadro.startingVersion must be a version number, 'latest', or " +
            s"a tag name, got '$s' (tags: " +
            s"${CollectionMeta.readRefs(path).keys.toSeq.sorted.mkString(", ")})")
        s.toLong
      }
      // versions start at 1, so v <= 1 is the start of the log by
      // definition; only v >= 2 needs v-1 to still be retained
      if (v <= 1L) {
        val m = CollectionMeta.currentManifest(path)
        HadroOffset(0L, m.generation, ver(m.version))
      } else {
        val prev = CollectionMeta.manifestAt(path, v - 1)
        HadroOffset(prev.nextOrdinal, prev.generation, ver(prev.version))
      }
  }

  override def latestOffset(): Offset = {
    val m = CollectionMeta.currentManifest(path)
    HadroOffset(applyEndingCap(m.nextOrdinal, m.generation), m.generation,
      ver(applyEndingCapVersion(m.version)))
  }

  // ------------------------------------------- Trigger.AvailableNow
  // Catch-up-then-stop: the query start PINS the manifest end; triggers
  // (still admission-bounded) drain up to exactly that offset and the
  // query terminates by itself. Appends landing after the pin are left
  // for the next run — with a checkpoint, that run resumes from the
  // committed offset, so no epoch replays and no record is read twice.
  @volatile private var availableNowEnd: Option[HadroOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val m = CollectionMeta.currentManifest(path)
    availableNowEnd = Some(HadroOffset(m.nextOrdinal, m.generation, m.version))
  }

  // ------------------------------------------------- admission control
  // Backfilling a huge collection as a stream must not become ONE
  // micro-batch over the whole log: `hadro.maxOrdinalsPerTrigger` caps
  // how many segment ordinals a trigger admits, so checkpoints land at a
  // bounded cadence and a failed backfill resumes mid-log instead of
  // restarting a single giant batch. 0 = unbounded (default).
  override def getDefaultReadLimit: ReadLimit =
    if (maxOrdinalsPerTrigger > 0 || maxBytesPerTrigger > 0)
      ReadLimit.maxRows(math.max(maxOrdinalsPerTrigger, 1L))
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val m = CollectionMeta.currentManifest(path)
    val so = start.asInstanceOf[HadroOffset]
    // AvailableNow cap applies only while the log it pinned still exists;
    // a truncate under the run falls back to live-end (and the normal
    // generation machinery below decides fail vs restart).
    val end = applyEndingCap(availableNowEnd match {
      case Some(cap) if cap.generation == m.generation =>
        math.min(cap.nextOrdinal, m.nextOrdinal)
      case _ => m.nextOrdinal
    }, m.generation)
    // dv-drift window end for changefeed streams: a bounded replay /
    // AvailableNow pin also caps the version (later deletes are a later
    // run's change set); a version-only advance (dv DELETE, no appends)
    // still moves the offset, so the delete gets its own micro-batch
    val endVersion = ver(applyEndingCapVersion(availableNowEnd match {
      case Some(cap) if cap.generation == m.generation =>
        math.min(cap.version, m.version)
      case _ => m.version
    }))
    val uncapped = maxOrdinalsPerTrigger <= 0 && maxBytesPerTrigger <= 0
    if (uncapped || m.generation != so.generation)
      HadroOffset(end, m.generation, endVersion) // truncate: re-admit whole log
    else {
      // ordinal cap bounds manifest-planning work; BYTE cap bounds the
      // micro-batch's I/O when segment sizes vary (a backfill over mixed
      // 1 MB/1 GB segments must checkpoint by data volume, not file
      // count). Both compose; at least one ordinal always admits so the
      // stream can never stall on a single oversized segment.
      var capped = end
      if (maxOrdinalsPerTrigger > 0)
        capped = math.min(capped, so.nextOrdinal + maxOrdinalsPerTrigger)
      if (maxBytesPerTrigger > 0) {
        val inRange = m.segments
          .filter(s => s.ordinal >= so.nextOrdinal && s.ordinal < capped)
          .sortBy(_.ordinal)
        var bytes = 0L
        var last = so.nextOrdinal
        var stop = false
        inRange.foreach { s =>
          if (!stop) {
            // offsets are RANGES: the first over-budget segment ends the
            // batch (no skipping ahead), but the first segment always
            // admits so one oversized file can never stall the stream
            if (last == so.nextOrdinal || bytes + s.bytes <= maxBytesPerTrigger) {
              bytes += s.bytes
              last = s.ordinal + 1
            } else stop = true
          }
        }
        capped = math.min(capped, math.max(last, so.nextOrdinal + 1))
      }
      HadroOffset(capped, m.generation, endVersion)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val withVer =
      """\{"nextOrdinal":(\d+),"generation":(\d+),"version":(\d+)\}""".r
    val withGen = """\{"nextOrdinal":(\d+),"generation":(\d+)\}""".r
    val legacy = """\{"nextOrdinal":(\d+)\}""".r // pre-generation checkpoints
    json.trim match {
      case withVer(v, g, ve) => HadroOffset(v.toLong, g.toLong, ve.toLong)
      case withGen(v, g) => HadroOffset(v.toLong, g.toLong)
      case legacy(v) => HadroOffset(v.toLong, 0L)
      case other => throw new IllegalArgumentException(s"bad hadro offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[HadroOffset]
    val eo = end.asInstanceOf[HadroOffset]
    // A truncate/compaction resets ordinals and bumps the manifest
    // generation. Ordinal comparison alone is NOT enough to notice: once
    // the post-truncate log outgrows the old one, ordinal ranges look
    // plausible again and the stream would silently skip the new log's
    // first records. The generation makes the discontinuity explicit:
    //   - onTruncate=fail (default): stop with the actionable cause;
    //   - onTruncate=restart: re-tail the new log from ordinal 0 (the
    //     stream emits every record of the rewritten collection once,
    //     then continues tailing — Delta-style restart semantics).
    // A CHANGEFEED stream first tries to read THROUGH the generation
    // change: when every in-window rewrite is provably data-preserving
    // (the shared chain walk — writer provenance + live-count
    // conservation + no folded upsert history), this micro-batch is the
    // exact net change set and the tail just continues — the hourly
    // compactor no longer kills the consumer or forces a whole-log
    // restart. Anything unprovable falls back to onTruncate semantics.
    if (eo.generation > so.generation && wantDeleted &&
        so.version >= 0L && eo.version >= 0L) {
      val transparent: Option[Array[InputPartition]] =
        try {
          val startM = CollectionMeta.manifestMetaAt(path, so.version)
          val endM = CollectionMeta.manifestAt(path, eo.version)
          // both offsets must sit at version boundaries: a bounded-trigger
          // backfill mid-version cannot locate its floor in version space
          require(startM.nextOrdinal == so.nextOrdinal &&
            endM.nextOrdinal == eo.nextOrdinal &&
            endM.generation == eo.generation,
            "offset is mid-version (bounded-trigger backfill)")
          def refuse(why: String): Nothing =
            throw new IllegalArgumentException(why)
          val net = ChangeWindowPlanner.chainWalk(path, startM, endM,
            (_, _) => (), refuse) // changefeed mode: deletes always emittable
          val needed = net.drift.flatMap { case (seg, b) =>
            Seq(seg.file) ++ seg.deleteVector ++ b } ++
            net.dropped.flatMap(s => Seq(s.file) ++ s.deleteVector)
          needed.foreach(f => require(
            java.nio.file.Files.exists(path.resolve(f)),
            s"superseded bytes $f were already reclaimed"))
          Some((endM.segments.filter(s => net.includeFiles(s.file))
            .flatMap(s => HadroInputPartition.ranges(path, s)) ++
            net.drift.flatMap { case (seg, b) =>
              HadroInputPartition.dvDeltaRanges(path, seg, b) } ++
            net.dropped.flatMap(s =>
              HadroInputPartition.dropRanges(path, s))).toArray)
        } catch {
          // ONLY the chain walk's refusals (refuse/require: unprovable
          // rewrite, mid-version offset, reclaimed bytes) degrade to
          // onTruncate semantics — and say why, because under
          // onTruncate=restart that fallback re-emits the whole log.
          // NoSuchFileException joins them: manifest GC can reclaim an
          // in-window manifest between an existence check and its read —
          // that race means exactly "the chain is no longer walkable",
          // the same condition the reclaimed-bytes require guards.
          // Genuine IO/metadata errors propagate: silently treating a
          // transient read failure as "not provable" would duplicate
          // rows downstream with no diagnostic anywhere.
          case e @ (_: IllegalArgumentException | _: IllegalStateException |
                    _: java.nio.file.NoSuchFileException) =>
            org.slf4j.LoggerFactory.getLogger(classOf[HadroMicroBatchStream])
              .warn(s"hadro stream over $path: cannot read through " +
                s"generation change ${so.generation} -> ${eo.generation} " +
                s"(${e.getMessage}); falling back to onTruncate=$onTruncate")
            None
        }
      transparent match {
        case Some(parts) => return parts
        case None => () // fall through to onTruncate semantics below
      }
    }
    val lo =
      if (eo.generation > so.generation) {
        if (onTruncate == "fail") throw new IllegalStateException(
          s"hadro stream over $path: the collection was truncated or " +
            s"compacted underneath the stream (generation ${so.generation} " +
            s"-> ${eo.generation}) and the change cannot be proven " +
            "data-preserving. Restart with a fresh checkpoint, set " +
            "hadro.onTruncate=restart, or stream only from non-compacting " +
            "collections.")
        0L // restart: everything in the current log is new to this stream
      } else {
        if (eo.nextOrdinal < so.nextOrdinal) throw new IllegalStateException(
          s"hadro stream over $path: offset went backwards " +
            s"(${so.nextOrdinal} -> ${eo.nextOrdinal}) within generation " +
            s"${so.generation} — manifest state is inconsistent.")
        so.nextOrdinal
      }
    // Generation check WITHIN the trigger: latestOffset captured (ordinal,
    // generation) from one manifest read; if a truncate commits between that
    // read and planning, the current manifest's ordinals have reset and the
    // ordinal-range filter below would silently serve the NEW generation's
    // segments as this batch's data. Read the manifest once and refuse to
    // plan against a different generation — the retried/next trigger sees
    // the bump through the normal cross-trigger path above.
    // CHANGEFEED streams plan against the PINNED end-version manifest
    // instead: every row appended in (so, eo] is emitted at exactly
    // eo.version's deletion-vector state, which is what makes the
    // cross-batch dv-drift diff below exact (a delete lands in exactly
    // one batch, and never for a row the consumer never saw).
    val m =
      if (eo.version >= 0L) CollectionMeta.manifestAt(path, eo.version)
      else CollectionMeta.currentManifest(path)
    if (m.generation != eo.generation) throw new IllegalStateException(
      s"hadro stream over $path: collection truncated while planning the " +
        s"micro-batch (generation ${eo.generation} -> ${m.generation}); " +
        "the trigger will be retried against the new manifest.")
    val inserts = m.segments
      .filter(s => s.ordinal >= lo && s.ordinal < eo.nextOrdinal)
      // split ranges fan out within a micro-batch exactly as in batch scans
      .flatMap(s => HadroInputPartition.ranges(path, s))
    // dv-drift CDC deletes: rows of ALREADY-EMITTED segments (ordinal < lo)
    // whose deletion vector grew between the batch's two manifest versions
    // are synthesized as _hadro_deleted = true rows — the streaming twin of
    // the batch changes window's delta partitions. Skipped across a
    // truncate restart (old-generation vectors are meaningless) and for
    // legacy/plain offsets (version = -1).
    val drift =
      if (wantDeleted && so.version >= 0L && eo.version > so.version &&
          so.generation == eo.generation) {
        val startM = CollectionMeta.manifestAt(path, so.version)
        val endByFile = m.segments.map(s => s.file -> s).toMap
        startM.segments.filter(_.ordinal < lo).flatMap { s =>
          endByFile.get(s.file) match {
            case Some(live) if live.deleteVector != s.deleteVector =>
              HadroInputPartition.dvDeltaRanges(path, live, s.deleteVector)
            case None =>
              // dropped mid-stream (drop_partitions, same generation):
              // every start-live row becomes a synthesized CDC delete
              HadroInputPartition.dropRanges(path, s)
            case _ => Nil
          }
        }
      } else Nil
    (inserts ++ drift).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HadroReaderFactory(storedSchema, required,
      typeWidened = CollectionMeta.currentManifest(path)
        .segments.exists(_.writeTypes.nonEmpty))

  override def commit(end: Offset): Unit = () // no source-side state to clean

  override def stop(): Unit = ()
}

