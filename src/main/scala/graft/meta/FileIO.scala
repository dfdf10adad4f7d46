package graft.meta

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** The engine's filesystem contract, named and isolated (SURVEY §7
  * known-hard #2): every primitive the commit protocol and the ref
  * machinery rely on lives behind this seam, with its object-store
  * mapping documented, so porting to S3-class storage is a second
  * implementation of FOUR methods — not an audit of every Files.* call
  * in the codebase. The local implementation is byte-identical to the
  * direct calls it replaced. See ARCHITECTURE.md "Filesystem contract".
  *
  * The four primitives and what each really requires:
  *
  *  1. [[replaceSlot]] — atomic whole-file replace of a SINGLETON
  *     metadata slot (schema.json, refs.json, branches.json,
  *     constraints.json, writeorder.json). Requirement: readers see the
  *     old bytes or the new bytes, never a mix, never absence. POSIX:
  *     write-temp + rename(2) (ATOMIC_MOVE, REPLACE_EXISTING). S3: one
  *     unconditional PUT of the slot key — a PUT is already atomic and
  *     last-writer-wins per key, which is exactly this slot's documented
  *     concurrency contract (the ref lock serializes the read-modify-
  *     write ABOVE this primitive).
  *
  *  2. [[publishNew]] — claim-if-absent publish of a VERSIONED slot
  *     (manifest-NNNNNNNNNN.json): the manifest commit race is decided
  *     by whoever claims the version number first; the loser must FAIL
  *     (and retry at the next number), never overwrite. POSIX: O_EXCL
  *     createFile claims the slot, then ATOMIC_MOVE fills it (a pure
  *     rename replaces with no delete window). S3: a single conditional
  *     PUT with If-None-Match: * — same linearization in one round trip
  *     (supported by S3 proper since 2024, GCS and MinIO for longer).
  *
  *  3. [[withFileLock]] — cross-PROCESS mutual exclusion for the
  *     refs/branches read-modify-write (tag pins, branch-head moves,
  *     fork bases: two unserialized writers silently drop one another's
  *     update, and a lost tag pin hands its snapshot to GC). POSIX:
  *     FileChannel.lock on a lock file. S3: there is no lock primitive —
  *     map to a CAS loop (conditional PUT on a generation-numbered refs
  *     object, retry on precondition failure) or an external lease
  *     (DynamoDB-style, the Delta-on-S3 commit-service shape). The JVM-
  *     internal monitor that makes this re-entrant per process stays
  *     ABOVE the seam in [[CollectionMeta.withBranchLock]] — it is not a
  *     storage concern.
  *
  *  4. [[linkOrCopy]] — zero-copy adoption of an IMMUTABLE data file
  *     into another collection's directory (clone, publishFrom: the
  *     zero-copy-clone verbs). POSIX: hard link, byte-copy fallback for
  *     cross-device paths. S3: server-side COPY (no bytes through the
  *     client) — or, better, manifest-level adoption by absolute key so
  *     nothing moves at all; the copy fallback is the semantics this
  *     primitive promises, the link is the optimization.
  *
  * Deliberately NOT behind the seam: plain reads, segment/sidecar data
  * writes (immutable write-once files — any object store handles
  * write-then-read-by-new-key), deletes (GC tolerates eventual
  * visibility), and directory creation (S3 has no directories; the
  * local impl's createDirectories calls are harmless no-ops there).
  */
trait FileIO {
  /** Atomically replace singleton slot `target` with the bytes at `tmp`
    * (consuming `tmp`). Readers see old or new, never a mix. */
  def replaceSlot(tmp: Path, target: Path): Unit

  /** Publish the bytes at `tmp` (consuming it) as `target` iff no one
    * has claimed `target` yet. Returns false — leaving `target`
    * untouched and `tmp` deleted — when the slot was already claimed. */
  def publishNew(tmp: Path, target: Path): Boolean

  /** Run `body` holding an exclusive cross-process lock on `lockFile`
    * (created if absent). Callers provide per-process re-entrancy. */
  def withFileLock[T](lockFile: Path)(body: => T): T

  /** Make the immutable file `src` available at `dst` without copying
    * bytes where the storage allows it (hard link / server-side copy);
    * fall back to a plain copy. */
  def linkOrCopy(src: Path, dst: Path): Unit
}

/** POSIX implementation — the behavior every existing spec pins. */
object LocalFileIO extends FileIO {
  override def replaceSlot(tmp: Path, target: Path): Unit =
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)

  override def publishNew(tmp: Path, target: Path): Boolean =
    try {
      // CREATE_NEW-equivalent atomic publish: createFile claims the slot
      // atomically (O_EXCL); the ATOMIC_MOVE then fills it with a pure
      // rename(2) — REPLACE_EXISTING without ATOMIC_MOVE would DELETE
      // the target first, and in that window another committer's
      // createFile claims the same version: a silent lost update.
      Files.createFile(target)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        false
    }

  override def withFileLock[T](lockFile: Path)(body: => T): T = {
    val ch = FileChannel.open(lockFile,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val l = ch.lock()
      try body finally l.release()
    } finally ch.close()
  }

  override def linkOrCopy(src: Path, dst: Path): Unit =
    try Files.createLink(dst, src)
    catch { case _: Exception => Files.copy(src, dst) }
}

/** The active implementation (a seam, not a config knob: tests and a
  * future object-store port swap it; production code never reads it
  * directly — CollectionMeta/Collection route through [[FileIO.impl]]). */
object FileIO {
  @volatile var impl: FileIO = LocalFileIO
}
