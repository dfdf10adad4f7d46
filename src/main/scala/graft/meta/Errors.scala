package graft.meta

/** A `changefeed` window crossed a generation change that is NOT a
  * provable data-preserving compaction, so window rows cannot be
  * attributed and the chain walk refuses — replay from a full snapshot
  * instead (the refusal's standing advice). A DEDICATED type, not a
  * message-substring contract: consumers that can recover (e.g.
  * [[graft.ops.ClusterOps.componentsCycle]]'s exact full-snapshot
  * re-fold, which is safe because duplicate edges are idempotent) match
  * on this class, so a reworded diagnostic or a wrapping execution path
  * can never silently disable their fallback. Subclasses
  * IllegalArgumentException so every pre-existing caller contract
  * (specs included) is unchanged. */
class ChangeWindowCompactedException(msg: String)
  extends IllegalArgumentException(msg)
