package graft.tools

/** Versioned base/delta file layout for log-structured operator state —
  * the shared mechanics under the merge-on-read CDC upsert (q95) and the
  * streaming minhash dedup's band-index state.
  *
  * Layout under a state `root`:
  * {{{
  *   root/base/vN    — a compacted fold of all state as of batch N
  *   root/delta/vN   — batch N's append (one immutable file set per epoch)
  * }}}
  *
  * The state as of batch `upTo` is the newest base at or below `upTo`
  * plus every delta after it; how those paths FOLD is the operator's
  * business (q95 merges through its commutative monoid, the dedup index
  * is a plain union — both are schedule-invariant, which is what makes
  * `compactEvery` a pure performance dial).
  *
  * Replay contract (foreachBatch is at-least-once): every write is an
  * overwrite keyed by batchId deriving only from the engine-replayed
  * batch plus state strictly older than batchId, and [[gc]] deletes only
  * state below the newest base at or below batchId−1 — exactly what no
  * replay can ever read again (the engine replays at most the LAST
  * uncommitted batch; the base written by the current batch does not
  * license deletion until that batch commits). */
object LogState {

  /** Version numbers present under `root/kind`, ascending, ≤ `upTo`. */
  def versions(root: String, kind: String,
               upTo: Long = Long.MaxValue): Seq[Long] =
    Option(new java.io.File(s"$root/$kind").listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .filter(_ <= upTo).sorted.toSeq

  /** Parquet paths reconstructing the state as of batch `upTo`: the
    * newest base ≤ `upTo` plus every delta after it. Empty before the
    * first delta lands. */
  def pathsAsOf(root: String, upTo: Long): Seq[String] = {
    val base = versions(root, "base", upTo).lastOption
    val deltas = versions(root, "delta", upTo).filter(v => base.forall(_ < v))
    base.map(v => s"$root/base/v$v").toSeq ++
      deltas.map(v => s"$root/delta/v$v")
  }

  /** Parquet paths a batch-`batchId` COMPACTION must fold: the state as
    * of `batchId − 1` plus the delta the batch just wrote. Semantically
    * equal to [[pathsAsOf]]`(root, batchId)` in normal operation, but
    * NEVER includes `base/v(batchId)` itself — on an at-least-once replay
    * a stale base from the crashed attempt already sits at the output
    * path, and folding through [[pathsAsOf]] would read the very files
    * the overwrite is deleting (a self-overwrite race that is only
    * sometimes masked by a shuffle barrier in the fold). */
  def compactionInputs(root: String, batchId: Long): Seq[String] =
    pathsAsOf(root, batchId - 1) :+ s"$root/delta/v$batchId"

  /** Drop state no replay of batch > `batchId` can read: everything below
    * the newest base at or below `batchId − 1` (deferred one batch — see
    * the replay contract above). No-op until a base that old exists. */
  def gc(root: String, batchId: Long): Unit =
    versions(root, "base", batchId - 1).lastOption.foreach { b =>
      def sweep(kind: String, cut: Long => Boolean): Unit =
        versions(root, kind).filter(cut)
          .foreach(v => TempDirs.deleteRecursively(s"$root/$kind/v$v"))
      sweep("base", _ < b)
      sweep("delta", _ <= b)
    }
}
