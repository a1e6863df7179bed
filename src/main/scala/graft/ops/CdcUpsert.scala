package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tools.Stage._

/** ONE operator surface for the CDC upsert spectrum (VERDICT r9 item 8).
  *
  * q87/q95/q96/q97 used to carry three hand-wired apply loops in
  * `Relational2`; every query, spec, and scale probe now routes through
  * this object, and a state LAYOUT is a [[Policy]] value, not a fourth
  * copy of the loop:
  *
  *   - [[Rewrite]]     — read-optimized pole: every epoch folds the
  *     previous full state with the batch delta and rewrites it
  *     (`statePath/vN`, versioned for at-least-once replay). Write cost
  *     ∝ STATE size — q87's documented trade.
  *   - [[Mor]]         — write-optimized pole: epochs append one O(batch)
  *     delta to a [[graft.tools.LogState]] log; every `compactEvery`
  *     epochs base+deltas fold into a new base; readers merge through the
  *     same monoid.
  *   - [[Partitioned]] — the 100 TB shape: a [[graft.tools.RangeState]]
  *     key-range-partitioned log; deltas route by frozen boundaries,
  *     fan-in compaction touches only partitions whose own delta count
  *     filled up, and point lookups prune to ONE partition's log.
  *
  * All three share one merge monoid ([[fold]]: count-sum + struct-max
  * latest-wins) and one delta aggregate ([[deltaOf]]) — the property that
  * makes every layout produce the same table is that they fold the same
  * monoid over different file arrangements, and having exactly one
  * definition of it here is what keeps the folds from drifting apart
  * (schedule invariance in MorUpsertSpec/PartitionedStateSpec depends on
  * it). A new layout (e.g. a secondary index) is a new `Policy` case and
  * three small branches, not a new loop.
  *
  * Replay contract (all policies): every write is an overwrite keyed by
  * `epoch`, derived only from the engine-replayed batch plus state
  * strictly older than `epoch` — so foreachBatch's at-least-once replay
  * rewrites the same files from the same inputs. GC only deletes what no
  * replay can read again (see [[graft.tools.LogState]]).
  *
  * Spectrum context: the LSM trade per O'Neil et al. (Acta Informatica
  * 1996); the reference's own load step is a plain overwrite
  * (`flows/etl.py:289-311`) — the spectrum is the scale generalization. */
object CdcUpsert {

  /** A state-table maintenance protocol. `name` keys the q97 gate rows. */
  sealed trait Policy { def name: String }

  /** Read-optimized: epoch N rewrites the full state at `statePath/vN`. */
  case object Rewrite extends Policy { val name = "q87_rewrite" }

  /** Write-optimized merge-on-read log; `compactEvery<=0` disables
    * compaction (pure delta log). */
  final case class Mor(compactEvery: Int = 4) extends Policy {
    val name = "q95_mor"
  }

  /** Key-range-partitioned merge-on-read state; per-partition fan-in
    * compaction at `maxDeltas` pending deltas (`<=0` disables). */
  final case class Partitioned(numPartitions: Int = 8, maxDeltas: Int = 3)
      extends Policy {
    val name = "q96_partitioned"
  }

  /** [[Partitioned]] primary state PLUS a value-partitioned secondary
    * index over each key's LATEST `event_type` — the "next layout" the
    * unification was built for: one new Policy case, no fourth loop.
    *
    * The index is its own log-structured state under `statePath/index`:
    * posting entries `(user_id, v, epoch, del)` hashed by `v` into
    * `indexBuckets` partition logs ([[indexBucketOf]] — String.hashCode,
    * JLS-pinned, so the JVM-side lookup and the Spark-side write agree
    * with no shared hash infrastructure). Maintenance per batch is
    * O(batch + touched-partition state): the batch keys' PRIOR latest
    * value comes from reading only the primary partitions the batch
    * touches (as of `epoch-1` — replay-safe, [[graft.tools.LogState.gc]]
    * keeps everything a replay can read), and a key whose latest value
    * moved from A to B appends a tombstone to A's index partition and an
    * add to B's. Epoch-max supersession ([[indexFold]]) makes the fold
    * schedule-invariant, so index compaction is the same pure
    * performance dial as the primary's.
    *
    * A value lookup then reads ONE index partition's log — never the
    * primary table, never the other postings — the q99 gate oracles both
    * the posting lists and that partition count. Routing is the native
    * [[graft.functions.JavaStringHash]] expression, so plan size is O(1)
    * at any attribute cardinality (ADVICE r10 — formerly a per-batch
    * driver collect + when-chain over the distinct values); posting
    * LISTS still pay off most on selective attributes, where a lookup's
    * result is far smaller than the primary table. */
  final case class Indexed(inner: Partitioned = Partitioned(),
                           indexBuckets: Int = 4) extends Policy {
    val name = "q99_indexed"
  }

  /** The merge monoid every layout folds (read-time merge, compaction,
    * delta-over-delta grouping): count-sum + struct-max latest-wins
    * (event_id breaks ts ties inside the struct ordering). Commutative
    * and associative, which is what moves correctness to read time for
    * the log layouts and makes `compactEvery`/`maxDeltas` pure
    * performance dials. */
  def fold(state: DataFrame): DataFrame =
    state.groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"), max(col("last")).as("last"))

  /** One delta row per key in the batch, in exactly the state schema
    * [[fold]] merges: event count + the (ts, event_id, …)-max struct. */
  def deltaOf(batch: DataFrame): DataFrame =
    batch.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("last"))

  /** The secondary index's fold: per (key, value) the NEWEST epoch's
    * liveness wins — an add at epoch 5 supersedes a tombstone at epoch 3
    * and vice versa. At most one entry per (key, value, epoch) exists by
    * construction (a batch produces one transition per key), so the
    * struct-max is total. Commutative + associative over epochs, which is
    * what lets index compaction run on the fan-in schedule. */
  def indexFold(entries: DataFrame): DataFrame =
    entries.groupBy(col("user_id"), col("v"))
      .agg(max(struct(col("epoch"), col("del"))).as("m"))
      .select(col("user_id"), col("v"),
        col("m.epoch").as("epoch"), col("m.del").as("del"))

  /** Index partition of value `v`: String.hashCode (stable by the JLS —
    * already the repo's cross-engine hash twin in the ETL enrichment) mod
    * `buckets`. Both the Spark-side write routing and the JVM-side lookup
    * call exactly this. */
  def indexBucketOf(v: String, buckets: Int): Int =
    math.floorMod(v.hashCode, buckets)

  // -------------------------------------------------------------------
  // Rewrite layout mechanics (the log layouts live in LogState/RangeState)
  // -------------------------------------------------------------------

  private def rewriteVersions(statePath: String,
                              upTo: Long = Long.MaxValue): Seq[Long] =
    Option(new java.io.File(statePath).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .filter(_ <= upTo).sorted.toSeq

  /** Frozen key-range boundaries of a [[Partitioned]] state — derived
    * ONCE from the first batch's key distribution via approx-quantiles
    * (CDC key spaces are skewed in general; a dense id space would seed
    * [[graft.tools.RangeState.freezeUniform]] instead), persisted
    * write-once by [[graft.tools.RangeState.freeze]] — see there for why
    * freezing is load-bearing across replays. */
  private[graft] def boundaries(batch: DataFrame, statePath: String,
                                numPartitions: Int): Array[Long] =
    graft.tools.RangeState.freeze(statePath, {
      val probs = (1 until numPartitions).map(_.toDouble / numPartitions)
      batch.stat.approxQuantile("user_id", probs.toArray, 0.001)
        .map(_.toLong)
    })

  // -------------------------------------------------------------------
  // The one apply surface
  // -------------------------------------------------------------------

  /** Apply one change batch to the state under `statePath` per `policy`.
    * Safe to call from `foreachBatch` (at-least-once) or directly from a
    * deterministic epoch loop (the q97 gate and the replay specs do) —
    * the replay contract in the object doc holds for every branch.
    * Steady-state epoch cost lands in the `epochNNN` phase; the amortized
    * compaction term is recorded separately as `compactNNN` so it cannot
    * masquerade as steady-state cost. */
  def applyBatch(batch: DataFrame, epoch: Long, statePath: String,
                 policy: Policy): Unit = policy match {
    case Rewrite =>
      require(rewriteVersions(statePath).forall(_ <= epoch),
        s"state under $statePath is newer than batch $epoch — stale " +
          "statePath with a fresh checkpoint?")
      val t0 = System.nanoTime()
      val prev = s"$statePath/v${epoch - 1}"
      val d = deltaOf(batch)
      // VERSIONED rewrite: epoch N reads v(N-1) — immutable — folds it
      // with the delta through the shared monoid (union + fold ≡ the
      // full-outer merge: sum over coalesced counts, greatest over
      // structs), and overwrites vN. A replay rewrites vN from the same
      // unchanged inputs — idempotent, where an in-place merge would
      // double-apply the delta.
      val merged =
        if (new java.io.File(prev).exists())
          fold(batch.sparkSession.read.parquet(prev).unionByName(d))
        else d
      merged.write.mode("overwrite").parquet(s"$statePath/v$epoch")
      // GC two behind: the engine only ever replays the LAST uncommitted
      // batch, so v(N-2) is unreachable once vN is written.
      graft.tools.TempDirs.deleteRecursively(s"$statePath/v${epoch - 2}")
      graft.tools.PhaseTiming.record(f"epoch$epoch%03d",
        (System.nanoTime() - t0) / 1e9)

    case Mor(compactEvery) =>
      val sp = batch.sparkSession
      graft.tools.LogState.requireNoFuture(statePath, epoch)
      val t0 = System.nanoTime()
      deltaOf(batch).write.mode("overwrite")
        .parquet(s"$statePath/delta/v$epoch")
      graft.tools.PhaseTiming.record(f"epoch$epoch%03d",
        (System.nanoTime() - t0) / 1e9)
      graft.tools.LogState.maintain(sp, Seq(statePath), epoch,
        compactEvery)(fold)

    case Partitioned(numPartitions, maxDeltas) =>
      val sp = batch.sparkSession
      val t0 = System.nanoTime()
      val bounds = boundaries(batch, statePath, numPartitions)
      graft.tools.RangeState.requireNoFuture(statePath, epoch)
      val touched = graft.tools.RangeState.publishDelta(statePath, epoch,
        deltaOf(batch),
        graft.tools.RangeState.bucketCol(bounds, col("user_id")))
      graft.tools.PhaseTiming.record(f"epoch$epoch%03d",
        (System.nanoTime() - t0) / 1e9)
      val tc = System.nanoTime()
      val compacted = graft.tools.RangeState.maintainTouched(sp, touched,
        epoch, maxDeltas)(fold)
      if (compacted > 0)
        graft.tools.PhaseTiming.record(f"compact$epoch%03d",
          (System.nanoTime() - tc) / 1e9)
      // Mechanism observability (bench routing map, beside the oracled
      // q97 layout gate): partitions this batch wrote vs the table's
      // width, and how many fan-in compaction actually folded. Key-local
      // traffic shows touched ≪ total; the uniform gate corpus shows
      // touched ≈ total — honest accounting either way.
      graft.tools.RoutingMetrics.add("q96_touched_parts",
        touched.size.toLong)
      graft.tools.RoutingMetrics.add("q96_total_parts",
        graft.tools.RangeState.partDirs(statePath).size.toLong)
      graft.tools.RoutingMetrics.add("q96_compacted_parts",
        compacted.toLong)

    case Indexed(inner, indexBuckets) =>
      val sp = batch.sparkSession
      val indexRoot = s"$statePath/index"
      graft.tools.RangeState.requireNoFuture(indexRoot, epoch)
      // guard the primary too BEFORE the as-of read below — the inner
      // apply re-checks, but by then the index would already be written
      graft.tools.RangeState.requireNoFuture(statePath, epoch)
      val t0 = System.nanoTime()
      val bounds = boundaries(batch, statePath, inner.numPartitions)
      val d = deltaOf(batch).stage()
      // Prior latest value of the batch's keys, read from ONLY the
      // primary partitions the batch touches, as of epoch-1 (strictly
      // older than this epoch — the replay contract; GC keeps that
      // readable until the next batch commits). This is the O(touched)
      // read-modify term a secondary index fundamentally needs: you
      // cannot tombstone the old posting without knowing the old value.
      val touchedBuckets = d
        .select(graft.tools.RangeState.bucketCol(bounds, col("user_id")).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val priorPaths = graft.tools.RangeState.pathsForBuckets(statePath,
        touchedBuckets, epoch - 1)
      val prior =
        if (priorPaths.isEmpty) None
        else Some(fold(sp.read.parquet(priorPaths: _*))
          .join(d.select(col("user_id")), Seq("user_id"), "left_semi")
          .stage())
      val newV = prior.map(p => fold(d.unionByName(p))).getOrElse(d)
        .select(col("user_id"), col("last.event_type").as("v"))
      val withOld = prior match {
        case Some(p) => newV.join(
          p.select(col("user_id"), col("last.event_type").as("old_v")),
          Seq("user_id"), "left_outer")
        case None => newV.withColumn("old_v", lit(null).cast("string"))
      }
      // Only MEMBERSHIP changes write postings: first-seen keys and
      // latest-value transitions. A key whose count changed but whose
      // latest value did not costs the index nothing. Null-SAFE
      // inequality (ADVICE r10): a key whose latest value transitions
      // a → NULL must still tombstone a's posting — the non-null-safe
      // `=!=` was null-false there and left the key in a's list. NULL
      // values themselves do not index (the add below keeps only
      // non-null `v`): a NULL-latest key is findable only through the
      // primary, the same contract as a SQL index's NULL exclusion.
      val changed = withOld
        .filter(!(col("old_v") <=> col("v")))
        .stage()
      val entries = changed.filter(col("v").isNotNull)
        .select(col("user_id"), col("v"), lit(epoch).as("epoch"),
          lit(false).as("del"))
        .unionByName(changed.filter(col("old_v").isNotNull)
          .select(col("user_id"), col("old_v").as("v"),
            lit(epoch).as("epoch"), lit(true).as("del")))
      // Route postings to value-hash partitions through the native
      // String.hashCode expression — the Spark-side twin of
      // [[indexBucketOf]] (both are the JLS hash mod `buckets`, so the
      // JVM-side lookup derives the same bucket with no Spark job). The
      // former when-chain over driver-collected distinct values was
      // O(|domain|) in plan size and paid a collect per batch; this is
      // O(1) in plan size at any attribute cardinality (ADVICE r10).
      val bCol = pmod(
        graft.functions.JavaStringHash.java_string_hash(col("v")),
        lit(indexBuckets))
      val touchedIdx = graft.tools.RangeState.publishDelta(indexRoot,
        epoch, entries, bCol)
      graft.tools.PhaseTiming.record(f"idx$epoch%03d",
        (System.nanoTime() - t0) / 1e9)
      // Compaction GC (ADVICE r10): at fold time the per-partition view
      // is complete, so a (key, value) whose NEWEST entry is a tombstone
      // can be DROPPED from the compacted base rather than retained —
      // absence == not live, and lookups already filter `!del`. Without
      // this the base accumulates every (key, value) pair ever seen
      // (unbounded churn history on long-lived streams); with it the
      // base stays proportional to LIVE postings. Schedule invariance
      // holds: a later delta's add supersedes by presence (higher
      // epoch), and a later tombstone for an absent pair just folds to
      // an entry the next compaction drops again.
      graft.tools.RangeState.maintainTouched(sp, touchedIdx, epoch,
        inner.maxDeltas)(df => indexFold(df).filter(!col("del")))
      graft.tools.RoutingMetrics.add("q99_idx_touched",
        touchedIdx.size.toLong)
      // the primary state is exactly the inner policy's — same loop
      applyBatch(batch, epoch, statePath, inner)
  }

  // -------------------------------------------------------------------
  // Event-time lateness (quarantine wrapper over any policy)
  // -------------------------------------------------------------------

  private def wmFile(statePath: String, epoch: Long) =
    java.nio.file.Paths.get(statePath, "_wm", s"v$epoch")

  /** Watermark as of epoch (micros), None before the first write. */
  private[graft] def readWatermark(statePath: String,
                                   epoch: Long): Option[Long] = {
    val f = wmFile(statePath, epoch)
    if (java.nio.file.Files.exists(f))
      Some(new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Newest watermark at or below `epoch` — empty epochs write no file
    * (see [[applyBatchWithLateness]]), so the effective wm(k) for a
    * skipped epoch is wm of the last non-empty epoch before it, the
    * Structured Streaming rule that the watermark persists across empty
    * batches. None before any write. */
  private[graft] def readWatermarkAsOf(statePath: String,
                                       epoch: Long): Option[Long] = {
    val dir = java.nio.file.Paths.get(statePath, "_wm")
    if (!java.nio.file.Files.isDirectory(dir)) return None
    val versions = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      .filter(_ <= epoch)
    if (versions.isEmpty) None
    else readWatermark(statePath, versions.max)
  }

  /** [[applyBatch]] with an EVENT-TIME lateness bound — the disordered-
    * replay tolerance the epoch-monotone apply loop lacks on its own
    * (VERDICT r10 #7). Structured Streaming semantics: the watermark
    * after epoch k is `max(event time seen through k) - lateness`, and a
    * row of epoch k is LATE iff its event time is below the watermark
    * established by the PRIOR epochs. Late rows never touch the state —
    * they land in an epoch-keyed quarantine log
    * (`statePath/quarantine/vK`) for auditing/backfill; on-time rows
    * flow to the inner policy unchanged.
    *
    * Why quarantine instead of silently folding them in: the state's
    * merge monoid is latest-wins, so very old rows cannot change `last`
    * — but they WOULD inflate `n_events`, and a partitioned layout would
    * pay a touched-partition write for keys whose visible state cannot
    * change. Quarantining makes the cost of disorder O(late rows) and
    * auditable, with the counts oracled (q100).
    *
    * Replay contract preserved: the watermark file is an epoch-keyed
    * atomic overwrite derived only from the batch and epoch-1 state, the
    * quarantine write is an epoch-keyed overwrite, and the inner apply
    * keeps its own guards — a replayed epoch rewrites identical files. */
  def applyBatchWithLateness(batch: DataFrame, epoch: Long,
                             statePath: String, policy: Policy,
                             latenessMicros: Long): Unit =
    withLateness(batch, epoch, statePath, latenessMicros,
      unix_micros(col("ts")))(onTime =>
      applyBatch(onTime, epoch, statePath, policy))

  /** The GENERIC event-time lateness wrapper the CDC apply above and the
    * streaming dedup states share (VERDICT r11 #5): split `batch` on the
    * carried watermark evaluated over `tsUs` (an event-time expression
    * in MICROS over the batch's columns), quarantine the late rows
    * (epoch-keyed overwrite under `statePath/quarantine/v<epoch>`, with
    * `quarantine_epoch` stamped), hand the on-time subset to `apply`,
    * then advance the watermark from ALL arriving rows (late rows
    * included — Structured Streaming's rule; the max is monotone so
    * disorder can only hold the watermark, never regress it). Replay
    * contract: every write is an epoch-keyed atomic overwrite derived
    * from the batch and strictly-older state, so a replayed epoch
    * rewrites identical files no matter what `apply` does internally
    * (it keeps its own guards). */
  private[graft] def withLateness(batch: DataFrame, epoch: Long,
                                  statePath: String, latenessMicros: Long,
                                  tsUs: org.apache.spark.sql.Column)
                                 (apply: DataFrame => Unit): Unit = {
    val wmPrev = readWatermarkAsOf(statePath, epoch - 1)
    val late = wmPrev match {
      case Some(w) => batch.filter(tsUs < lit(w))
      case None    => batch.limit(0)
    }
    val onTime = wmPrev match {
      case Some(w) => batch.filter(tsUs >= lit(w))
      case None    => batch
    }
    late.withColumn("quarantine_epoch", lit(epoch))
      .write.mode("overwrite").parquet(s"$statePath/quarantine/v$epoch")
    apply(onTime)
    val mxRow = batch.agg(max(tsUs)).head()
    val mx = if (mxRow.isNullAt(0)) None else Some(mxRow.getLong(0))
    // An EMPTY batch writes no watermark file: wm(k) = wm(k-1) by the
    // walk-back read above (and an empty FIRST batch leaves no
    // Long.MinValue sentinel on disk). This mirrors the oracle's dense
    // running-max CTE, where an epoch with no rows contributes nothing
    // but the prior max carries forward (ADVICE r11).
    mx.foreach { m =>
      val newWm = math.max(wmPrev.getOrElse(Long.MinValue),
        m - latenessMicros)
      val f = wmFile(statePath, epoch)
      java.nio.file.Files.createDirectories(f.getParent)
      val tmp = java.nio.file.Paths.get(f.getParent.toString,
        s"v$epoch.tmp")
      java.nio.file.Files.write(tmp,
        newWm.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** All quarantined rows through epoch `upTo`, with their quarantine
    * epoch; None if nothing was ever quarantined. */
  def quarantineAsOf(sp: SparkSession, statePath: String,
                     upTo: Long): Option[DataFrame] = {
    val dirs = Option(new java.io.File(s"$statePath/quarantine").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .filter(_.getName.drop(1).toLong <= upTo)
      .map(_.getAbsolutePath).sorted
    if (dirs.isEmpty) None else Some(sp.read.parquet(dirs.toIndexedSeq: _*))
  }

  /** Merged view of the state as of epoch `upTo` (inclusive), `None`
    * before the first write lands. Rewrite reads the newest version at
    * or below `upTo` as-is (the read-optimized payoff: zero merge);
    * the log layouts fold base + later deltas through [[fold]]. */
  def stateAsOf(sp: SparkSession, statePath: String, upTo: Long,
                policy: Policy): Option[DataFrame] = policy match {
    case Rewrite =>
      rewriteVersions(statePath, upTo).lastOption
        .map(v => sp.read.parquet(s"$statePath/v$v"))
    case _: Mor =>
      val paths = graft.tools.LogState.pathsAsOf(statePath, upTo)
      if (paths.isEmpty) None else Some(fold(sp.read.parquet(paths: _*)))
    case _: Partitioned =>
      val paths = graft.tools.RangeState.pathsAsOf(statePath, upTo)
      if (paths.isEmpty) None else Some(fold(sp.read.parquet(paths: _*)))
    case Indexed(inner, _) => stateAsOf(sp, statePath, upTo, inner)
  }

  /** Rows the epoch's state write produced — the quantity the q97 layout
    * gate oracles per epoch × protocol. For the log layouts this is the
    * O(batch) delta contract (distinct keys in the batch; a
    * read-modify-write bug would make it cumulative and break the hash);
    * for Rewrite it IS the cumulative key count — the write-amplification
    * contrast, now oracled rather than only narrated. Counts delta files
    * even after a later compaction GC'd them only if they still exist;
    * call at apply time (the gate does). */
  def rowsWrittenAt(sp: SparkSession, statePath: String, epoch: Long,
                    policy: Policy): Long =
    writtenFrameAt(sp, statePath, epoch, policy).map(_.count()).getOrElse(0L)

  /** The epoch's state-write frame itself (None when the epoch wrote no
    * delta files) — [[rowsWrittenAt]] is its count. Exposed so the q97
    * layout gate can fold the per-(arm, epoch) `delta_rows` and
    * `state_rows` observations into ONE Spark action (a tagged union of
    * the two counts) instead of two back-to-back count jobs: on a
    * contended scheduler every job pays a ~100 ms dispatch floor, and
    * the gate runs 12 (arm, epoch) observation pairs. */
  def writtenFrameAt(sp: SparkSession, statePath: String, epoch: Long,
                     policy: Policy): Option[DataFrame] = policy match {
    case Rewrite =>
      Some(sp.read.parquet(s"$statePath/v$epoch"))
    case _: Mor =>
      Some(sp.read.parquet(s"$statePath/delta/v$epoch"))
    case _: Partitioned =>
      val paths = graft.tools.RangeState.partDirs(statePath)
        .map(p => s"$p/delta/v$epoch")
        .filter(p => new java.io.File(p).isDirectory)
      if (paths.isEmpty) None else Some(sp.read.parquet(paths: _*))
    case Indexed(inner, _) => writtenFrameAt(sp, statePath, epoch, inner)
  }

  /** Point lookup: the state row for `key` plus HOW MANY partition logs
    * were listed to find it — the pruning evidence the q98 gate oracles.
    * [[Partitioned]] routes `key` through the frozen boundaries JVM-side
    * and reads ONLY its partition's log (`partsListed` == 1 at any state
    * size — if this branch ever regressed to scanning the table, the
    * count and the gate hash break). The unpartitioned policies read the
    * whole state (their documented pole: one log == one "partition"). */
  def keyLookup(sp: SparkSession, statePath: String, key: Long,
                policy: Policy): (Option[DataFrame], Long) = policy match {
    case Partitioned(_, _) =>
      val bounds = graft.tools.RangeState.readBoundaries(statePath)
      val paths = graft.tools.RangeState.pathsForBuckets(statePath,
        Seq(graft.tools.RangeState.bucketOf(bounds, key)), Long.MaxValue)
      // parts actually LISTED, parsed from the resolved paths — not an
      // assumed constant: a regression to pathsAsOf shows up here
      val parts = paths.flatMap(
        _.split('/').find(_.startsWith("p="))).distinct.size.toLong
      val df =
        if (paths.isEmpty) None
        else Some(fold(sp.read.parquet(paths: _*))
          .filter(col("user_id") === key))
      (df, parts)
    case Indexed(inner, _) => keyLookup(sp, statePath, key, inner)
    case p =>
      (stateAsOf(sp, statePath, Long.MaxValue, p)
        .map(_.filter(col("user_id") === key)), 1L)
  }

  /** Posting-list lookup by index value, plus HOW MANY index partition
    * logs were listed — the pruning evidence the q99 gate oracles. Routes
    * `value` through [[indexBucketOf]] JVM-side and reads ONLY that
    * partition's log; `partsListed` == 1 at any index size (a regression
    * to scanning the index table shows up in the count, and in the gate
    * hash). Returns live keys whose CURRENT latest `event_type` is
    * `value` — tombstone supersession happens in [[indexFold]]. */
  def indexLookup(sp: SparkSession, statePath: String, value: String,
                  policy: Indexed): (Option[DataFrame], Long) = {
    val b = indexBucketOf(value, policy.indexBuckets)
    val paths = graft.tools.RangeState.pathsForBuckets(s"$statePath/index",
      Seq(b), Long.MaxValue)
    val parts = paths.flatMap(_.split('/').find(_.startsWith("p=")))
      .distinct.size.toLong
    val df =
      if (paths.isEmpty) None
      else Some(indexFold(sp.read.parquet(paths: _*))
        .filter(col("v") === lit(value) && !col("del"))
        .select(col("user_id")))
    (df, parts)
  }
}
