package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CdcUpsert

/** Protocol invariants of the merge-on-read CDC upsert (q95) — the bitwise
  * final table is DuckDB-gated (same oracle as q87); these drive the
  * shared apply body `CdcUpsert.applyBatch(Mor)` directly to pin the
  * properties the gate can't see: replay idempotence, the
  * compaction-schedule invariance that makes `compactEvery` a pure
  * performance dial, write cost ∝ batch (the operator's reason to exist),
  * and GC never deleting state a replay could still read. */
class MorUpsertSpec extends SparkSpec {

  private def batches: Seq[DataFrame] = {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    // deterministic 6-way split; any batching must yield the same state
    (0 until 6).map(i => ev.filter(pmod(col("event_id"), lit(6)) === i))
  }

  private def runLoop(compactEvery: Int): String = {
    val statePath = TempDirsSpecHelper.fresh("graft-mor-spec")
    batches.zipWithIndex.foreach { case (b, i) =>
      CdcUpsert.applyBatch(b, i.toLong, statePath,
        CdcUpsert.Mor(compactEvery))
    }
    statePath
  }

  private def finalState(statePath: String): Map[Long, (Long, Long)] =
    CdcUpsert.stateAsOf(spark, statePath, Long.MaxValue,
        CdcUpsert.Mor(0)).get
      .select(col("user_id"), col("n_events"),
        unix_micros(col("last.ts")).as("last_us"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  // the real layout parser, not a reimplementation: layout assertions
  // must exercise what production reads
  private def versions(statePath: String, kind: String): Seq[Long] =
    graft.tools.LogState.versions(statePath, kind)

  test("compaction schedule never changes the result (monoid fold)") {
    // no compaction / every epoch / every other epoch: same merged state
    val never = runLoop(0)
    val always = runLoop(1)
    val some = runLoop(2)
    try {
      val want = finalState(never)
      assert(want.nonEmpty)
      assert(finalState(always) == want)
      assert(finalState(some) == want)
      // and the layouts really differ (the dial did something):
      assert(versions(never, "base").isEmpty &&
        versions(never, "delta").size == 6)
      assert(versions(always, "base").nonEmpty)
    } finally Seq(never, always, some)
      .foreach(graft.tools.TempDirs.deleteRecursively)
  }

  test("replay of the last batch is idempotent, even after its GC ran") {
    // compactEvery=2 → batch 5 wrote base v5 AND its GC (licensed by base
    // v3, the newest ≤ 4) already swept deltas ≤ 3. foreachBatch is
    // at-least-once: a crash after batch 5's writes re-runs batch 5
    // against exactly this post-GC layout — it must reproduce the state
    // bitwise, not double-apply or fail on missing inputs.
    val statePath = runLoop(2)
    try {
      val before = finalState(statePath)
      val layoutBefore = (versions(statePath, "base"),
        versions(statePath, "delta"))
      CdcUpsert.applyBatch(batches(5), 5L, statePath, CdcUpsert.Mor(2))
      assert(finalState(statePath) == before)
      assert((versions(statePath, "base"),
        versions(statePath, "delta")) == layoutBefore)
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("steady-state epoch writes one row per batch key — cost ∝ batch, " +
      "flat in state size") {
    val statePath = runLoop(0) // no compaction: every delta survives
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        val keys = b.select(col("user_id")).distinct().count()
        val wrote = spark.read.parquet(s"$statePath/delta/v$i").count()
        assert(wrote == keys,
          s"epoch $i wrote $wrote rows for $keys batch keys")
      }
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("epoch write cost is flat in state size: a one-key batch writes " +
      "one row against full-corpus state (q87 would rewrite every key)") {
    val statePath = TempDirsSpecHelper.fresh("graft-mor-flat")
    try {
      val ev = Tables.events(spark, sf)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
      CdcUpsert.applyBatch(ev, 0L, statePath, CdcUpsert.Mor(0)) // state: all keys
      val stateKeys =
        CdcUpsert.stateAsOf(spark, statePath, 0L, CdcUpsert.Mor(0)).get.count()
      assert(stateKeys > 1)
      val oneUser = ev.orderBy(col("user_id")).limit(1)
        .select(col("user_id")).collect().head.getLong(0)
      CdcUpsert.applyBatch(ev.filter(col("user_id") === oneUser),
        1L, statePath, CdcUpsert.Mor(0))
      assert(spark.read.parquet(s"$statePath/delta/v1").count() == 1L)
      // and the merged view still reflects every key
      assert(CdcUpsert.stateAsOf(spark, statePath, 1L, CdcUpsert.Mor(0))
        .get.count() == stateKeys)
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("stale-statePath reuse fails loudly: future state at apply time, " +
      "below-floor reads at as-of time") {
    val statePath = runLoop(2) // layout: bases {3,5}, deltas {4,5}
    try {
      // a wiped checkpoint restarting at batch 0 against this state must
      // throw, not silently overwrite delta v0 and fold a mixed history
      intercept[IllegalArgumentException] {
        CdcUpsert.applyBatch(batches(0), 0L, statePath, CdcUpsert.Mor(2))
      }
      // a time-travel read below the GC floor must throw, not read as
      // "no state yet"
      intercept[IllegalArgumentException] {
        graft.tools.LogState.pathsAsOf(statePath, 2L)
      }
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("GC keeps exactly the readable suffix: newest licensed base and " +
      "everything after it") {
    val statePath = runLoop(2) // bases at v1, v3, v5
    try {
      val bases = versions(statePath, "base")
      val deltas = versions(statePath, "delta")
      // batch 5's GC is licensed by the newest base ≤ 4 (= v3): bases
      // below 3 and deltas ≤ 3 are gone; v3 survives as the replay floor
      assert(bases == Seq(3L, 5L))
      assert(deltas == Seq(4L, 5L))
      // the pre-GC floor still reconstructs every as-of view a replay of
      // the last (only replayable) batch needs
      assert(CdcUpsert.stateAsOf(spark, statePath, 4L, CdcUpsert.Mor(2))
        .get.count() > 0)
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }
}

/** Test-only temp-dir naming that cannot collide across the suite's runs. */
private object TempDirsSpecHelper {
  def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/state"
}
