package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CdcUpsert

/** Event-time lateness semantics of [[CdcUpsert.applyBatchWithLateness]]
  * on hand-built batches: watermark recurrence, quarantine routing,
  * state exclusion, and replay idempotence — the q100 gate covers the
  * fixture-scale end-to-end, these pin the boundary rules. */
class CdcLateSpec extends SparkSpec {

  private val policy = CdcUpsert.Mor(0)

  private def batch(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  test("watermark advances from ALL arriving rows; rows below the PRIOR " +
      "watermark quarantine; the boundary row (ts == wm) is on time") {
    val statePath = TempDirsSpecHelper.fresh("graft-late-basic")
    try {
      // epoch 0: max ts 100, lateness 50 → wm = 50; nothing is ever late
      // in the first epoch (no prior watermark)
      CdcUpsert.applyBatchWithLateness(batch(Seq(
        (0L, 100L, 1L, "a", 1.0), (1L, 10L, 2L, "a", 1.0))),
        0L, statePath, policy, latenessMicros = 50L)
      assert(CdcUpsert.readWatermark(statePath, 0L).contains(50L))
      assert(CdcUpsert.quarantineAsOf(spark, statePath, 0L)
        .forall(_.count() == 0))
      // epoch 1: ts 40 < wm(0)=50 → quarantined; ts 50 == wm → on time;
      // ts 200 advances wm to 150
      CdcUpsert.applyBatchWithLateness(batch(Seq(
        (2L, 40L, 1L, "b", 1.0), (3L, 50L, 2L, "b", 1.0),
        (4L, 200L, 3L, "a", 1.0))),
        1L, statePath, policy, latenessMicros = 50L)
      assert(CdcUpsert.readWatermark(statePath, 1L).contains(150L))
      val quar = CdcUpsert.quarantineAsOf(spark, statePath, 1L).get
      assert(quar.select(col("event_id")).collect().map(_.getLong(0)).toSet
        == Set(2L))
      // state: user 1 keeps ONLY the epoch-0 row (late row excluded),
      // user 2 has both rows (boundary row accepted)
      val st = CdcUpsert.stateAsOf(spark, statePath, 1L, policy).get
        .select(col("user_id"), col("n_events"), col("last.event_type"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
      assert(st(1L) == ((1L, "a")), "late row must not reach the state")
      assert(st(2L) == ((2L, "b")))
      assert(st(3L) == ((1L, "a")))
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("watermark never regresses when a later epoch's max ts is older") {
    val statePath = TempDirsSpecHelper.fresh("graft-late-mono")
    try {
      CdcUpsert.applyBatchWithLateness(batch(Seq((0L, 1000L, 1L, "a", 1.0))),
        0L, statePath, policy, latenessMicros = 100L)
      assert(CdcUpsert.readWatermark(statePath, 0L).contains(900L))
      // epoch 1 max ts 950 → candidate wm 850 < 900 → wm stays 900
      CdcUpsert.applyBatchWithLateness(batch(Seq((1L, 950L, 1L, "a", 1.0))),
        1L, statePath, policy, latenessMicros = 100L)
      assert(CdcUpsert.readWatermark(statePath, 1L).contains(900L))
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("an EMPTY epoch writes no watermark file and the prior watermark " +
      "carries forward (ADVICE r11: wm(k) = wm(k-1) across empty batches)") {
    val statePath = TempDirsSpecHelper.fresh("graft-late-empty")
    try {
      // empty FIRST epoch: no file at all (no Long.MinValue sentinel)
      CdcUpsert.applyBatchWithLateness(batch(Seq.empty),
        0L, statePath, policy, latenessMicros = 50L)
      assert(CdcUpsert.readWatermark(statePath, 0L).isEmpty,
        "empty first epoch must not write a watermark file")
      // epoch 1: max ts 100 → wm = 50
      CdcUpsert.applyBatchWithLateness(batch(Seq((0L, 100L, 1L, "a", 1.0))),
        1L, statePath, policy, latenessMicros = 50L)
      assert(CdcUpsert.readWatermark(statePath, 1L).contains(50L))
      // empty MIDDLE epoch 2: no v2 file, wm(2) == wm(1) via walk-back
      CdcUpsert.applyBatchWithLateness(batch(Seq.empty),
        2L, statePath, policy, latenessMicros = 50L)
      assert(CdcUpsert.readWatermark(statePath, 2L).isEmpty)
      assert(CdcUpsert.readWatermarkAsOf(statePath, 2L).contains(50L))
      // epoch 3: ts 40 < carried wm(2)=50 → quarantined, NOT on-time
      // (the pre-fix divergence: a sparse oracle would have classified
      // this row on-time because epoch 2 had no watermark row)
      CdcUpsert.applyBatchWithLateness(batch(Seq(
        (1L, 40L, 1L, "b", 1.0), (2L, 60L, 2L, "a", 1.0))),
        3L, statePath, policy, latenessMicros = 50L)
      val quar = CdcUpsert.quarantineAsOf(spark, statePath, 3L).get
      assert(quar.select(col("event_id")).collect().map(_.getLong(0)).toSet
        == Set(1L), "watermark must survive the empty epoch")
      val st = CdcUpsert.stateAsOf(spark, statePath, 3L, policy).get
        .select(col("user_id"), col("last.event_type"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(st(1L) == "a", "late row must not reach the state")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("replaying the last epoch rewrites identical quarantine, state, " +
      "and watermark") {
    val statePath = TempDirsSpecHelper.fresh("graft-late-replay")
    try {
      val b0 = Seq((0L, 100L, 1L, "a", 1.0))
      val b1 = Seq((1L, 30L, 1L, "b", 2.0), (2L, 120L, 2L, "a", 1.0))
      CdcUpsert.applyBatchWithLateness(batch(b0), 0L, statePath, policy, 50L)
      CdcUpsert.applyBatchWithLateness(batch(b1), 1L, statePath, policy, 50L)
      def snapshot(): (Long, Set[Long], Seq[(Long, Long)]) = (
        CdcUpsert.readWatermark(statePath, 1L).get,
        CdcUpsert.quarantineAsOf(spark, statePath, 1L).get
          .select(col("event_id")).collect().map(_.getLong(0)).toSet,
        CdcUpsert.stateAsOf(spark, statePath, 1L, policy).get
          .select(col("user_id"), col("n_events")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
      val before = snapshot()
      // at-least-once replay of the final epoch
      CdcUpsert.applyBatchWithLateness(batch(b1), 1L, statePath, policy, 50L)
      assert(snapshot() == before, "lateness wrapper must be replay-idempotent")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }
}
