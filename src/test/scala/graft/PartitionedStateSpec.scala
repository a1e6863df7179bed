package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CdcUpsert

/** Protocol invariants of the key-range-partitioned MOR upsert (q96) —
  * the bitwise final table is DuckDB-gated (same oracle as q87/q95); these
  * pin the properties the gate's uniform traffic can't show: a one-key
  * batch leaves every other partition's file tree bitwise untouched
  * (the operator's reason to exist), per-partition fan-in compaction
  * confined to touched partitions, frozen boundaries, replay idempotence
  * around the compaction/GC windows, and point-lookup pruning. */
class PartitionedStateSpec extends SparkSpec {

  private val P = 4
  private def events: DataFrame =
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))

  private def batches: Seq[DataFrame] =
    (0 until 6).map(i => events.filter(pmod(col("event_id"), lit(6)) === i))

  private def runLoop(maxDeltas: Int): String = {
    val statePath = TempDirsSpecHelper.fresh("graft-q96-spec")
    batches.zipWithIndex.foreach { case (b, i) =>
      CdcUpsert.applyBatch(b, i.toLong, statePath,
        CdcUpsert.Partitioned(P, maxDeltas))
    }
    statePath
  }

  private def finalState(statePath: String): Map[Long, (Long, Long)] =
    CdcUpsert.stateAsOf(spark, statePath, Long.MaxValue,
      CdcUpsert.Partitioned(P, 0)).get
      .select(col("user_id"), col("n_events"),
        unix_micros(col("last.ts")).as("last_us"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def versions(root: String, kind: String): Seq[Long] =
    graft.tools.LogState.versions(root, kind)

  private def partDirs(statePath: String): Seq[String] =
    Option(new java.io.File(statePath).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
      .map(_.getAbsolutePath).sorted.toSeq

  /** Every regular file under `dir` with size and mtime — "bitwise
    * untouched" means this snapshot is equal, not just that the same
    * paths exist. */
  private def tree(dir: String): Set[(String, Long, Long)] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => (f.toString, java.nio.file.Files.size(f),
          java.nio.file.Files.getLastModifiedTime(f).toMillis))
        .toSet
      finally walk.close()
    }
  }

  test("fan-in schedule never changes the result, and the oracle is the " +
      "unpartitioned MOR fold") {
    val never = runLoop(0)
    val always = runLoop(1)
    val some = runLoop(3)
    // reference: the q95 loop (already DuckDB-gated) on the same batches
    val mor = TempDirsSpecHelper.fresh("graft-q96-ref")
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        CdcUpsert.applyBatch(b, i.toLong, mor, CdcUpsert.Mor(0))
      }
      val want = CdcUpsert.stateAsOf(spark, mor, Long.MaxValue,
        CdcUpsert.Mor(0)).get
        .select(col("user_id"), col("n_events"),
          unix_micros(col("last.ts")).as("last_us"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(want.nonEmpty)
      assert(finalState(never) == want)
      assert(finalState(always) == want)
      assert(finalState(some) == want)
      // the dial did something: no bases ever vs bases in every partition
      assert(partDirs(never).forall(versions(_, "base").isEmpty))
      assert(partDirs(always).exists(versions(_, "base").nonEmpty))
      // and the keys really spread over multiple range partitions
      assert(partDirs(never).size > 1)
    } finally Seq(never, always, some, mor)
      .foreach(graft.tools.TempDirs.deleteRecursively)
  }

  test("a one-key batch touches exactly one partition; every other " +
      "partition's file tree is bitwise untouched") {
    val statePath = TempDirsSpecHelper.fresh("graft-q96-sparse")
    try {
      CdcUpsert.applyBatch(events, 0L, statePath,
        CdcUpsert.Partitioned(P, 0))
      val parts = partDirs(statePath)
      assert(parts.size > 1, "fixture keys must span multiple ranges")
      val oneUser = events.orderBy(col("user_id")).limit(1)
        .select(col("user_id")).collect().head.getLong(0)
      val before = parts.map(d => d -> tree(d)).toMap
      val boundsBefore = tree(statePath).filter(_._1.contains("_boundaries"))
      CdcUpsert.applyBatch(events.filter(col("user_id") === oneUser),
        1L, statePath, CdcUpsert.Partitioned(P, 0))
      val gained = parts.filter(d => tree(d) != before(d))
      assert(gained.size == 1, s"expected 1 touched partition, got $gained")
      // the touched partition gained exactly the one-row delta v1
      assert(spark.read.parquet(s"${gained.head}/delta/v1").count() == 1L)
      // boundaries were frozen at batch 0 and not rewritten
      assert(tree(statePath).filter(_._1.contains("_boundaries"))
        == boundsBefore)
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("fan-in compaction fires per partition, only where the delta " +
      "count filled up, and GC defers one touch") {
    val statePath = TempDirsSpecHelper.fresh("graft-q96-fanin")
    try {
      CdcUpsert.applyBatch(events, 0L, statePath,
        CdcUpsert.Partitioned(P, 3))
      val parts = partDirs(statePath)
      val oneUser = events.orderBy(col("user_id")).limit(1)
        .select(col("user_id")).collect().head.getLong(0)
      val oneKey = events.filter(col("user_id") === oneUser)
      // deltas v0,v1,v2 in the hot partition → fan-in 3 reached at batch 2
      CdcUpsert.applyBatch(oneKey, 1L, statePath, CdcUpsert.Partitioned(P, 3))
      CdcUpsert.applyBatch(oneKey, 2L, statePath, CdcUpsert.Partitioned(P, 3))
      val hot = parts.filter(versions(_, "base").nonEmpty)
      assert(hot.size == 1, s"exactly the hot partition compacts, got $hot")
      assert(versions(hot.head, "base") == Seq(2L))
      // compaction at batch 2 is licensed to GC only by bases ≤ 1 (none):
      // the folded deltas survive until the NEXT touch
      assert(versions(hot.head, "delta") == Seq(0L, 1L, 2L))
      CdcUpsert.applyBatch(oneKey, 3L, statePath, CdcUpsert.Partitioned(P, 3))
      assert(versions(hot.head, "base") == Seq(2L))
      assert(versions(hot.head, "delta") == Seq(3L))
      // cold partitions: still exactly their batch-0 delta, no base
      (parts.toSet - hot.head).foreach { d =>
        assert(versions(d, "base").isEmpty && versions(d, "delta") == Seq(0L))
      }
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("replays are idempotent: of a compacting batch, and of the last " +
      "batch after compaction+GC ran") {
    val statePath = runLoop(3)
    try {
      val before = finalState(statePath)
      val layout = partDirs(statePath)
        .map(d => d -> (versions(d, "base"), versions(d, "delta"))).toMap
      // replay the last batch (foreachBatch is at-least-once)
      CdcUpsert.applyBatch(batches(5), 5L, statePath,
        CdcUpsert.Partitioned(P, 3))
      assert(finalState(statePath) == before)
      assert(partDirs(statePath)
        .map(d => d -> (versions(d, "base"), versions(d, "delta"))).toMap
        == layout)
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("stale-statePath reuse fails loudly") {
    val statePath = runLoop(3)
    try {
      intercept[IllegalArgumentException] {
        CdcUpsert.applyBatch(batches(0), 0L, statePath,
          CdcUpsert.Partitioned(P, 3))
      }
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }

  test("point lookup prunes to one partition and agrees with the global " +
      "fold") {
    val statePath = runLoop(3)
    try {
      val want = finalState(statePath)
      val key = want.keys.min
      val (dfOpt, parts) = CdcUpsert.keyLookup(spark, statePath, key,
        CdcUpsert.Partitioned(P, 3))
      val row = dfOpt.get
        .select(col("user_id"), col("n_events"),
          unix_micros(col("last.ts")).as("last_us"))
        .collect()
      assert(row.length == 1)
      assert(parts == 1L, s"point lookup listed $parts partitions, want 1")
      assert((row.head.getLong(1), row.head.getLong(2)) == want(key))
    } finally graft.tools.TempDirs.deleteRecursively(statePath)
  }
}
