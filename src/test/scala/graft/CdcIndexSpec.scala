package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.CdcUpsert

/** Invariants of the secondary-index CDC layout ([[CdcUpsert.Indexed]]) —
  * the q99 gate DuckDB-checks the posting lists on the fixture's uniform
  * traffic; these pin what that traffic can't show: tombstone churn
  * (a key's latest value moving A→B→A), out-of-order deliveries that must
  * NOT move membership, schedule invariance of index compaction, and
  * single-partition lookup pruning. */
class CdcIndexSpec extends SparkSpec {

  private val policy = CdcUpsert.Indexed(CdcUpsert.Partitioned(4, 2), 4)

  private def events: DataFrame =
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))

  private def batch(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  private def lookup(statePath: String, v: String): (Set[Long], Long) = {
    val (dfOpt, parts) = CdcUpsert.indexLookup(spark, statePath, v, policy)
    (dfOpt.map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty),
      parts)
  }

  test("index == latest-per-key recompute on fixture traffic, every value, " +
      "one partition listed per lookup") {
    val statePath = TempDirsSpecHelper.fresh("graft-idx-fixture")
    try {
      val ev = events.localCheckpoint()
      (0 until 6).foreach { k =>
        CdcUpsert.applyBatch(ev.filter(pmod(col("event_id"), lit(6)) === k),
          k.toLong, statePath, policy)
      }
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val want = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val byType = want.groupBy(_._2).map { case (v, ks) =>
        v -> ks.map(_._1).toSet }
      byType.foreach { case (v, keys) =>
        val (got, parts) = lookup(statePath, v)
        assert(parts == 1L, s"lookup($v) listed $parts index partitions")
        assert(got == keys,
          s"posting list for $v: ${got.size} keys vs oracle ${keys.size}")
      }
      // posting lists partition the key space: no key in two lists
      val all = byType.keys.toSeq.flatMap(v => lookup(statePath, v)._1)
      assert(all.size == all.distinct.size && all.size == want.length)
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("tombstone churn: membership follows A -> B -> A transitions") {
    val statePath = TempDirsSpecHelper.fresh("graft-idx-churn")
    try {
      // key 1 transitions a -> b -> a; key 2 stays at a throughout
      CdcUpsert.applyBatch(batch(Seq((0L, 10L, 1L, "a", 1.0),
        (1L, 10L, 2L, "a", 1.0))), 0L, statePath, policy)
      assert(lookup(statePath, "a")._1 == Set(1L, 2L))
      CdcUpsert.applyBatch(batch(Seq((2L, 20L, 1L, "b", 1.0))),
        1L, statePath, policy)
      assert(lookup(statePath, "a")._1 == Set(2L), "missing tombstone for 1@a")
      assert(lookup(statePath, "b")._1 == Set(1L))
      CdcUpsert.applyBatch(batch(Seq((3L, 30L, 1L, "a", 1.0))),
        2L, statePath, policy)
      assert(lookup(statePath, "a")._1 == Set(1L, 2L),
        "re-add after tombstone must supersede (epoch-max, not sticky delete)")
      assert(lookup(statePath, "b")._1 == Set.empty[Long])
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("out-of-order delivery below the current latest does not move " +
      "membership; count-only updates write no postings") {
    val statePath = TempDirsSpecHelper.fresh("graft-idx-late")
    try {
      CdcUpsert.applyBatch(batch(Seq((0L, 100L, 1L, "a", 1.0))),
        0L, statePath, policy)
      // late event (ts 50 < 100) of another type: latest stays "a"
      CdcUpsert.applyBatch(batch(Seq((1L, 50L, 1L, "z", 1.0))),
        1L, statePath, policy)
      assert(lookup(statePath, "a")._1 == Set(1L))
      assert(lookup(statePath, "z")._1 == Set.empty[Long],
        "a late event must not become the indexed latest value")
      // same-type newer event: membership unchanged, epoch 2 writes no
      // index delta (no index partition holds a delta/v2)
      CdcUpsert.applyBatch(batch(Seq((2L, 200L, 1L, "a", 1.0))),
        2L, statePath, policy)
      assert(lookup(statePath, "a")._1 == Set(1L))
      val idxDeltas = graft.tools.RangeState.partDirs(s"$statePath/index")
        .flatMap(p => graft.tools.LogState.versions(p, "delta"))
      assert(!idxDeltas.contains(2L),
        "a count-only update must not write index postings")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("10k-distinct-value attribute routes with an O(1) plan: postings " +
      "correct, one partition per lookup") {
    // The former when-chain routing was O(|domain|) in plan size and
    // driver-collected the domain per batch; the JavaStringHash routing
    // must handle a high-cardinality attribute with the same two-
    // instruction plan. 10k distinct values across 10k keys, then a
    // churn batch that moves a slice of keys to fresh values.
    val statePath = TempDirsSpecHelper.fresh("graft-idx-10k")
    try {
      val b0 = batch((0 until 10000).map { i =>
        (i.toLong, 10L, i.toLong, f"v$i%05d", 1.0)
      })
      CdcUpsert.applyBatch(b0, 0L, statePath, policy)
      val b1 = batch((0 until 100).map { i =>
        (10000L + i, 20L, i.toLong, f"w$i%05d", 1.0)
      })
      CdcUpsert.applyBatch(b1, 1L, statePath, policy)
      Seq(0, 42, 99).foreach { i =>
        val (gotW, partsW) = lookup(statePath, f"w$i%05d")
        assert(partsW == 1L && gotW == Set(i.toLong))
        val (gotOld, _) = lookup(statePath, f"v$i%05d")
        assert(gotOld.isEmpty, s"v$i%05d must be tombstoned after churn")
      }
      val (gotStay, parts) = lookup(statePath, "v00500")
      assert(parts == 1L && gotStay == Set(500L))
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("a -> NULL latest transition tombstones the old posting; NULL " +
      "values never index") {
    val statePath = TempDirsSpecHelper.fresh("graft-idx-null")
    try {
      CdcUpsert.applyBatch(batch(Seq((0L, 10L, 1L, "a", 1.0))),
        0L, statePath, policy)
      assert(lookup(statePath, "a")._1 == Set(1L))
      // newest event's type is NULL: the key leaves a's list (null-safe
      // inequality — ADVICE r10) and is findable only via the primary
      import spark.implicits._
      val nullBatch = Seq((1L, 20L, 1L))
        .toDF("event_id", "ts_us", "user_id")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), lit(null).cast("string").as("event_type"),
          lit(2.0).as("value"))
      CdcUpsert.applyBatch(nullBatch, 1L, statePath, policy)
      assert(lookup(statePath, "a")._1 == Set.empty[Long],
        "NULL-latest key must be tombstoned out of its old posting list")
      val primary = CdcUpsert.stateAsOf(spark, statePath, 1L, policy)
        .get.filter(col("user_id") === 1L).collect()
      assert(primary.length == 1 && primary(0).getAs[org.apache.spark.sql.Row]("last").isNullAt(2))
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("index compaction schedule never changes the posting lists") {
    def run(maxDeltas: Int): Map[String, Set[Long]] = {
      val statePath = TempDirsSpecHelper.fresh(s"graft-idx-sched$maxDeltas")
      try {
        val p = CdcUpsert.Indexed(CdcUpsert.Partitioned(4, maxDeltas), 4)
        val ev = events.localCheckpoint()
        (0 until 6).foreach { k =>
          CdcUpsert.applyBatch(ev.filter(pmod(col("event_id"), lit(6)) === k),
            k.toLong, statePath, p)
        }
        val vs = ev.select(col("event_type")).distinct()
          .collect().map(_.getString(0)).sorted
        vs.map { v =>
          v -> CdcUpsert.indexLookup(spark, statePath, v, p)
            ._1.map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
        }.toMap
      } finally graft.tools.TempDirs.deleteRecursively(
        statePath.stripSuffix("/state"))
    }
    val never = run(0)
    val always = run(1)
    val some = run(3)
    assert(never == always && always == some,
      "index fold must be schedule-invariant (compaction is a dial)")
  }
}
