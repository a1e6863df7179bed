package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** Funnel / cohort / bloom-join semantics on hand-computable event logs. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** Events fixture with ts as NANOS LONGS (the fixture encoding
    * Tables.events expects); hours keep the arithmetic readable. */
  private def events(rows: (Long, Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-analytics").toString
    val base = 1704067200000000000L // 2024-01-01T00:00Z in ns
    rows.zipWithIndex.map { case ((user, hour, typ), i) =>
      (i.toLong, base + hour * 3600L * 1000000000L, user, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel counts ordered step prefixes only") {
    val dir = events(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "purchase"), // full funnel
      (2L, 0L, "view"),                                          // stops at view
      (3L, 5L, "view"), (3L, 1L, "click"),                       // click BEFORE view
      (4L, 0L, "view"), (4L, 1L, "click"), (4L, 0L, "purchase")) // buy before click
    val r = Analytics.funnel(spark, dir).collect().head
    assert(r.getLong(0) == 4)  // all four users viewed
    assert(r.getLong(1) == 2)  // users 1 and 4 clicked after viewing
    assert(r.getLong(2) == 1)  // only user 1 purchased after clicking
  }

  test("funnel sequential matching: clicks both before AND after the view count") {
    // the min-time approximation (min(click) < min(view) => not converted)
    // would misclassify user 5, whose first click precedes the view but
    // who clicks again after it — true sequential matching counts them
    val dir = events(
      (5L, 0L, "click"), (5L, 1L, "view"), (5L, 2L, "click"), (5L, 3L, "purchase"),
      (6L, 0L, "click"), (6L, 1L, "view"))                     // no click after view
    val r = Analytics.funnel(spark, dir).collect().head
    assert(r.getLong(0) == 2)  // both users viewed
    assert(r.getLong(1) == 1)  // only user 5 clicked AFTER the view
    assert(r.getLong(2) == 1)  // and purchased after that click
  }

  test("approx quantile lands inside the exact q±0.01 rank envelope") {
    // percentile_approx returns an actual data value while percentile
    // interpolates between ranks, so VALUE-space comparison misleads in
    // sparse tails — the sketch's guarantee is on RANK, and that is what
    // is asserted: each approx cut must lie within the exact quantile
    // envelope one rank-percent either side.
    val bounds = graft.Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.49D, 0.51D, 0.94D, 0.96D, 0.98D, 1.0D))")
        .as("b"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val rows = Analytics.q88ApproxQuantile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = bounds(r.getString(0))
      for ((col, lo, hi) <- Seq((1, b(0), b(1)), (3, b(2), b(3)), (5, b(4), b(5)))) {
        val approx = r.getDouble(col)
        assert(approx >= lo && approx <= hi,
          s"${r.getString(0)} quantile col $col: $approx outside [$lo, $hi]")
      }
    }
  }

  test("cohort cells count distinct users at exact day offsets") {
    val dir = events(
      (1L, 0L, "view"), (1L, 25L, "view"), (1L, 26L, "view"), // day0 + two day1 events
      (2L, 1L, "view"),                                       // day0 only
      (3L, 24L, "click"), (3L, 72L, "view"))                  // cohort day1, back day3
    val cells = Analytics.cohort(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(cells == Set(
      ("2024-01-01", 0, 2L),  // users 1,2 on their first day
      ("2024-01-01", 1, 1L),  // user 1 returns next day (two events, one user)
      ("2024-01-02", 0, 1L),  // user 3's cohort day
      ("2024-01-02", 2, 1L))) // user 3 back two days after ITS cohort day
  }

  test("count-min sketch: overestimates within eps*N, merge is exact") {
    import graft.functions.{CountMin, CountMinAggregator}
    val (d, w) = (4, 64)
    val agg = new CountMinAggregator(d, w)
    val keys = (1 to 500).map(i => s"k${i % 37}") // 37 distinct, skewed-ish
    val sketch = keys.foldLeft(agg.zero)(agg.reduce)
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, n) =>
      val e = CountMin.estimate(sketch, d, w, k)
      assert(e >= n, s"CMS must never underestimate ($k)")
      assert(e <= n + math.ceil(math.E / w * keys.size).toLong * 2,
        s"estimate for $k way over the eps*N bound")
    }
    // two half-stream sketches merged == the one-pass sketch, exactly
    val (l, r) = keys.splitAt(250)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == sketch.toSeq)
  }

  test("cms heavy hitters: estimates dominate exact counts on the fixture") {
    val rows = Analytics.cmsHeavyHitters(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("streaming CMS: folded sketch equals the one-pass sketch exactly; " +
      "replay idempotent; gate decision matches batch (r15 verdict #5)") {
    import spark.implicits._
    // cross-epoch addition is the claim: every token's mass is split
    // across both batches, so neither per-epoch sketch alone suffices
    val toks = Seq.tabulate(40)(i => s"w${i % 8}").toDF("token")
      .withColumn("occ", monotonically_increasing_id())
      .localCheckpoint()
    val (d, w) = (4, 64)
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-cmsstream-spec").toString + "/state"
    try {
      Analytics.cmsStreamApplyBatch(
        toks.filter(col("occ") % 2 === 0).select(col("token")),
        0L, statePath, d, w, compactEvery = 2)
      Analytics.cmsStreamApplyBatch(
        toks.filter(col("occ") % 2 === 1).select(col("token")),
        1L, statePath, d, w, compactEvery = 2)
      val folded = Analytics.cmsStreamSketch(spark, statePath, 1L, d, w).get
      // one-pass reference via the aggregator itself
      val agg = new graft.functions.CountMinAggregator(d, w)
      val onePass = toks.select(col("token")).collect().map(_.getString(0))
        .foldLeft(agg.zero)(agg.reduce)
      assert(folded.toSeq == onePass.toSeq,
        "folded streaming sketch differs from the one-pass sketch")
      // replay of the last epoch rewrites identical cells
      Analytics.cmsStreamApplyBatch(
        toks.filter(col("occ") % 2 === 1).select(col("token")),
        1L, statePath, d, w, compactEvery = 2)
      val replayed = Analytics.cmsStreamSketch(spark, statePath, 1L, d, w).get
      assert(replayed.toSeq == folded.toSeq, "replay changed the fold")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
    // the gated decision layer agrees with the batch gate bitwise
    val stream = Analytics.cmsHeavyStreamClustered(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    val batch = Analytics.cmsHeavyClustered(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(stream == batch, "streaming CMS gate diverges from batch gate")
  }

  test("redaction leaves no live email or digit run behind") {
    val rows = graft.ops.TextAnalysis.redact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(1)
      assert(!t.matches(".*[0-9].*"), s"digits survived: $t")
      assert(!t.contains("@example.com"), "planted email survived")
      assert(t.contains("<email>") && t.contains("<num>"),
        "planted PII should have been rewritten to placeholders")
      assert(r.getLong(2) >= 2, "at least the planted email + number")
    }
  }

  test("random projection approximately preserves pairwise distance ratios") {
    // Johnson–Lindenstrauss sanity: for fixture vector pairs, the 16-dim
    // distance correlates with the 64-dim distance (same ordering for a
    // well-separated pair vs a close pair, scaled by dim ratio)
    val proj = graft.ops.Similarity.project(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getDouble).toArray).toMap
    val orig = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(20)
    val ratios = for (Seq(a, b) <- ids.combinations(2).toSeq.take(50))
      yield d2(proj(a), proj(b)) / d2(orig(a), orig(b))
    val mean = ratios.sum / ratios.size
    // E[ratio] = 16 (sum of 16 ±1-combinations of 64 dims); huge slack
    assert(mean > 16 * 0.5 && mean < 16 * 2.0, s"mean distance ratio $mean")
  }

  test("profile emits a coherent one-row health report") {
    val r = graft.ops.Analytics.profile(spark, sf).collect().head
    val n = Tables.events(spark, sf).count()
    assert(r.getLong(0) == n)
    assert(r.getLong(1) > 0 && r.getLong(1) <= n)  // users
    assert(r.getLong(2) > 0 && r.getLong(2) <= 10) // event types
    assert(r.getLong(5) <= r.getLong(6))           // ts range ordered
    assert(r.getDouble(7) <= r.getDouble(8))       // value range ordered
  }

  test("bloom-prefiltered semi join returns exactly the plain semi join") {
    val viaBloom = Analytics.bloomSemiJoin(spark, sf).collect().map(_.toSeq)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = Tables.lineitem(spark, sf)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag")).collect().map(_.toSeq)
    assert(viaBloom.toSeq == plain.toSeq)
  }
}
