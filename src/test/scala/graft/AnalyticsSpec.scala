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
