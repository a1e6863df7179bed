package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, SessionOut}

/** Streaming semantics via MemoryStream golden runs (no DuckDB oracle for
  * state — SURVEY §7.4). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  private def runToBatch[T](streamDf: org.apache.spark.sql.DataFrame,
                            name: String,
                            mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = streamDf.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  private def eventsStream(events: Seq[Event]): MemoryStream[Event] = {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(events: _*)
    ms
  }

  test("tumbling window counts with watermark (complete over closed windows)") {
    val ms = eventsStream(Seq(
      Event(1, ts(0, 10), 1, "click", 1.0),
      Event(2, ts(1, 20), 1, "click", 2.0),
      Event(3, ts(6, 0), 2, "view", 3.0),   // next 5-min window
      Event(4, ts(20, 0), 2, "view", 4.0))) // advances watermark past both
    val out = runToBatch(
      StreamingOps.tumblingCounts(ms.toDF(), "5 minutes", "1 minutes"),
      "tumbling_out")
      .select("window_start", "event_type", "n").as[(Timestamp, String, Long)]
      .collect().toSet
    assert(out.contains((ts(0), "click", 2L)))
    assert(out.contains((ts(5), "view", 1L)))
  }

  test("streaming dedup within watermark drops re-sent event_ids") {
    val ms = eventsStream(Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(0, 30), 1, "click", 1.0), // duplicate id inside horizon
      Event(2, ts(1), 1, "click", 1.0)))
    val out = runToBatch(
      StreamingOps.dedupWithinWatermark(ms.toDF().withColumn("props", lit("{}")),
        "10 minutes"),
      "dedup_out")
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("session windows group by gap per user") {
    val ms = eventsStream(Seq(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(2), 7, "click", 2.0),   // same session (gap < 5m)
      Event(3, ts(20), 7, "click", 3.0),  // new session
      Event(4, ts(40), 7, "click", 0.0))) // watermark push
    val out = runToBatch(
      StreamingOps.sessionCounts(ms.toDF(), "5 minutes", "1 minutes"),
      "session_out")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq.sorted
    assert(out.contains((7L, 2L))) // first session has 2 events
  }

  test("custom sessionization (flatMapGroupsWithState) emits closed sessions") {
    implicit val s = spark
    val ms = eventsStream(Seq(
      Event(1, ts(0), 1, "click", 1.5),
      Event(2, ts(1), 1, "click", 2.5),
      Event(3, ts(30), 1, "click", 9.0))) // gap > 5m closes first session
    val out = runToBatch(
      StreamingOps.sessionize(ms.toDS()).toDF(), "sessionize_out")
      .as[SessionOut].collect()
    assert(out.length == 1)
    val sess = out.head
    assert(sess.user_id == 1L && sess.n_events == 2 && sess.sum_value == 4.0)
    assert(sess.session_start == ts(0) && sess.session_end == ts(1))
  }

  test("stream-stream interval join matches clicks to later purchases") {
    val clicks = eventsStream(Seq(
      Event(1, ts(0), 7, "click", 0),
      Event(2, ts(50), 7, "click", 0)))  // too late for the purchase
    val purchases = eventsStream(Seq(
      Event(10, ts(20), 7, "purchase", 5.0),
      Event(11, ts(20), 8, "purchase", 5.0))) // different user
    val out = runToBatch(
      StreamingOps.clickToPurchase(clicks.toDF(), purchases.toDF()),
      "ssjoin_out")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L))) // click@0 → purchase@20 (within 30m)
  }

  test("checkpointed file sink: streaming output lands as parquet") {
    val base = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ms = eventsStream(Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "view", 2.0)))
    val q = ms.toDF().writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(s"$base/out")
    assert(back.count() == 2)
    assert(new java.io.File(s"$base/ckpt").exists) // offsets/commits recorded
  }

  test("streaming transforms run identically on a batch frame") {
    // the same tumblingCounts plan works in batch mode (no watermark state)
    val batch = Seq(
      Event(1, ts(0, 10), 1, "click", 1.0),
      Event(2, ts(1, 20), 1, "click", 2.0)).toDF()
    val out = StreamingOps.tumblingCounts(batch)
      .select("event_type", "n").as[(String, Long)].collect().toSeq
    assert(out == Seq(("click", 2L)))
  }
}
