package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props — FIXTURES.md).
  *
  * The reference has no streaming (SURVEY §2.10) — its paginated scrape
  * loop is bounded iteration. This module is the mandated extension:
  * watermarked tumbling/sliding/session windows, streaming dedup, and
  * custom sessionization state via flatMapGroupsWithState.
  *
  * All transforms take a DataFrame so they run identically on a
  * MemoryStream-backed stream (unit tests), a file/kafka stream, or a
  * batch frame. State stores are keyed by the same columns the shuffles
  * use, so at scale each stateful operator is one shuffle onto the state
  * partitioning, and the watermark bounds state size — no unbounded
  * accumulation.
  */
object StreamingOps {

  /** Tumbling-window counts with a watermark: late rows beyond 10 minutes
    * are dropped and window state is evicted — bounded state at any rate. */
  def tumblingCounts(events: DataFrame, window_ : String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows: gap-based grouping per user, built-in state. */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming dedup on event_id within the watermark horizon — the
    * streaming twin of the reference's drop_duplicates: state holds one
    * key per event inside the horizon, evicted as the watermark advances. */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases matched to the clicks that
    * preceded them within `horizon` for the same user. Both sides carry a
    * watermark + the time-range join condition, which is what bounds each
    * side's join state (rows age out once the watermark passes the
    * horizon) — without both, state grows forever. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
                      horizon: String = "30 minutes",
                      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"))
  }

  // ---------------------------------------------------------------------
  // Custom sessionization state (flatMapGroupsWithState)
  // ---------------------------------------------------------------------

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Custom per-user sessionization with explicit state + EVENT-TIME
    * timeout — the escape hatch for session semantics session_window can't
    * express (here: emit on gap > gapMs using event time carried in state).
    * State is one small record per active user key.
    *
    * The timeout is what closes the LAST session per user in a continuous
    * stream: once the watermark passes `session_end + gap`, the group fires
    * with hasTimedOut, the open session is emitted, and its state is
    * evicted — without it the final session never emits and state leaks
    * one record per ever-seen user. */
  def sessionize(events: Dataset[Event], gapMs: Long = 5 * 60 * 1000L,
                 watermark: String = "10 minutes")
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new rows: close and evict
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(st.start),
              new Timestamp(st.last), st.n, st.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            for (e <- sorted) {
              val t = e.ts.getTime
              if (st == null) {
                st = SessionState(t, t, 1, e.value)
              } else if (t - st.last > gapMs) {
                out += SessionOut(userId, new Timestamp(st.start),
                  new Timestamp(st.last), st.n, st.sum)
                st = SessionState(t, t, 1, e.value)
              } else {
                st = SessionState(st.start, t, st.n + 1, st.sum + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              // fire once the watermark passes the session's gap horizon
              // (must be strictly beyond the current watermark or Spark
              // rejects the timestamp)
              state.setTimeoutTimestamp(
                math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            out.iterator
          }
      }
  }
}
