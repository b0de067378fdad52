package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.2.9).
  *
  * Every transform here is a plain DataFrame → DataFrame function, so the
  * SAME code runs batch (oracle-checked through the Sessions pack: q60/q62
  * use identical expressions) and streaming (StreamingSpec drives them
  * through MemoryStream micro-batches and asserts parity with the batch
  * run). That batch/stream unification is the point of Structured
  * Streaming — and the reason the engine needs no separate streaming
  * operator implementations.
  *
  * Scale notes: streaming state (window aggs, session state, dedup state)
  * is partitioned by group key across executors exactly like a batch
  * shuffle; watermarks bound state size — an unbounded-state streaming
  * query is the streaming equivalent of an unpartitioned window.
  */
object EventStreams {

  /** Tumbling 1-day counts per event type (streaming: complete/update). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("day_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding windows: 1 day every 12 hours. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("n_events"))

  /** Gap-based session aggregation per user (4-hour gap). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "4 hours").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("s.start").as("s_start"), col("s.end").as("s_end"),
        col("n_events"), col("sum_value"))

  /** Watermarked tumbling aggregate — append mode emits a window only
    * once the watermark passes its end; later-than-watermark events drop.
    */
  def watermarkedTumbling(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "1 hour"))

  /** Stateful dedup by event_id with bounded state (watermark-scoped). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each click pairs with the view it
    * followed (same user, click within 1 hour after the view) — the
    * attribution join, with BOTH sides unbounded. Watermarks on both
    * inputs plus the event-time range condition are what bound the join
    * state: Spark retains a side's rows only until the other side's
    * watermark passes the interval, so state is O(window), not O(stream).
    * At 100 TB/day this is the only join shape that works stream-to-
    * stream — an unconstrained equi-join would buffer both streams
    * forever (and Spark rejects it in append mode without the bounds).
    */
  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("view_ts"),
      col("event_id").as("view_id")).withWatermark("view_ts", "2 hours")
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
      col("event_id").as("click_id")).withWatermark("click_ts", "2 hours")
    v.join(c, expr(
      """v_user = c_user AND
        |click_ts > view_ts AND click_ts <= view_ts + interval 1 hour""".stripMargin))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Left-outer variant: views with NO click inside the hour still emit
    * (null click columns) — but only once the click-side watermark has
    * passed the interval end, which is when "no match" becomes final.
    * The semantics every funnel/abandonment report needs; same bounded
    * state as the inner form.
    */
  def viewClickJoinOuter(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("view_ts"),
      col("event_id").as("view_id")).withWatermark("view_ts", "2 hours")
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
      col("event_id").as("click_id")).withWatermark("click_ts", "2 hours")
    v.join(c, expr(
      """v_user = c_user AND
        |click_ts > view_ts AND click_ts <= view_ts + interval 1 hour""".stripMargin),
      "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Stream-static enrichment join: the unbounded event stream joins a
    * bounded dimension table (user → cohort). The static side is planned
    * per micro-batch as an ordinary broadcast hash join — no streaming
    * state at all, the 100-TB-stream-side default for dimension
    * enrichment. LEFT OUTER on the stream side: an event whose user is
    * missing from the dimension must survive with a null cohort —
    * silently dropping facts because a dim row lagged is the classic
    * enrichment-pipeline data-loss bug.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"), col("cohort"))
}
