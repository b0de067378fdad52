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
}
