package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.streaming.{FunnelEvent, FunnelProcessor}

/** q94 funnel, streaming parity (VERDICT r3 item 7): the same staged
  * view→click→purchase logic as an incremental transformWithState
  * query over the REAL events fixture must reproduce the batch q94
  * answer exactly — upgrading the §2.2.9 arbitrary-state row from
  * spec-only toward a hard cross-surface signal.
  */
class StreamingFunnelSpec extends SparkSpec {

  test("transformWithState funnel over fixture events equals batch q94") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // Fixture events in event-time order, chunked into 3 micro-batches —
    // the in-order delivery the processor documents (a real deployment
    // gets this from watermark-ordered replay).
    val feed = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[FunnelEvent].collect()
      .sortBy(e => (e.ts_us, FunnelProcessor.stageRank(e.event_type)))
    val chunks = feed.grouped(math.max(feed.length / 3, 1)).toSeq

    val input = MemoryStream[FunnelEvent]
    val out = input.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "t_view_us", "t_click_us", "t_purchase_us", "stage")
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // Final state per user = max-stage emission (stages only advance,
      // timestamps are write-once; ties carry identical tuples).
      val streamed = spark.table("funnel_out")
        .groupBy("user_id")
        .agg(max(struct(col("stage"), col("t_view_us"), col("t_click_us"),
          col("t_purchase_us"))).as("m"))
        .select(col("user_id"), col("m.t_view_us"), col("m.t_click_us"),
          col("m.t_purchase_us"), col("m.stage"))
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.queries.Sessions.funnel(spark, sfDir)
        .select(col("user_id"),
          coalesce(col("t_view_us"), lit(-1L)).as("t_view_us"),
          coalesce(col("t_click_us"), lit(-1L)).as("t_click_us"),
          coalesce(col("t_purchase_us"), lit(-1L)).as("t_purchase_us"),
          col("stage"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        s"streaming funnel diverged from batch q94: " +
          s"stream=${streamed.take(3)}… batch=${batch.take(3)}…")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("equal-timestamp view/click/purchase advance all stages (stage-rank tie-break)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // Batch q94 accepts click at ts == t_view and purchase at ts ==
    // t_click (>= comparisons), so one shared timestamp legitimately
    // completes the funnel. Alphabetical tie-break ('click' < 'view')
    // would process the click first against unset t_view and drop it —
    // the ADVICE r4 divergence; stageRank ordering must not.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val t = 1000000L
    val input = MemoryStream[FunnelEvent]
    val out = input.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "t_view_us", "t_click_us", "t_purchase_us", "stage")
    val q = out.writeStream.format("memory").queryName("funnel_tie")
      .outputMode("update").start()
    try {
      // Deliberately adversarial arrival order within the batch.
      input.addData(Seq(
        FunnelEvent(7L, "purchase", t),
        FunnelEvent(7L, "click", t),
        FunnelEvent(7L, "view", t)))
      q.processAllAvailable()
      val r = spark.table("funnel_tie")
        .orderBy(col("stage").desc).head()
      assert(r.getInt(4) == 3, s"tie-broken funnel should complete, got $r")
      assert(r.getLong(1) == t && r.getLong(2) == t && r.getLong(3) == t)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
