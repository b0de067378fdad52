package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.EventStreams

/** Event row fed through MemoryStream (top-level for encoder derivation). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Streaming parity: the same EventStreams transforms, run as
  * MemoryStream micro-batch queries, must agree with their batch runs
  * (SURVEY.md §5.2 item 6). Covers: replayable source, tumbling/sliding/
  * session windows, watermark late-data drop, stateful dedup, arbitrary
  * state via flatMapGroupsWithState.
  */
class StreamingSpec extends SparkSpec {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Ev(1, t("2024-01-01 00:10:00"), 1, "view", 1.0),
    Ev(2, t("2024-01-01 01:10:00"), 1, "click", 2.0),
    Ev(3, t("2024-01-01 02:10:00"), 2, "view", 3.0),
    Ev(4, t("2024-01-01 13:00:00"), 2, "view", 4.0),
    Ev(5, t("2024-01-02 01:00:00"), 1, "view", 5.0))
  private val batch2 = Seq(
    Ev(6, t("2024-01-02 02:00:00"), 2, "click", 6.0),
    Ev(7, t("2024-01-02 23:30:00"), 1, "view", 7.0),
    Ev(8, t("2024-01-03 00:30:00"), 3, "view", 8.0))
  private val all = batch1 ++ batch2

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def runParity(name: String, fn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = fn(input.toDF()).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val streamed = canon(spark.table(name))
      val batched = canon(fn(all.toDF()))
      assert(streamed == batched, s"$name: stream $streamed vs batch $batched")
    } finally q.stop()
  }

  test("tumbling window agg: streaming equals batch") {
    runParity("tumbling_parity", EventStreams.tumblingCounts)
  }

  test("sliding window agg: streaming equals batch") {
    runParity("sliding_parity", EventStreams.slidingCounts)
  }

  test("session window agg: streaming equals batch") {
    runParity("session_parity", EventStreams.sessionCounts)
  }

  test("watermark drops events later than the threshold") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.watermarkedTumbling(input.toDF()).writeStream
      .format("memory").queryName("wm_out").outputMode("append").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      // Advance the watermark far past Jan 1 (event at Jan 5 → watermark
      // Jan 4 23:00), closing the Jan 1 window.
      input.addData(Seq(Ev(100, t("2024-01-05 00:00:00"), 9, "view", 0.0)))
      q.processAllAvailable()
      val afterClose = spark.table("wm_out").count()
      assert(afterClose >= 1, "closed windows should have been appended")
      // A straggler from Jan 1 is later than the watermark: dropped.
      input.addData(Seq(Ev(101, t("2024-01-01 03:00:00"), 1, "view", 99.0)))
      q.processAllAvailable()
      val jan1 = spark.table("wm_out")
        .filter(col("day_start") === t("2024-01-01 00:00:00"))
        .agg(sum("n_events")).head.getLong(0)
      assert(jan1 == 4, s"late event must not re-open the Jan 1 window, got $jan1 events")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes duplicate event_ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(input.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(Seq(
        Ev(1, t("2024-01-01 00:10:00"), 1, "view", 1.0),
        Ev(1, t("2024-01-01 00:11:00"), 1, "view", 1.0), // in-batch dup
        Ev(2, t("2024-01-01 00:12:00"), 1, "click", 2.0)))
      q.processAllAvailable()
      input.addData(Seq(
        Ev(2, t("2024-01-01 00:20:00"), 1, "click", 2.0))) // cross-batch dup
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join with watermarks equals the batch join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val errors = MemoryStream[Ev]
    def joined(p: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) = {
      val pw = p.select(col("user_id"), col("ts").as("p_ts"), col("value"))
      val ew = e.select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      pw.join(ew,
        col("user_id") === col("e_user") &&
        col("p_ts") >= col("e_ts") &&
        col("p_ts") < col("e_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("p_ts"), col("e_ts"), col("value"))
    }
    val q = joined(
        purchases.toDF().withWatermark("ts", "2 hours"),
        errors.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      val pRows = Seq(
        Ev(1, t("2024-01-01 10:30:00"), 1, "purchase", 5.0),
        Ev(2, t("2024-01-01 12:30:00"), 1, "purchase", 7.0),
        Ev(3, t("2024-01-01 10:40:00"), 2, "purchase", 9.0))
      val eRows = Seq(
        Ev(10, t("2024-01-01 10:00:00"), 1, "error", 0.0),
        Ev(11, t("2024-01-01 10:20:00"), 2, "error", 0.0))
      purchases.addData(pRows); errors.addData(eRows); q.processAllAvailable()
      // Advance both watermarks so all joinable pairs are emitted.
      purchases.addData(Seq(Ev(99, t("2024-01-02 00:00:00"), 9, "purchase", 0.0)))
      errors.addData(Seq(Ev(98, t("2024-01-02 00:00:00"), 9, "error", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .filter(col("user_id") < 9).collect().map(_.toString).sorted.toSeq
      val batched = joined(pRows.toDF(), eRows.toDF())
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batched, s"stream $streamed vs batch $batched")
      assert(batched.size == 2) // u1@10:30 joins e@10:00; u2@10:40 joins e@10:20
    } finally q.stop()
  }

  test("streaming parquet file sink (append mode) writes the deduped rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(input.toDF()).writeStream
      .format("parquet")
      .option("path", s"$base/data")
      .option("checkpointLocation", s"$base/chk")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        Ev(1, t("2024-01-01 00:10:00"), 1, "view", 1.0),
        Ev(1, t("2024-01-01 00:11:00"), 1, "view", 1.0),
        Ev(2, t("2024-01-01 00:12:00"), 1, "click", 2.0)))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/data")
      assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState running count equals batch groupBy count") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val counted = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((uid, n))
      }.toDF("user_id", "running_n")
    val q = counted.writeStream
      .format("memory").queryName("state_out").outputMode("update").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val finalCounts = spark.table("state_out")
        .groupBy("user_id").agg(max("running_n").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchCounts = all.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
      assert(finalCounts == batchCounts)
    } finally q.stop()
  }
}
