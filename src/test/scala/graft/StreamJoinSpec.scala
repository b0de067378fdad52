package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Stream-stream and stream-static joins (SURVEY.md §2.2.9): the same
  * join program run over MemoryStreams must agree with its batch run.
  * The interval condition + dual watermarks are what make stream-stream
  * state bounded; the left-outer variant additionally pins WHEN a
  * no-match becomes final (only after the opposite watermark passes the
  * interval end).
  */
class StreamJoinSpec extends SparkSpec {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: click inside the hour; user 2: click too late (2h after);
  // user 3: no click at all. Flush events (users 8/9, no cross-match)
  // push both watermarks far enough to finalize users 1-3.
  private val views = Seq(
    Ev(1, t("2024-01-01 10:00:00"), 1, "view", 0.0),
    Ev(2, t("2024-01-01 10:00:00"), 2, "view", 0.0),
    Ev(3, t("2024-01-01 10:00:00"), 3, "view", 0.0))
  private val clicks = Seq(
    Ev(11, t("2024-01-01 10:30:00"), 1, "click", 0.0),
    Ev(12, t("2024-01-01 12:00:00"), 2, "click", 0.0))
  private val viewFlush = Ev(99, t("2024-01-01 20:00:00"), 9, "view", 0.0)
  private val clickFlush = Ev(98, t("2024-01-01 20:00:00"), 8, "click", 0.0)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def runJoin(name: String,
      fn: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
      : (Seq[String], Seq[String]) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val vIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    val q = fn(vIn.toDF(), cIn.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      vIn.addData(views); cIn.addData(clicks); q.processAllAvailable()
      vIn.addData(Seq(viewFlush)); cIn.addData(Seq(clickFlush)); q.processAllAvailable()
      // Watermarks computed at the end of one batch gate emission in the
      // NEXT — run one more (empty-input) batch to flush outer results.
      vIn.addData(Seq.empty[Ev]); cIn.addData(Seq.empty[Ev]); q.processAllAvailable()
      val streamed = canon(spark.table(name).filter(col("user_id") < 8))
      val batched = canon(
        fn((views :+ viewFlush).toDF(), (clicks :+ clickFlush).toDF())
          .filter(col("user_id") < 8))
      (streamed, batched)
    } finally q.stop()
  }

  test("stream-stream interval join: streaming equals batch") {
    val (streamed, batched) = runJoin("ssj_inner", EventStreams.viewClickJoin)
    assert(streamed.size == 1, s"exactly user 1's click matches: $streamed")
    assert(streamed == batched, s"stream $streamed vs batch $batched")
  }

  test("stream-stream LEFT OUTER join: no-match views emit nulls once the watermark finalizes them") {
    // Flush rows (users 8/9) are excluded from the comparison: their
    // no-match status is not yet final (nothing later advanced the
    // watermark past their interval), which is itself the semantics
    // under test — an outer result may only emit once it cannot be
    // contradicted by late data.
    val (streamed, batched) = runJoin("ssj_outer", EventStreams.viewClickJoinOuter)
    assert(streamed.size == 3, s"users 1 (matched), 2 and 3 (null click): $streamed")
    assert(streamed.count(_.contains("null")) == 2, s"users 2 and 3 unmatched: $streamed")
    assert(streamed == batched, s"stream $streamed vs batch $batched")
  }

  test("stream-static enrichment join: streaming equals batch, unknown user survives with null cohort") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("user_id", "cohort")
    // User 7 has NO dim row: left_outer must keep the event (null
    // cohort), never drop the fact because the dimension lagged.
    val unknown = Ev(21, t("2024-01-01 11:00:00"), 7, "view", 0.0)
    val in = MemoryStream[Ev]
    val q = EventStreams.enrichWithDim(in.toDF(), dim).writeStream
      .format("memory").queryName("ss_enrich").outputMode("append").start()
    try {
      in.addData(views); q.processAllAvailable()
      in.addData(clicks :+ unknown); q.processAllAvailable()
      val streamed = canon(spark.table("ss_enrich"))
      val batched = canon(EventStreams.enrichWithDim(
        (views ++ clicks :+ unknown).toDF(), dim))
      assert(streamed == batched, s"stream $streamed vs batch $batched")
      assert(streamed.size == 6, s"users 1-3 views + 1-2 clicks + unknown user 7: $streamed")
      assert(streamed.exists(r => r.contains("21") && r.contains("null")),
        s"user 7's event survives with null cohort: $streamed")
    } finally q.stop()
  }
}
