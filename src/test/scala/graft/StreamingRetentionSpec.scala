package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.streaming.{DayActivity, RetentionProcessor}

/** q121 cohort retention, streaming parity: the transformWithState
  * day-set materializer over the REAL events fixture must reproduce the
  * batch q121 retention grid exactly — and, because set-union with
  * min-cohort is a commutative/idempotent fold, it must do so under
  * OUT-OF-ORDER delivery (late-arriving earlier days re-anchor the
  * cohort exactly as a batch recompute would).
  */
class StreamingRetentionSpec extends SparkSpec {

  test("transformWithState retention over out-of-order fixture events equals batch q121") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // Deliberately scramble event-time order (deterministically): chunk
    // membership and order follow (event_id % 7, event_id) — every
    // micro-batch mixes early and late activity days, so some users'
    // cohort day arrives AFTER later activity.
    val feed = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("day"),
        col("event_id"))
      .collect()
      .sortBy(r => (r.getLong(2) % 7, r.getLong(2)))
      .map(r => DayActivity(r.getLong(0), r.getInt(1)))
    val chunks = feed.grouped(math.max(feed.length / 4, 1)).toSeq

    val input = MemoryStream[DayActivity]
    val out = input.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new RetentionProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "cohort_day", "n_days", "days")
    val q = out.writeStream.format("memory").queryName("retention_out")
      .outputMode("update").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // Final state per user = the emission with maximal n_days (the
      // day set is grow-only; equal-n_days emissions carry identical
      // sets, so the max-struct tie-break is immaterial).
      val finalSets = spark.table("retention_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_days"), col("cohort_day"), col("days"))).as("m"))
        .select(col("user_id"), col("m.cohort_day").as("cohort_day"),
          explode(col("m.days")).as("day"))
      val streamedGrid = finalSets
        .groupBy(date_from_unix_date(col("cohort_day")).as("cohort_d"),
          (col("day") - col("cohort_day")).as("offset_d"))
        .agg(count(lit(1)).as("n_users"))
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.queries.Temporal.cohortRetention(spark, sfDir)
        .select(col("cohort_d"), col("offset_d").cast("int").as("offset_d"),
          col("n_users"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamedGrid == batch,
        s"streaming retention diverged from batch q121: " +
          s"stream=${streamedGrid.take(3)}… batch=${batch.take(3)}…")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
