package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.streaming.{ChangeOp, CompactionProcessor}

/** q114 CDC compaction, streaming parity: the transformWithState
  * materializer over the REAL events fixture must reproduce the batch
  * q114 answer exactly — and, because last-writer-wins is a
  * commutative/idempotent fold, it must do so under OUT-OF-ORDER
  * delivery, the property that makes it deployable against a change
  * stream whose cross-partition arrival order is unguaranteed.
  */
class StreamingCompactionSpec extends SparkSpec {

  test("transformWithState compaction over out-of-order fixture log equals batch q114") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // Deliberately scramble event-time order (deterministically): chunk
    // membership and order follow (event_id % 7, event_id) — every
    // micro-batch mixes early and late ops.
    val feed = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .as[ChangeOp].collect()
      .sortBy(op => (op.event_id % 7, op.event_id))
    val chunks = feed.grouped(math.max(feed.length / 4, 1)).toSeq

    val input = MemoryStream[ChangeOp]
    val out = input.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new CompactionProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "last_event_id", "last_ts_us", "last_type", "last_value", "n_ops")
    val q = out.writeStream.format("memory").queryName("compact_out")
      .outputMode("update").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // Final state per user = the highest-n_ops emission (n_ops is
      // strictly increasing across a user's emissions).
      val streamed = spark.table("compact_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_ops"), col("last_ts_us"), col("last_event_id"),
          col("last_type"), col("last_value"))).as("m"))
        .select(col("user_id"), col("m.last_event_id"), col("m.last_ts_us"),
          col("m.last_type"), round(col("m.last_value"), 4).as("last_value"),
          col("m.n_ops"))
        .filter(col("last_type") =!= "error")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.queries.Changelog.logCompaction(spark, sfDir)
        .select("user_id", "last_event_id", "last_ts_us", "last_type", "last_value", "n_ops")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        s"streaming compaction diverged from batch q114: " +
          s"stream=${streamed.take(3)}… batch=${batch.take(3)}…")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
