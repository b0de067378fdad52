package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Running max per user as a StatefulProcessor. Top-level for
  * serializability.
  */
class RunningMaxProcessor extends StatefulProcessor[Long, Ev, (Long, Double)] {
  @transient private var state: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Double]("max", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[(Long, Double)] = {
    val prev = if (state.exists()) state.get() else Double.MinValue
    val mx = rows.foldLeft(prev)((m, e) => math.max(m, e.value))
    state.update(mx)
    Iterator.single((key, mx))
  }
}

/** Spark 4 transformWithState (the successor of flatMapGroupsWithState
  * for arbitrary streaming state, SURVEY.md §2.2.9): running max per
  * user over micro-batches must equal the batch max. Requires the
  * RocksDB state store provider.
  */
class TransformWithStateSpec extends SparkSpec {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("transformWithState running max equals batch max per user") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val out = input.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new RunningMaxProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "run_max")
    val q = out.writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    try {
      val batch1 = Seq(
        Ev(1, t("2024-01-01 00:10:00"), 1, "view", 5.0),
        Ev(2, t("2024-01-01 00:11:00"), 1, "view", 9.0),
        Ev(3, t("2024-01-01 00:12:00"), 2, "view", 3.0))
      val batch2 = Seq(
        Ev(4, t("2024-01-01 00:13:00"), 1, "view", 7.0),  // below running max
        Ev(5, t("2024-01-01 00:14:00"), 2, "view", 11.0)) // new max
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val finalMax = spark.table("tws_out")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("run_max").as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val batchMax = (batch1 ++ batch2).groupBy(_.user_id)
        .view.mapValues(_.map(_.value).max).toMap
      assert(finalMax == batchMax)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
