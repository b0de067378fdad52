package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One change-log operation (the streaming form of q114's input): the
  * per-user op stream with epoch-µs event time; `error` is the delete
  * tombstone, exactly as in `queries.Changelog.logCompaction`.
  */
case class ChangeOp(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String, value: Double)

/** Per-user compacted state: the winning (latest) op plus the op count.
  * Constant size — no op buffering, so state does not grow with stream
  * length.
  */
case class CompactState(ts_us: Long, event_id: Long, event_type: String,
    value: Double, n_ops: Long)

/** Streaming CDC log compaction (the incremental form of q114) as a
  * Spark 4 `transformWithState` StatefulProcessor: materialize
  * last-writer-wins state per key while the change log streams in.
  *
  * Unlike the funnel (whose staged transitions need event-time order),
  * last-writer-wins is a commutative, associative, idempotent fold —
  * max by (ts_us, event_id) — so the materialized state converges to
  * the batch answer under ANY delivery order. The spec feeds the
  * fixture log deliberately out of order to pin that property: this is
  * what makes the operator deployable against a 100-TB change stream,
  * where cross-partition arrival order is never guaranteed.
  *
  * Emits the full compacted tuple (tombstones included — the sink
  * view filters deletes, mirroring q114's final filter) on every
  * update; the final answer per user is the last emission.
  */
class CompactionProcessor
    extends StatefulProcessor[Long, ChangeOp, (Long, Long, Long, String, Double, Long)] {
  @transient private var state: ValueState[CompactState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CompactState](
      "compact", Encoders.product[CompactState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[ChangeOp],
      timerValues: TimerValues): Iterator[(Long, Long, Long, String, Double, Long)] = {
    var s = if (state.exists()) state.get() else null
    rows.foreach { op =>
      if (s == null) {
        s = CompactState(op.ts_us, op.event_id, op.event_type, op.value, 1L)
      } else {
        val wins = op.ts_us > s.ts_us || (op.ts_us == s.ts_us && op.event_id > s.event_id)
        s = if (wins) CompactState(op.ts_us, op.event_id, op.event_type, op.value, s.n_ops + 1)
            else s.copy(n_ops = s.n_ops + 1)
      }
    }
    state.update(s)
    Iterator.single((key, s.event_id, s.ts_us, s.event_type, s.value, s.n_ops))
  }
}
