package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Funnel input event: epoch-µs timestamp (the engine's cross-engine
  * timestamp currency) instead of a Timestamp object so streaming state
  * and the q94 batch output compare exactly.
  */
case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)

/** Per-user funnel progress; -1 = stage not reached (sentinel instead of
  * null so the state encoder and max-struct folding stay simple).
  */
case class FunnelState(t_view_us: Long, t_click_us: Long, t_purchase_us: Long) {
  def stage: Int =
    1 + (if (t_click_us >= 0) 1 else 0) + (if (t_purchase_us >= 0) 1 else 0)
}

/** Streaming form of the q94 ordered funnel (view → click-at-or-after →
  * purchase-at-or-after) as a Spark 4 `transformWithState`
  * StatefulProcessor — the incremental computation a 100-TB event
  * pipeline runs instead of re-scanning history per day.
  *
  * State is three epoch-µs marks per user (constant size — no event
  * buffering, so per-key state does not grow with stream length).
  * Events must be delivered in event-time order across batches for
  * exact batch parity (the spec feeds watermark-ordered chunks; within
  * a batch rows are sorted here). Out-of-order delivery degrades to the
  * usual streaming approximation: an earlier-timestamped view arriving
  * late cannot retroactively re-open a funnel stage.
  *
  * Emits the full funnel tuple on every update; the final answer per
  * user is the max-stage row (stages only move forward and timestamps
  * are write-once).
  */
class FunnelProcessor
    extends StatefulProcessor[Long, FunnelEvent, (Long, Long, Long, Long, Int)] {
  @transient private var state: ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[FunnelState](
      "funnel", Encoders.product[FunnelState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Int)] = {
    var s = if (state.exists()) state.get() else FunnelState(-1L, -1L, -1L)
    // Per-key per-batch rows are bounded (a user's events in one
    // micro-batch); sort so the staged transitions see event-time order.
    // Timestamp TIES break by funnel-stage order (view < click <
    // purchase), matching the batch q94 semantics where a click with
    // ts == t_view qualifies (>= comparison): alphabetical order would
    // process 'click' before 'view' at an equal timestamp and silently
    // drop a qualifying click.
    rows.toSeq.sortBy(e => (e.ts_us, FunnelProcessor.stageRank(e.event_type))).foreach { e =>
      e.event_type match {
        case "view" if s.t_view_us < 0 =>
          s = s.copy(t_view_us = e.ts_us)
        case "click" if s.t_view_us >= 0 && s.t_click_us < 0 && e.ts_us >= s.t_view_us =>
          s = s.copy(t_click_us = e.ts_us)
        case "purchase" if s.t_click_us >= 0 && s.t_purchase_us < 0 && e.ts_us >= s.t_click_us =>
          s = s.copy(t_purchase_us = e.ts_us)
        case _ => ()
      }
    }
    state.update(s)
    if (s.t_view_us >= 0) {
      Iterator.single((key, s.t_view_us, s.t_click_us, s.t_purchase_us, s.stage))
    } else Iterator.empty
  }
}

object FunnelProcessor {
  /** Funnel-stage rank for event-time tie-breaks: a view, click, and
    * purchase sharing one timestamp legitimately advance all three
    * stages in batch q94, so equal-ts events must be processed in stage
    * order. Unknown event types sort last (they match no transition).
    */
  def stageRank(eventType: String): Int = eventType match {
    case "view" => 0
    case "click" => 1
    case "purchase" => 2
    case _ => 3
  }
}
