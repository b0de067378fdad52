package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One activity observation (the streaming form of q121's input): a user
  * seen on a calendar day, epoch-day encoded (`datediff(day, 1970-01-01)`
  * — integer-exact, tz-pinned by the session's UTC config upstream).
  */
case class DayActivity(user_id: Long, day: Int)

/** Per-user retention state: the distinct active-day set, kept sorted.
  * Bounded by the calendar span (≈3.7k entries for a decade of daily
  * activity — the same bound the batch q121 argues for its map-side
  * `collect_set`), NOT by stream length: duplicate observations of a
  * day are absorbed by the set.
  */
case class RetentionState(days: List[Int])

/** Streaming cohort retention (the incremental form of q121) as a Spark
  * 4 `transformWithState` StatefulProcessor — the third stateful
  * operator of the family (funnel q94 = event-time-ordered staged
  * transitions; compaction q114 = last-writer-wins fold; this =
  * grow-only set fold).
  *
  * Like compaction (and unlike the funnel), the fold is commutative,
  * associative, and idempotent — set union with the cohort day as
  * `min(days)` — so the materialized per-user state converges to the
  * batch answer under ANY delivery order. The spec feeds the fixture
  * events deliberately out of order to pin that property: a 100-TB
  * event stream guarantees no cross-partition arrival order, and a
  * retention operator that silently mis-cohorts late-arriving
  * first-days would corrupt every downstream cell. Here a late earlier
  * day simply lowers `min(days)` — the cohort re-anchors exactly as
  * the batch recompute would.
  *
  * Emits (user_id, cohort_day, n_days, days) on every update; `n_days`
  * is non-decreasing and the day set grow-only, so the final answer per
  * user is any emission with the maximal n_days. The retention GRID
  * (cohort × offset → distinct users) is a downstream result-sized
  * aggregation over these per-user sets — kept out of the processor so
  * the keyed state stays strictly per-user (no cross-key state, the
  * property that lets the state store shard by user at scale).
  */
class RetentionProcessor
    extends StatefulProcessor[Long, DayActivity, (Long, Int, Int, List[Int])] {
  @transient private var state: ValueState[RetentionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[RetentionState](
      "days", Encoders.product[RetentionState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[DayActivity],
      timerValues: TimerValues): Iterator[(Long, Int, Int, List[Int])] = {
    val prev = if (state.exists()) state.get().days.toSet else Set.empty[Int]
    val merged = (prev ++ rows.map(_.day)).toList.sorted
    state.update(RetentionState(merged))
    Iterator.single((key, merged.head, merged.size, merged))
  }
}
