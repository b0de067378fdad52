package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Transition-matrix input event (the streaming form of q139's input):
  * epoch-µs timestamp plus the event_id tie-break, so the streamed
  * sequence order is byte-identical to the batch window's
  * `ORDER BY ts_us, event_id`.
  */
case class TransEvent(user_id: Long, event_id: Long, ts_us: Long, event_type: String)

/** One buffered sequence entry; (ts_us, event_id) is the total order. */
case class SeqEvent(ts_us: Long, event_id: Long, event_type: String)

/** One finalized transition count (a List of these encodes the per-user
  * matrix — bounded by |event types|², not by stream length).
  */
case class TransCount(prev_type: String, next_type: String, n: Long)

/** Per-user transition state: counts already frozen below the lateness
  * horizon, the last frozen event (the boundary the next frozen
  * transition continues from), the still-mutable sequence tail, and the
  * grow-only absorbed-event count that versions emissions downstream.
  */
case class TransMatrixState(
    finalized: List[TransCount],
    boundary: Option[SeqEvent],
    buffer: List[SeqEvent],
    n_events: Long)

/** Streaming per-user event-type transition matrix (the incremental form
  * of q139) — the fourth StatefulProcessor class, and the one the first
  * three dodge: `lag` is NOT order-insensitive. The funnel's sort-within-
  * batch treatment is insufficient here because a late event landing
  * BETWEEN two already-processed events rewrites history — transition
  * A→C must become A→B plus B→C. No commutative fold can absorb that;
  * the only exact answer is to keep the still-mutable part of each
  * user's SEQUENCE in state and recompute its transitions on insert.
  *
  * State is therefore split at a lateness horizon `latenessUs` (the
  * watermark contract made explicit, since TimeMode.None has no engine
  * watermark): events older than `max seen ts − latenessUs` are frozen —
  * their pairwise transitions fold into a counts list bounded by
  * |event types|², the last frozen event is kept as the boundary the
  * next freeze continues from, and the events themselves are dropped.
  * Only the tail newer than the horizon stays buffered, so per-key
  * state is O(|types|² + events within the horizon) — the same bound a
  * watermarked window agg holds, NOT O(stream length). An event
  * arriving below the frozen boundary is dropped (the standard
  * watermark-lateness approximation, documented loudly); with
  * `latenessUs = Long.MaxValue` nothing ever freezes and the processor
  * is EXACT under arbitrary delivery order (what the out-of-order
  * parity spec pins against batch q139).
  *
  * Emits the user's full current matrix (finalized + tail) tagged with
  * the grow-only `n_events`, so the final answer per user is the
  * emission set with maximal n_events; the corpus matrix is the
  * result-sized sum over users, kept downstream so keyed state stays
  * strictly per-user (the property that lets the store shard by user).
  */
class TransitionProcessor(latenessUs: Long = Long.MaxValue)
    extends StatefulProcessor[Long, TransEvent, (Long, Long, String, String, Long)] {
  @transient private var state: ValueState[TransMatrixState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TransMatrixState](
      "transitions", Encoders.product[TransMatrixState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TransEvent],
      timerValues: TimerValues): Iterator[(Long, Long, String, String, Long)] = {
    val s = if (state.exists()) state.get()
      else TransMatrixState(Nil, None, Nil, 0L)

    val ord = Ordering.by[SeqEvent, (Long, Long)](e => (e.ts_us, e.event_id))
    val incoming = rows.map(e => SeqEvent(e.ts_us, e.event_id, e.event_type)).toList
    // Below-boundary arrivals violated the declared lateness contract:
    // their neighborhood is already frozen, so exact insertion is
    // impossible — drop them, the watermark approximation. Never fires
    // in exact mode (no boundary exists until something freezes).
    val admissible = s.boundary match {
      case Some(b) => incoming.filter(e => ord.gt(e, b))
      case None => incoming
    }
    val merged = (s.buffer ++ admissible).sorted(ord)
    val nEvents = s.n_events + admissible.length

    // Freeze the prefix older than the horizon. maxTs is monotone per
    // key (max over everything ever admitted), so the horizon never
    // moves backwards.
    val maxTs = (s.boundary.map(_.ts_us).toList ++ merged.map(_.ts_us))
      .foldLeft(Long.MinValue)(math.max)
    val threshold =
      if (latenessUs == Long.MaxValue) Long.MinValue else maxTs - latenessUs
    val (toFreeze, tail) = merged.span(_.ts_us < threshold)

    def chainCounts(from: Option[SeqEvent], evs: List[SeqEvent]): Map[(String, String), Long] =
      (from.toList ++ evs).sliding(2).collect {
        case a :: b :: Nil => (a.event_type, b.event_type)
      }.toList.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    val frozen = chainCounts(s.boundary, toFreeze)
    val finalized = (s.finalized.map(c => (c.prev_type, c.next_type) -> c.n).toMap |+| frozen)
    val boundary = toFreeze.lastOption.orElse(s.boundary)

    state.update(TransMatrixState(
      finalized.map { case ((p, n), c) => TransCount(p, n, c) }.toList.sortBy(c => (c.prev_type, c.next_type)),
      boundary, tail, nEvents))

    val full = finalized |+| chainCounts(boundary, tail)
    full.toList.sortBy(_._1).iterator.map { case ((p, n), c) => (key, nEvents, p, n, c) }
  }

  /** Count-map union (no Scalaz/Cats on the classpath — local |+|). */
  implicit private class MapPlus(m: Map[(String, String), Long]) {
    def |+|(o: Map[(String, String), Long]): Map[(String, String), Long] =
      (m.keySet ++ o.keySet).map(k => k -> (m.getOrElse(k, 0L) + o.getOrElse(k, 0L))).toMap
  }
}
