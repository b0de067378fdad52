package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Time-windowed semantics over the event stream, batch-first
  * (SURVEY.md §2.2.9 note: batch window()/session_window() are the
  * oracle-checkable equivalents of the streaming operators; the streaming
  * runs of the same programs are covered by StreamingSpec).
  *
  * Scale notes:
  *   - window()/session_window() are plain groupBy aggregations — partial
  *     agg + one shuffle on (window, key). Sliding windows multiply input
  *     by duration/slide (2× here); keep that factor small at scale.
  *   - Session windows shuffle on user_id then merge sorted sessions per
  *     key — the same single-shuffle shape Structured Streaming uses.
  *   - Dedup-keep-first is a window row_number, not dropDuplicates, so the
  *     kept row is deterministic (dropDuplicates keeps an arbitrary row).
  */
object Sessions extends QueryPack {

  /** Tumbling 1-day windows per event type. */
  def tumblingDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_micros(col("w.start")).as("day_start_us"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("day_start_us", "event_type")

  private val tumblingDailySql =
    """SELECT epoch_us(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS day_start_us, event_type,
      |  count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day_start_us, event_type""".stripMargin

  /** Sliding windows: 1-day duration, 12-hour slide (each event lands in
    * exactly two windows).
    */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("n_events"), col("sum_value"))
      .orderBy("w_start_us")

  private val slidingWindowsSql =
    """SELECT epoch_us(w_start) AS w_start_us, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM (
      |  SELECT unnest([b, b - INTERVAL '12 hours']) AS w_start, value
      |  FROM (SELECT time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)) AS b, value
      |        FROM events))
      |GROUP BY w_start
      |ORDER BY w_start_us""".stripMargin

  /** Gap-based session windows (4-hour gap) per user. Spark sessions are
    * half-open: an event exactly gap after the previous one starts a NEW
    * session — the oracle's lag-diff test uses >= to match.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "4 hours").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("s.start")).as("s_start_us"),
        unix_micros(col("s.end")).as("s_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "s_start_us")

  private val sessionWindowsSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
      |flagged AS (
      |  SELECT user_id, t, value,
      |    CASE WHEN lag(t) OVER w IS NULL
      |           OR t - lag(t) OVER w >= INTERVAL '4 hours' THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t)),
      |sess AS (
      |  SELECT user_id, t, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |  epoch_us(min(t)) AS s_start_us,
      |  epoch_us(max(t) + INTERVAL '4 hours') AS s_end_us,
      |  count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, s_start_us""".stripMargin

  /** Deterministic dedup-keep-first per (user, event_type) — the batch
    * analogue of streaming dropDuplicates.
    */
  def dedupKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id", "event_type")
  }

  private val dedupKeepFirstSql =
    """SELECT user_id, event_type, event_id, ts_us
      |FROM (
      |  SELECT user_id, event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Batch equivalent of the streaming watermark-dedup: dropDuplicates on
    * the dedup key. (dropDuplicatesWithinWatermark itself is
    * streaming-only in Spark 4.1 — StreamingSpec runs it over the same
    * duplicate structure and asserts the identical retained key set, so
    * this row is the hard cross-engine signal for the streaming-dedup
    * family that previously had `no_oracle`.) Which duplicate survives is
    * engine-arbitrary, so the query aggregates over the retained KEY SET
    * only. event_id is unique in the fixture, so byte-identical
    * duplicates are injected first (10% re-union) — the operator must
    * actually drop them.
    */
  def dedupWatermarkBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val withDups = ev.unionAll(ev.filter(pmod(col("event_id"), lit(10)) === 0))
    withDups.dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("event_type")
  }

  private val dedupWatermarkBatchSql =
    """SELECT event_type, count(*) AS n_kept
      |FROM (SELECT DISTINCT event_id, event_type FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Ordered funnel analysis: per user, first 'view', first 'click' at
    * or after that view, first 'purchase' at or after that click —
    * the staged-behavior query every event-analytics user of a SQL
    * engine runs. Timestamps emitted as epoch-µs (nullable), stage =
    * how deep the user got (1–3).
    *
    * Scale notes: three filtered partial aggregations and two joins,
    * all keyed on user_id (high-cardinality) — co-partitioned shuffles,
    * no windows over the full stream, no skew (per-user event counts
    * are bounded).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        unix_micros(col("t_view")).as("t_view_us"),
        unix_micros(col("t_click")).as("t_click_us"),
        unix_micros(col("t_purchase")).as("t_purchase_us"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
      .orderBy("user_id")
  }

  private val funnelSql =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
      |v AS (SELECT user_id, min(t) AS t_view FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(t) AS t_click FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND t >= t_view GROUP BY 1),
      |p AS (SELECT e.user_id, min(t) AS t_purchase FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND t >= t_click GROUP BY 1)
      |SELECT v.user_id,
      |  epoch_us(t_view) AS t_view_us,
      |  epoch_us(t_click) AS t_click_us,
      |  epoch_us(t_purchase) AS t_purchase_us,
      |  CAST(1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
      |         + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS INTEGER) AS stage
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Per-user event-type transition matrix (q139): Markov transition
    * counts over each user's time-ordered event stream — the
    * sequence-analytics statistic behind next-action prediction,
    * anomaly scoring, and funnel design (q94's staged funnel is one
    * path through this matrix). One window (lag over the user
    * partition, the q114/q115 shared-partitioning discipline) and one
    * tiny |types|² aggregate; ties broken by event_id so both engines
    * see the same sequence.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  private val transitionMatrixSql =
    """SELECT prev_type, next_type, count(*) AS n
      |FROM (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |    event_type AS next_type
      |  FROM events)
      |WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type
      |ORDER BY prev_type, next_type""".stripMargin

  /** Event-sequence pattern matching (q166) — the MATCH_RECOGNIZE
    * capability class: collapse each user's time-ordered event stream to
    * a symbol string (view→v, click→c, purchase→p, signup→s, error→e)
    * and count motif occurrences in it. Two motif forms:
    *
    *   - `n_vcp`: the literal view→click→purchase motif, counted via the
    *     replace-length identity `(len(s) - len(replace(s, m, ''))) / 3`
    *     — pure string arithmetic, so the count is engine-exact (no
    *     regex-dialect semantics in the hash-gated columns),
    *   - `n_pattern`: the variable-length `vc+p` motif (one view, one or
    *     more clicks, then a purchase) via regexp_count — leftmost
    *     non-overlapping matching, which Java's find() loop and DuckDB's
    *     RE2 agree on for this alternation-free pattern.
    *
    * The sequence is built by ONE aggregation per user: collect_list of
    * (ts_us, event_id, sym) structs, array_sort (lexicographic on the
    * struct = time order with event_id tie-break — the q139 sequence
    * discipline), then transform+array_join. No window over the full
    * stream, one shuffle on user_id.
    *
    * Scale notes: per-user state is the user's event count — the same
    * bound every session/funnel operator here already carries; a 100-TB
    * deployment bounds it by sessionizing first (q62) and matching within
    * sessions, which this operator composes with unchanged. The
    * alternative — a lag-window chain — cannot express variable-length
    * motifs (`c+`) without one window pass per repetition bound.
    */
  def sequenceMotifs(spark: SparkSession, dir: String): DataFrame = {
    val sym = when(col("event_type") === "view", "v")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "purchase", "p")
      .when(col("event_type") === "signup", "s")
      .otherwise("e")
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), sym.as("sym"))
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts_us"), col("event_id"), col("sym"))).as("evs"))
      .withColumn("seq", expr("array_join(transform(array_sort(evs), x -> x.sym), '')"))
      .select(col("user_id"),
        length(col("seq")).as("seq_len"),
        ((length(col("seq")) - length(regexp_replace(col("seq"), "vcp", ""))) / 3)
          .cast("int").as("n_vcp"),
        regexp_count(col("seq"), lit("vc+p")).cast("int").as("n_pattern"))
      .orderBy("user_id")
  }

  private val sequenceMotifsSql =
    """WITH seqs AS (
      |  SELECT user_id,
      |    string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |               WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
      |               ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(length(seq) AS INTEGER) AS seq_len,
      |  CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3 AS INTEGER) AS n_vcp,
      |  CAST(len(regexp_extract_all(seq, 'vc+p')) AS INTEGER) AS n_pattern
      |FROM seqs
      |ORDER BY user_id""".stripMargin

  /** Sessionized motif matching (q167): q166's pattern matcher composed
    * with q62's sessionization — motifs counted WITHIN 4-hour activity
    * sessions, so a view→click→purchase that straddles a session gap is
    * (correctly) not a conversion. This is exactly the composition
    * q166's scale note prescribes for 100 TB: per-group state drops
    * from a user's whole history to one session, and splitting can only
    * remove motifs (greedy non-overlapping counting is maximal for a
    * single pattern, so segment counts never exceed the unsplit count —
    * TemporalSpec asserts the per-user inequality against q166).
    *
    * Session ids come from the lag-gap + running-sum idiom (the same
    * derivation q62's oracle uses, here on both engines): one shuffle
    * on user_id, two window passes over the same sort, then the motif
    * aggregation per (user, session).
    */
  /** Shared derivation for q167/q173: per-(user, 4-hour session) symbol
    * sequences — the lag-gap + running-sum session ids (the q62-oracle
    * idiom, on both engines) followed by one collect_list aggregation
    * per (user, session). Columns: user_id, sid, s_start_us, seq.
    */
  private def sessionSeqs(spark: SparkSession, dir: String): DataFrame =
    sessionSeqsWith(spark, dir,
      when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "signup", "s")
        .otherwise("e"))

  /** [[sessionSeqs]] over an arbitrary symbol DEFINITION — the
    * MATCH_RECOGNIZE DEFINE clause's alphabet hook (q175's predicate
    * symbols; q167/q173 use the plain event-type map).
    */
  private def sessionSeqsWith(
      spark: SparkSession, dir: String,
      sym: org.apache.spark.sql.Column): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = 4L * 3600L * 1000000L
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), sym.as("sym"))
    e.withColumn("new_s",
        when(lag(col("ts_us"), 1).over(wOrd).isNull
          .or(col("ts_us") - lag(col("ts_us"), 1).over(wOrd) >= gapUs), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts_us")).as("s_start_us"),
        collect_list(struct(col("ts_us"), col("event_id"), col("sym"))).as("evs"))
      .withColumn("seq", expr("array_join(transform(array_sort(evs), x -> x.sym), '')"))
  }

  def sessionMotifs(spark: SparkSession, dir: String): DataFrame =
    sessionSeqs(spark, dir)
      .select(col("user_id"), col("sid").cast("long").as("sid"), col("s_start_us"),
        length(col("seq")).as("seq_len"),
        ((length(col("seq")) - length(regexp_replace(col("seq"), "vcp", ""))) / 3)
          .cast("int").as("n_vcp"),
        regexp_count(col("seq"), lit("vc+p")).cast("int").as("n_pattern"))
      .orderBy("user_id", "sid")

  private val sessionMotifsSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
      |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |         WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
      |         ELSE 'e' END AS sym
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |         OR ts_us - lag(ts_us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |seqs AS (
      |  SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts_us) AS s_start_us,
      |    string_agg(sym, '' ORDER BY ts_us, event_id) AS seq
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, sid, s_start_us,
      |  CAST(length(seq) AS INTEGER) AS seq_len,
      |  CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3 AS INTEGER) AS n_vcp,
      |  CAST(len(regexp_extract_all(seq, 'vc+p')) AS INTEGER) AS n_pattern
      |FROM seqs
      |ORDER BY user_id, sid""".stripMargin

  /** Sessionized funnel classes (q173 — VERDICT r10 item 4): extends
    * the q166/q167 motif surface from literal + `c+` repetition to the
    * two remaining MATCH_RECOGNIZE-class pattern forms, composed with
    * q167's sessionization (per-group state = one session):
    *
    *   - EXCLUSION — `v[^p]*p` (`n_conv`): a view converting to a
    *     purchase with NO intervening purchase; the span-with-excluded-
    *     symbol form (MATCH_RECOGNIZE's `A {- B -}* C`). The negated
    *     class cannot cross a `p`, so greedy matching gives both
    *     engines the identical extent (v … first subsequent p), and
    *     leftmost non-overlapping counting is unambiguous.
    *   - ALTERNATION — `v(c|s)+p` (`n_assist`): assisted conversions
    *     (≥ 1 engagement event, click OR signup, between view and
    *     purchase). The q166 RE2∩Java discipline extends to this
    *     alternation because the branches are DISJOINT single symbols
    *     (`(c|s)` ≡ `[cs]`): no input has two parses, so Perl-style
    *     (Java) and RE2 matching cannot diverge.
    *   - EXCLUSION + ANCHOR — `v[^p]*$` (`n_abandoned`, 0/1 per
    *     session): the abandoned-funnel motif — a view after the
    *     session's last purchase that never converts. `$` is the
    *     end-of-input anchor in both engines (sequences contain no
    *     newlines), and the anchor makes the count a boolean.
    *
    * Lookarounds — the one MATCH_RECOGNIZE-adjacent feature RE2 lacks —
    * stay out of the surface by design; anchors + negated classes
    * express the abandoned-funnel semantics without them.
    * TemporalSpec rebuilds every session's three counts with Java
    * regex over pure-Scala-built sequences (full parity) and pins
    * fixture non-degeneracy (every class fires somewhere).
    */
  def sessionFunnelClasses(spark: SparkSession, dir: String): DataFrame =
    sessionSeqs(spark, dir)
      .select(col("user_id"), col("sid").cast("long").as("sid"), col("s_start_us"),
        length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit("v[^p]*p")).cast("int").as("n_conv"),
        regexp_count(col("seq"), lit("v(c|s)+p")).cast("int").as("n_assist"),
        regexp_count(col("seq"), lit("v[^p]*$")).cast("int").as("n_abandoned"))
      .orderBy("user_id", "sid")

  private val sessionFunnelClassesSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
      |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |         WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
      |         ELSE 'e' END AS sym
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |         OR ts_us - lag(ts_us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |seqs AS (
      |  SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts_us) AS s_start_us,
      |    string_agg(sym, '' ORDER BY ts_us, event_id) AS seq
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, sid, s_start_us,
      |  CAST(length(seq) AS INTEGER) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INTEGER) AS n_conv,
      |  CAST(len(regexp_extract_all(seq, 'v(c|s)+p')) AS INTEGER) AS n_assist,
      |  CAST(len(regexp_extract_all(seq, 'v[^p]*$')) AS INTEGER) AS n_abandoned
      |FROM seqs
      |ORDER BY user_id, sid""".stripMargin

  /** DEFINE-predicate motifs (q175): completes the MATCH_RECOGNIZE
    * capability class — the pattern ALPHABET is no longer the raw event
    * type but a DEFINE clause over the full row, exactly
    * MATCH_RECOGNIZE's `DEFINE P AS event_type = 'purchase' AND
    * value >= 50`. Symbols here: `P` = premium purchase (value ≥ 50),
    * `p` = other purchase, `v`/`c` as before, `o` = everything else.
    * Per 4-hour session (the q167/q173 composition):
    *
    *   - `n_premium_conv` — `v[^Pp]*P`: a view converting to a PREMIUM
    *     purchase with no intervening purchase of either kind (the
    *     exclusion class now spans a two-symbol DEFINE partition),
    *   - `n_any_conv` — `v[^Pp]*[Pp]`: any conversion. Because
    *     {P, p} partitions exactly q173's `p` and the other symbols
    *     coarsen without crossing the purchase boundary, this count
    *     EQUALS q173's `n_conv` per session — a cross-query refinement
    *     law TemporalSpec asserts (the DEFINE split must refine, never
    *     perturb, the coarser alphabet's matches),
    *   - `n_upsell` — `p[^Pp]*P`: a plain purchase followed next by a
    *     premium one (the upgrade motif — anchors on BOTH ends are
    *     DEFINE symbols).
    *
    * The value predicate is a bare comparison (no arithmetic), so both
    * engines derive the identical alphabet; patterns stay in the
    * RE2∩Java common subset (negated classes + literals).
    */
  def sessionDefineMotifs(spark: SparkSession, dir: String): DataFrame =
    sessionSeqsWith(spark, dir,
      when(col("event_type") === "purchase" && col("value") >= 50, "P")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .otherwise("o"))
      .select(col("user_id"), col("sid").cast("long").as("sid"), col("s_start_us"),
        length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit("v[^Pp]*P")).cast("int").as("n_premium_conv"),
        regexp_count(col("seq"), lit("v[^Pp]*[Pp]")).cast("int").as("n_any_conv"),
        regexp_count(col("seq"), lit("p[^Pp]*P")).cast("int").as("n_upsell"))
      .orderBy("user_id", "sid")

  private val sessionDefineMotifsSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
      |    CASE WHEN event_type = 'purchase' AND value >= 50 THEN 'P'
      |         WHEN event_type = 'purchase' THEN 'p'
      |         WHEN event_type = 'view' THEN 'v'
      |         WHEN event_type = 'click' THEN 'c'
      |         ELSE 'o' END AS sym
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |         OR ts_us - lag(ts_us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |seqs AS (
      |  SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts_us) AS s_start_us,
      |    string_agg(sym, '' ORDER BY ts_us, event_id) AS seq
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, sid, s_start_us,
      |  CAST(length(seq) AS INTEGER) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'v[^Pp]*P')) AS INTEGER) AS n_premium_conv,
      |  CAST(len(regexp_extract_all(seq, 'v[^Pp]*[Pp]')) AS INTEGER) AS n_any_conv,
      |  CAST(len(regexp_extract_all(seq, 'p[^Pp]*P')) AS INTEGER) AS n_upsell
      |FROM seqs
      |ORDER BY user_id, sid""".stripMargin

  /** Bounded-quantifier + skip-mode motifs (q180): the residual
    * MATCH_RECOGNIZE forms after q166/q167/q173/q175 — quantifier
    * BOUNDS (`{m,n}`), AFTER MATCH SKIP TO NEXT ROW, and reluctant
    * quantifiers — per 4-hour session on the q173 alphabet:
    *
    *   - `n_burst_conv` — `v[^p]{2,6}p`: a conversion whose path length
    *     is BOUNDED — a view reaching a purchase through two to six
    *     intervening non-purchase events (the `{m,n}` quantifier-bound
    *     form; direct and one-step conversions excluded by the lower
    *     bound, meandering ones by the upper). Greedy counted
    *     repetition follows the same leftmost-first priority order in
    *     Java and RE2, and the excluded class still cannot cross `p`,
    *     so extents agree; counting stays leftmost non-overlapping =
    *     SKIP PAST LAST ROW. Both bounds BIND on the fixture
    *     (TemporalSpec: sessions exist where `v[^p]*p` counts more).
    *   - `n_skip_conv` — `v[^p]*p` counted under AFTER MATCH SKIP TO
    *     NEXT ROW: overlapping matches, one per STARTING row. A match
    *     starts at every `v` that still has a purchase ahead of it, so
    *     the count is #v(seq) − #v(tail after the last p) — anchored
    *     `[^p]*$` extracts that tail in both engines without the
    *     lookahead RE2 lacks. Per-session law: ≥ q173's `n_conv`
    *     (every non-overlapping match contains ≥ 1 starting row).
    *   - `n_conv_reluctant` — `v[^p]*?p`: the reluctant form. Because
    *     the excluded class cannot cross `p`, the reluctant and greedy
    *     extents are the SAME span (first p after the v) — so this
    *     EQUALS q173's `n_conv` on every session, and the equality is
    *     hash-pinned by the oracle computing the reluctant form
    *     independently (TemporalSpec asserts the cross-query law).
    */
  def sessionSkipMotifs(spark: SparkSession, dir: String): DataFrame = {
    val tail = regexp_extract(col("seq"), "[^p]*$", 0)
    def vCount(c: org.apache.spark.sql.Column) =
      length(c) - length(regexp_replace(c, "v", ""))
    sessionSeqs(spark, dir)
      .select(col("user_id"), col("sid").cast("long").as("sid"), col("s_start_us"),
        length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit("v[^p]{2,6}p")).cast("int").as("n_burst_conv"),
        (vCount(col("seq")) - vCount(tail)).cast("int").as("n_skip_conv"),
        regexp_count(col("seq"), lit("v[^p]*?p")).cast("int").as("n_conv_reluctant"))
      .orderBy("user_id", "sid")
  }

  private val sessionSkipMotifsSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
      |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |         WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
      |         ELSE 'e' END AS sym
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |         OR ts_us - lag(ts_us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |seqs AS (
      |  SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts_us) AS s_start_us,
      |    string_agg(sym, '' ORDER BY ts_us, event_id) AS seq,
      |    regexp_extract(string_agg(sym, '' ORDER BY ts_us, event_id), '[^p]*$') AS tl
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, sid, s_start_us,
      |  CAST(length(seq) AS INTEGER) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'v[^p]{2,6}p')) AS INTEGER) AS n_burst_conv,
      |  CAST((length(seq) - length(replace(seq, 'v', '')))
      |     - (length(tl) - length(replace(tl, 'v', ''))) AS INTEGER) AS n_skip_conv,
      |  CAST(len(regexp_extract_all(seq, 'v[^p]*?p')) AS INTEGER) AS n_conv_reluctant
      |FROM seqs
      |ORDER BY user_id, sid""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q60_tumbling_daily", tumblingDaily, Some(tumblingDailySql)),
    QueryDef("q61_sliding_windows", slidingWindows, Some(slidingWindowsSql)),
    QueryDef("q62_session_windows", sessionWindows, Some(sessionWindowsSql), headline = true),
    QueryDef("q63_dedup_keep_first", dedupKeepFirst, Some(dedupKeepFirstSql)),
    QueryDef("q64_dedup_watermark_batch", dedupWatermarkBatch, Some(dedupWatermarkBatchSql)),
    QueryDef("q94_funnel", funnel, Some(funnelSql)),
    QueryDef("q139_transition_matrix", transitionMatrix, Some(transitionMatrixSql)),
    QueryDef("q166_sequence_motifs", sequenceMotifs, Some(sequenceMotifsSql)),
    QueryDef("q167_session_motifs", sessionMotifs, Some(sessionMotifsSql)),
    QueryDef("q173_session_funnel_classes", sessionFunnelClasses,
      Some(sessionFunnelClassesSql)),
    QueryDef("q175_session_define_motifs", sessionDefineMotifs,
      Some(sessionDefineMotifsSql)),
    QueryDef("q180_session_skip_motifs", sessionSkipMotifs,
      Some(sessionSkipMotifsSql)))
}
