package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Window functions (SURVEY.md §2.2.5): analytic lag/lead, running
  * aggregates with ROWS frames, time-RANGE frames, the full ranking family,
  * and first/last/nth_value frame specs. q40-q42 read `events` — the
  * nanosecond-timestamp shim (Tables.events) is correctness-guarded here.
  *
  * Scale notes:
  *   - Every window partitions by a high-cardinality key (user_id /
  *     l_orderkey): one hash shuffle + per-partition local sort, no global
  *     sort. Never define a window without partitionBy at scale — a single
  *     unpartitioned window is a 1-task global sort.
  *   - RANGE frames over unix_micros are O(n) per partition via sliding
  *     frame advance, not O(n²).
  *   - Window order keys include a unique tiebreaker (event_id) wherever
  *     row identity affects the result (lag/lead/ntile), so results are
  *     deterministic and engine-independent.
  */
object Windows extends QueryPack {

  private def eventsOrdered = Window.partitionBy("user_id")
    .orderBy(col("ts"), col("event_id"))

  /** lag/lead per user over the event stream. Timestamps are emitted as
    * epoch microseconds: engine-neutral (Spark parquet timestamps read
    * back tz-aware, DuckDB's are naive — longs compare exactly).
    */
  def lagLead(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"),
        round(lag(col("value"), 1).over(eventsOrdered), 4).as("prev_value"),
        round(lead(col("value"), 1).over(eventsOrdered), 4).as("next_value"),
        unix_micros(lag(col("ts"), 1).over(eventsOrdered)).as("prev_ts_us"))
      .orderBy("user_id", "ts_us", "event_id")

  private val lagLeadSql =
    """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
      |  round(lag(value, 1) OVER w, 4) AS prev_value,
      |  round(lead(value, 1) OVER w, 4) AS next_value,
      |  lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS prev_ts_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** Running sum / running count per user: ROWS UNBOUNDED PRECEDING. */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val cum = eventsOrdered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        row_number().over(eventsOrdered).as("rn"),
        round(sum(col("value")).over(cum), 4).as("run_sum"),
        count(lit(1)).over(cum).as("run_n"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  private val runningSumSql =
    """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  row_number() OVER w AS rn,
      |  round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum,
      |  count(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** 7-day trailing window per user: RANGE frame over microsecond epoch.
    * Peers (equal order key) share a frame in both engines, so no unique
    * tiebreaker is needed for frame aggregates.
    */
  def trailing7d(spark: SparkSession, dir: String): DataFrame = {
    val sevenDaysUs = 7L * 24 * 3600 * 1000000
    val w = Window.partitionBy("user_id").orderBy(col("tus"))
      .rangeBetween(-sevenDaysUs, 0)
    Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .select(
        col("user_id"), col("event_id"), col("tus").as("ts_us"),
        count(lit(1)).over(w).as("n_7d"),
        round(sum(col("value")).over(w), 4).as("sum_7d"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  private val trailing7dSql =
    """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  count(*) OVER w AS n_7d,
      |  round(sum(value) OVER w, 4) AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** Ranking family per nation over customer balances. rank/dense_rank/
    * percent_rank/cume_dist rank by value (ties collapse identically in
    * both engines); ntile and row_number need a total order, so their
    * window adds the unique custkey tiebreaker.
    */
  def rankingFamily(spark: SparkSession, dir: String): DataFrame = {
    val byBal = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
    val total = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(
        col("c_nationkey"), col("c_custkey"),
        round(col("c_acctbal"), 4).as("acctbal"),
        rank().over(byBal).as("rnk"),
        dense_rank().over(byBal).as("drnk"),
        round(percent_rank().over(byBal), 4).as("prnk"),
        round(cume_dist().over(byBal), 4).as("cdist"),
        ntile(4).over(total).as("quartile"),
        row_number().over(total).as("rn"))
      .orderBy("c_nationkey", "rn")
  }

  private val rankingFamilySql =
    """SELECT c_nationkey, c_custkey,
      |  round(c_acctbal, 4) AS acctbal,
      |  rank() OVER wb AS rnk,
      |  dense_rank() OVER wb AS drnk,
      |  round(percent_rank() OVER wb, 4) AS prnk,
      |  round(cume_dist() OVER wb, 4) AS cdist,
      |  ntile(4) OVER wt AS quartile,
      |  row_number() OVER wt AS rn
      |FROM customer
      |WINDOW wb AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC),
      |       wt AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
      |ORDER BY c_nationkey, rn""".stripMargin

  /** Frame specs: first/last/nth_value and a centered moving average over
    * lineitem lines within each order. (l_orderkey, l_linenumber) is NOT
    * unique in the fixtures — the window order adds partkey/suppkey
    * tiebreakers to be total, or first/nth/mavg would be nondeterministic.
    */
  def frameSpecs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val centered = w.rowsBetween(-1, 1)
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity"), 4).as("qty"),
        round(first(col("l_quantity")).over(full), 4).as("first_qty"),
        round(last(col("l_quantity")).over(full), 4).as("last_qty"),
        round(nth_value(col("l_quantity"), 2).over(full), 4).as("second_qty"),
        round(avg(col("l_quantity")).over(centered), 4).as("mavg_qty"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  }

  private val frameSpecsSql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  round(l_quantity, 4) AS qty,
      |  round(first_value(l_quantity) OVER wf, 4) AS first_qty,
      |  round(last_value(l_quantity) OVER wf, 4) AS last_qty,
      |  round(nth_value(l_quantity, 2) OVER wf, 4) AS second_qty,
      |  round(avg(l_quantity) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS mavg_qty
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey),
      |       wf AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q40_lag_lead", lagLead, Some(lagLeadSql)),
    QueryDef("q41_running_sum", runningSum, Some(runningSumSql), headline = true),
    QueryDef("q42_trailing_7d", trailing7d, Some(trailing7dSql)),
    QueryDef("q43_ranking_family", rankingFamily, Some(rankingFamilySql)),
    QueryDef("q44_frame_specs", frameSpecs, Some(frameSpecsSql)))
}
