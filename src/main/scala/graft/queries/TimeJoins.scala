package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Time-series joins (SURVEY.md §2.2.3): as-of join and interval/overlap
  * join — the two composite patterns Spark has no native operator for.
  *
  * Scale notes:
  *   - The as-of join is the union+window composite (SURVEY.md §7.5): tag
  *     quotes and probes, union, ONE shuffle on user_id, local sort, carry
  *     the latest quote forward with last(ignoreNulls). Linear in
  *     |quotes|+|probes| — the naive inequality join is quadratic per key
  *     and unusable at 100 TB.
  *   - The interval join keeps a high-cardinality equi key (user_id) so the
  *     range predicate only nested-loops within a user's events. For
  *     unbounded interval lengths at scale, bucketize time and join on
  *     (user, bucket) to bound the per-task work.
  */
object TimeJoins extends QueryPack {

  /** As-of join: for each purchase, the latest signup at-or-before it for
    * the same user (null if none). Quotes are deduped per (user, µs) first
    * — an as-of join against duplicate timestamps is nondeterministic in
    * any engine.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // Dedup quotes per (user, µs) keeping max event_id — expressed as a
    // window over user_id ONLY (ordered ts, event_id desc; the keeper is
    // the first row of its ts-run), so it shares the main as-of window's
    // hash partitioning: one user_id exchange serves both windows.
    val wq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id").desc)
    val quotes = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wq))
      .filter(col("prev_ts").isNull || col("prev_ts") =!= col("ts"))
      .select(col("user_id"), col("ts"), lit(0).as("is_probe"), col("event_id"),
        struct(col("ts").as("q_ts"), col("value").as("q_value")).as("q"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("is_probe"), col("event_id"),
        expr("cast(null as struct<q_ts:timestamp,q_value:double>)").as("q"))
    // Quotes sort before probes at equal ts (is_probe asc) so an exactly
    // simultaneous quote is visible to the probe — ASOF `>=` semantics.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    quotes.unionByName(probes)
      .withColumn("qq", last(col("q"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("qq.q_ts")).as("quote_ts_us"),
        round(col("qq.q_value"), 4).as("quote_value"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  private val asofJoinSql =
    """WITH q0 AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value, event_id
      |  FROM events WHERE event_type = 'signup'),
      |q AS (
      |  SELECT user_id, t, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, t
      |                                 ORDER BY event_id DESC) AS r
      |    FROM q0) WHERE r = 1),
      |p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, epoch_us(p.t) AS ts_us,
      |  epoch_us(q.t) AS quote_ts_us,
      |  round(q.value, 4) AS quote_value
      |FROM p ASOF LEFT JOIN q ON p.user_id = q.user_id AND p.t >= q.t
      |ORDER BY p.user_id, p.t, p.event_id""".stripMargin

  /** Interval/overlap join: purchases falling inside any [error, error+1h)
    * window of the same user, aggregated per user.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
    purchases.join(errors,
        col("user_id") === col("e_user") &&
        col("p_ts") >= col("e_ts") &&
        col("p_ts") < col("e_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_hits"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy("user_id")
  }

  private val intervalJoinSql =
    """SELECT p.user_id, count(*) AS n_hits, round(sum(p.value), 4) AS sum_value
      |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value
      |      FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS t
      |      FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.t >= e.t AND p.t < e.t + INTERVAL 1 HOUR
      |GROUP BY p.user_id
      |ORDER BY p.user_id""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q65_asof_join", asofJoin, Some(asofJoinSql), headline = true),
    QueryDef("q66_interval_join", intervalJoin, Some(intervalJoinSql)))
}
