package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Time-series / product-analytics operators over the events stream:
  * cohort retention (q121) and calendar gap-fill with forward-fill
  * resampling (q122). Both are everyday warehouse workloads a user of
  * a distributed SQL engine expects to run at full event-log scale.
  *
  * Scale notes:
  *   - Cohort retention is two shuffles, both small: one by user_id
  *     carrying map-side-deduplicated day SETS (collect_set partials),
  *     one by the tiny (cohort_day, offset) grid. Never a driver
  *     loop; the output is O(span²) regardless of input rows.
  *   - Gap-fill generates each user's calendar grid with `sequence`
  *     (rows expand ~span/activity-ratio, bounded and data-local),
  *     left-joins the observed daily aggregates on (user, day), and
  *     forward-fills with `last(ignoreNulls)` over the user window —
  *     the standard resampling plan that scales as one shuffle by
  *     user plus a per-partition sort. Rounding happens BEFORE the
  *     fill so both engines propagate identical filled values.
  */
object Temporal extends QueryPack {

  /** Cohort retention (q121): users are cohorted by first-seen day;
    * for each (cohort day, day offset) cell, count the distinct users
    * active exactly `offset` days after their first appearance.
    *
    * TWO shuffles total, both tiny: `collect_set(day)` dedupes the
    * per-user activity days MAP-SIDE (each task ships at most one
    * calendar-span-bounded set per user), so one user_id exchange
    * replaces the naive three (distinct-on-(user,day) → window →
    * regroup); the cohort day is then `array_min` and the offsets an
    * explode, all partition-local, before the final grid-sized
    * aggregation. A per-user day set is bounded by the calendar span
    * (≈3.7k for a decade), safe at any row scale.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(collect_set(col("d")).as("days"))
      .withColumn("cohort_d", array_min(col("days")))
      .select(col("cohort_d"), explode(col("days")).as("d"))
      .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("offset_d"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_d", "offset_d")

  private val cohortRetentionSql =
    """WITH activity AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      |  FROM events),
      |cohorted AS (
      |  SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort_d
      |  FROM activity)
      |SELECT cohort_d, datediff('day', cohort_d, d) AS offset_d,
      |  count(*) AS n_users
      |FROM cohorted
      |GROUP BY cohort_d, offset_d
      |ORDER BY cohort_d, offset_d""".stripMargin

  /** Calendar gap-fill + forward-fill resampling (q122): per-user daily
    * value sums are re-sampled onto each user's complete [first, last]
    * calendar grid; days with no events carry the previous observed
    * value (is_gap = 1). Users are restricted by a deterministic key
    * predicate so the output stays result-sized at every sf — the
    * operator itself is unbounded.
    */
  def gapFillDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("user_id") % 5 === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(round(sum(col("value")), 4).as("v"))
    val grid = daily.groupBy("user_id")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        last(col("v"), ignoreNulls = true).over(w).as("v_fill"),
        col("v").isNull.cast("int").as("is_gap"))
      .orderBy("user_id", "d")
  }

  private val gapFillDailySql =
    """WITH daily AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    round(sum(value), 4) AS v
      |  FROM events WHERE user_id % 5 = 0
      |  GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)),
      |grid AS (
      |  SELECT user_id, CAST(gs AS DATE) AS d
      |  FROM (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY user_id),
      |    LATERAL unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |                                   CAST(d1 AS TIMESTAMP),
      |                                   INTERVAL 1 DAY)) AS t(gs))
      |SELECT g.user_id, g.d,
      |  last_value(daily.v IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
      |  CAST(daily.v IS NULL AS INT) AS is_gap
      |FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
      |ORDER BY g.user_id, g.d""".stripMargin

  /** Time-weighted average value per user (q141): each observation
    * holds until the next one (the q115 SCD2 interval view), so the
    * mean weighs values by how LONG they held, not how often they were
    * sampled — the correct average for balances, prices, and gauges
    * (TWAP). Intervals come from one lead() on the shared user window;
    * the open tail interval is clamped to the stream's global max
    * timestamp (a 1-row broadcast).
    *
    * Determinism: value·Δt products and their sums ride DECIMAL
    * (value at 4 decimals × integer µs — exact, associative); the
    * single final division to DOUBLE is one IEEE op. A double
    * accumulation would be order-dependent across partitions.
    */
  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val obs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value"), 4).cast("decimal(18,4)").as("v"))
    val horizon = obs.agg(max(col("ts_us")).as("t_end"))
    obs.crossJoin(broadcast(horizon))
      .withColumn("t_next", coalesce(lead(col("ts_us"), 1).over(w), col("t_end")))
      .withColumn("dt", col("t_next") - col("ts_us"))
      .filter(col("dt") > 0)
      .groupBy("user_id")
      .agg(
        sum(col("v") * col("dt")).as("weighted_sum"),
        sum(col("dt")).as("total_us"))
      .select(col("user_id"),
        (col("weighted_sum").cast("double") / col("total_us")).as("twap"),
        col("total_us"))
      .withColumn("twap", round(col("twap"), 4))
      .orderBy("user_id")
  }

  private val timeWeightedAvgSql =
    """WITH obs AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    CAST(round(value, 4) AS DECIMAL(18,4)) AS v
      |  FROM events),
      |horizon AS (SELECT max(ts_us) AS t_end FROM obs),
      |iv AS (
      |  SELECT user_id, v,
      |    coalesce(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id), t_end)
      |      - ts_us AS dt
      |  FROM obs, horizon)
      |SELECT user_id,
      |  round(CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS BIGINT), 4) AS twap,
      |  CAST(sum(dt) AS BIGINT) AS total_us
      |FROM iv WHERE dt > 0
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Month-over-month revenue report (q142): the BI staple — monthly
    * order revenue with absolute and percent deltas against the
    * previous month. Revenue sums as DECIMAL(18,2) (exact,
    * associative); the deltas are decimal subtraction and ONE double
    * division each, rounded once at output. One small shuffle to
    * months, one ordered window over the |months| series.
    */
  def momRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("month_start")
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
      .select(
        unix_micros(col("month_start")).as("month_us"),
        col("revenue").cast("double").as("revenue"),
        col("n_orders"),
        (col("revenue") - col("prev_rev")).cast("double").as("delta"),
        round((col("revenue") - col("prev_rev")).cast("double")
          / col("prev_rev").cast("double") * 100, 4).as("pct_change"))
      .orderBy("month_us")
  }

  private val momRevenueSql =
    """WITH monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS month_start,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY date_trunc('month', o_orderdate))
      |SELECT epoch_us(CAST(month_start AS TIMESTAMP)) AS month_us,
      |  CAST(revenue AS DOUBLE) AS revenue, n_orders,
      |  CAST(revenue - lag(revenue) OVER (ORDER BY month_start) AS DOUBLE) AS delta,
      |  round(CAST(revenue - lag(revenue) OVER (ORDER BY month_start) AS DOUBLE)
      |    / CAST(lag(revenue) OVER (ORDER BY month_start) AS DOUBLE) * 100, 4) AS pct_change
      |FROM monthly
      |ORDER BY month_us""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q121_cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    QueryDef("q122_gap_fill_daily", gapFillDaily, Some(gapFillDailySql)),
    QueryDef("q141_time_weighted_avg", timeWeightedAvg, Some(timeWeightedAvgSql)),
    QueryDef("q142_mom_revenue", momRevenue, Some(momRevenueSql)))
}
