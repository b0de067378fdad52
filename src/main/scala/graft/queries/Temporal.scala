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

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q121_cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    QueryDef("q122_gap_fill_daily", gapFillDaily, Some(gapFillDailySql)))
}
