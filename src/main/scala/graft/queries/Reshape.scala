package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Reshaping operators and subquery forms: pivot (long→wide),
  * unpivot/melt (wide→long), correlated scalar subqueries (decorrelated
  * by Catalyst into the join+aggregate the oracle states directly).
  *
  * Scale notes: pivot with an EXPLICIT value list is one aggregation
  * pass (values discovered at planning would cost an extra distinct
  * scan); unpivot is a generate-style expand (rows × metrics) with no
  * shuffle; the correlated subquery decorrelates to a per-key aggregate
  * + equi join — same shuffle shape as writing the join by hand.
  */
object Reshape extends QueryPack {

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** Pivot: per-nation customer counts, one column per market segment. */
  def pivotSegments(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.customer(spark, dir)
      .groupBy("c_nationkey")
      .pivot("c_mktsegment", segments)
      .count()
    segments.foldLeft(wide) { (df, s) =>
      df.withColumn(s, coalesce(col(s), lit(0L)))
    }.orderBy("c_nationkey")
  }

  private val pivotSegmentsSql =
    """SELECT c_nationkey,
      |  count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
      |  count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS "BUILDING",
      |  count(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS "FURNITURE",
      |  count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
      |  count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS "MACHINERY"
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** Unpivot/melt: per-nation entity counts from wide to (metric, n). */
  def unpivotCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(s, Seq("nationkey"), "full")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .unpivot(Array(col("nationkey")),
        Array(col("n_customers"), col("n_suppliers")), "metric", "n")
      .orderBy("nationkey", "metric")
  }

  private val unpivotCountsSql =
    """WITH wide AS (
      |  SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      |    coalesce(n_customers, 0) AS n_customers,
      |    coalesce(n_suppliers, 0) AS n_suppliers
      |  FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
      |        FROM customer GROUP BY 1) c
      |  FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      |             FROM supplier GROUP BY 1) s USING (nationkey))
      |SELECT nationkey, 'n_customers' AS metric, n_customers AS n FROM wide
      |UNION ALL
      |SELECT nationkey, 'n_suppliers' AS metric, n_suppliers AS n FROM wide
      |ORDER BY nationkey, metric""".stripMargin

  /** Correlated scalar subquery through the SQL surface — customers above
    * their nation's average balance. Catalyst decorrelates this into the
    * aggregate+join the oracle would also plan.
    */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_cs")
    spark.sql(
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal
        |FROM customer_cs o
        |WHERE c_acctbal > (SELECT avg(i.c_acctbal) FROM customer_cs i
        |                   WHERE i.c_nationkey = o.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  private val correlatedSubquerySql =
    """SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal
      |FROM customer o
      |WHERE c_acctbal > (SELECT avg(i.c_acctbal) FROM customer i
      |                   WHERE i.c_nationkey = o.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q26_pivot", pivotSegments, Some(pivotSegmentsSql)),
    QueryDef("q27_unpivot", unpivotCounts, Some(unpivotCountsSql)),
    QueryDef("q67_correlated_subquery", correlatedSubquery, Some(correlatedSubquerySql)))
}
