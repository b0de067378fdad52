package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Set operations (SURVEY.md §2.2.7): union all/distinct, intersect[ all],
  * except[ all]. Spark set ops hash-partition both sides on the full row —
  * same shuffle shape as a groupBy on all columns; fine at scale as long as
  * the projected row is narrow, which these queries keep to 1-2 columns.
  */
object SetOps extends QueryPack {

  /** UNION ALL (bag) of two tagged projections; unionByName guards against
    * positional-schema drift.
    */
  def unionAllTagged(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("src"))
    val big = o.filter(col("o_totalprice") > 250000.0)
      .select(lit("big").as("src"), col("o_orderkey")) // reversed on purpose
    urgent.unionByName(big)
      .orderBy("src", "o_orderkey")
  }

  private val unionAllTaggedSql =
    """SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 250000.0
      |ORDER BY src, o_orderkey""".stripMargin

  /** UNION (set): nations that have a customer or a supplier. */
  def unionDistinctNations(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
    c.union(s).distinct().orderBy("nationkey")
  }

  private val unionDistinctNationsSql =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** INTERSECT: customers with an urgent order AND a finished order. */
  def intersectCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val finished = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    urgent.intersect(finished).orderBy("o_custkey")
  }

  private val intersectCustomersSql =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** EXCEPT (set difference): customer keys that never placed an urgent
    * order (non-empty at every sf; the unfiltered variant is empty because
    * every fixture customer has at least one order).
    */
  def exceptCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.except(o).orderBy("c_custkey")
  }

  private val exceptCustomersSql =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY c_custkey""".stripMargin

  /** INTERSECT ALL (bag semantics — multiplicities preserved):
    * urgent-order custkeys ∩ finished-order custkeys, with duplicates.
    */
  def intersectAllCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val finished = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    urgent.intersectAll(finished).orderBy("o_custkey")
  }

  private val intersectAllCustomersSql =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** EXCEPT ALL (bag difference): order-placing custkeys minus one
    * occurrence per urgent order.
    */
  def exceptAllCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val all = o.select("o_custkey")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    all.exceptAll(urgent).orderBy("o_custkey")
  }

  private val exceptAllCustomersSql =
    """SELECT o_custkey FROM orders
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q20_union_all_tagged", unionAllTagged, Some(unionAllTaggedSql)),
    QueryDef("q21_union_distinct", unionDistinctNations, Some(unionDistinctNationsSql)),
    QueryDef("q22_intersect", intersectCustomers, Some(intersectCustomersSql)),
    QueryDef("q23_except", exceptCustomers, Some(exceptCustomersSql)),
    QueryDef("q24_intersect_all", intersectAllCustomers, Some(intersectAllCustomersSql)),
    QueryDef("q25_except_all", exceptAllCustomers, Some(exceptAllCustomersSql)))
}
