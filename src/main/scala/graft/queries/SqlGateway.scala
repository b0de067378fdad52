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

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q91_sql_command", sqlCommand, Some(revenueByNationCmd)))
}
