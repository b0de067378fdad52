package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's public surface: every operator from SURVEY.md §2.2 is a
  * named DataFrame program in [[queries]]; SQL-expressible ones carry
  * DuckDB oracle SQL in [[oracleSql]] for the driver's hash-compare.
  */
object SparkEntry {

  /** All query packs, one per SURVEY.md §2.2 area. */
  private def packs: Seq[QueryPack] = Seq(
    Relational, Joins, SetOps, Aggregates, Windows, Scalars, Sessions, TimeJoins,
    LlmPipeline, SourcesOps, Reshape, SqlGateway, Changelog, Profiling, Temporal)

  lazy val defs: Seq[QueryDef] = {
    val ds = packs.flatMap(_.all)
    require(ds.map(_.name).distinct.size == ds.size, "duplicate query names")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap

  /** Subset used for headline benchmarking (Bench.scala). */
  def headlineQueries: Seq[QueryDef] = defs.filter(_.headline)
}
