package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` for the named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the per-round before/after
  * plan evidence the optimization deliverable asks for. Transaction
  * queries dump their plan SURROGATE (QueryDef.planAudit), same as
  * PlanAudit. Uses PlanAudit's session config (local[4],
  * auto-broadcast off, sf0.001) so shapes are stable across rounds.
  *
  * Usage: sbt "runMain graft.PlanDump r21 after q210_admission_delta_commit ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    names.foreach { n =>
      val d = byName.getOrElse(n, sys.error(s"unknown query $n"))
      val (fn, surrogate) = d.planAudit match {
        case Some(a) => (a, true)
        case None    => (d.fn, false)
      }
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val head = if (surrogate)
        s"-- ${d.name} (plan-audit SURROGATE — the fn stages side-effecting writes)\n"
      else s"-- ${d.name}\n"
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), head + plan)
      println(s"wrote plans/$tag/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
