package graft

import org.apache.spark.sql.SparkSession

/** Isolated-query timing harness (r21 measurement tool — guide §1):
  * runs the named queries (args) against $SPARK_GRAFT_SF_DIR with the
  * Bench methodology (noop sink, prepare excluded, one sf0.001 warm-up
  * pass) and prints per-query seconds over N repeats, so a single
  * operator can be measured without paying the full 211-query bench.
  *
  * Usage: sbt "runMain graft.OneQuery q210_admission_delta_commit [more...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_REPEATS (default 3).
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    val picked = args.toSeq.map(n =>
      byName.getOrElse(n, sys.error(s"unknown query $n")))
    picked.foreach { d =>
      try d.fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      d.prepare.foreach(p => p(spark, sfDir))
    }
    picked.foreach { d =>
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ONEQUERY ${d.name}%-42s " +
        times.map(t => f"$t%7.2f").mkString(" "))
    }
    spark.stop()
  }
}
