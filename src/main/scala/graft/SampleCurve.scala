package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r13): the q187 priority-sampling operating point chosen
  * from a committed error curve instead of folklore — the RecallCurve
  * discipline applied to the sampling row. For each sample size k and
  * each of 8 independent Lehmer multipliers (8 near-independent
  * draws), compute the realized relative error of the
  * Duffield–Lund–Thorup subset-sum estimator over the sf0.1 lineitem
  * quantity total, and report the per-k mean |rel err| and worst
  * draw against the 1/√k theory line.
  *
  * The recurrence here is the identical integer arithmetic the query
  * and its oracle share (two-round Lehmer u, fixed-point priority
  * w·(2³¹−2) div u, τ = the (k+1)-th priority, est = Σ max(w, τ)), run
  * in plain Scala over the collected (key, weight) pairs — the
  * estimator's cost model is not under test (it is one TakeOrdered),
  * its ERROR is. Usage: `sbt "runMain graft.SampleCurve [sfDir]"`;
  * prints a markdown table for BASELINE.md.
  */
object SampleCurve {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val M = 2147483647L
    val rows = sources.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "cast(l_linenumber as bigint)", "cast(l_quantity as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = rows.map(_._3).sum
    val mults = Seq(48271L, 16807L, 69621L, 40692L, 39373L, 27437L, 50653L, 76829L)

    def rel(k: Int, a: Long): Double = {
      def u(ok: Long, ln: Long): Long = ((ok * 8 + ln) % M) * a % M * a % M + 1
      // Sort by the query's FULL total order — (priority desc,
      // l_orderkey, l_linenumber) — not priority alone: under a
      // priority tie at the k/(k+1) boundary, an arbitrary tie-break
      // here could pick a different τ than the shipped operating point
      // realizes (ADVICE r13).
      val pr = rows.map { case (ok, ln, w) => (w * 2147483646L / u(ok, ln), ok, ln, w) }
        .sortBy { case (p, ok, ln, _) => (-p, ok, ln) }
      val tau = pr(k)._1
      val est = pr.take(k).map { case (_, _, _, w) => math.max(w, tau) }.sum
      (est - exact).toDouble / exact
    }

    println(s"exact total = $exact over ${rows.length} rows at $dir")
    println("| k | mean \\|rel err\\| (8 draws) | worst draw | 1/sqrt(k) theory |")
    println("|---|---|---|---|")
    Seq(10, 25, 50, 100, 200, 800).foreach { k =>
      val rels = mults.map(rel(k, _))
      println(f"| $k | ${rels.map(math.abs).sum / rels.length}%.3f " +
        f"| ${rels.map(math.abs).max}%.3f | ${1.0 / math.sqrt(k)}%.3f |")
    }
    spark.stop()
  }
}
