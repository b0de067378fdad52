package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r6 item 5): the measurement behind the recorded
  * REFUSAL of PPJoin+'s suffix filter for q135 (see the
  * prefixFilterJoin Scaladoc and BASELINE.md). Prints, for a fixture
  * dir: post-filter candidates vs qualifying output and the
  * candidate-vs-full wall-clock split (the suffix filter's ceiling),
  * then the same for the ACCUMULATED-bound variant — PPJoin's per-pair
  * overlap bound (O ≤ shared-prefix rows + min remaining after the
  * last shared prefix token) evaluated in the shuffle the candidate
  * `distinct()` already pays, which strictly subsumes the prefix-side
  * information a suffix filter could use without shipping token
  * arrays. Usage: `sbt "runMain graft.SuffixProbe [sfDir]"`.
  */
object SuffixProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.NativeFunctions.register(spark)

    val sets = graft.sources.Tables.documents(spark, dir)
      .withColumn("sh", expr("shingle_hash64(word_shingles(text, 3))"))
      .select("doc_id", "sh")
    // warm
    queries.LlmPipeline.prefixFilterJoin(spark, dir).write.format("noop").mode("overwrite").save()

    val cand = queries.LlmPipeline.ppjoinCandidates(sets).count()
    val out = queries.LlmPipeline.prefixFilterJoin(spark, dir).count()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val tCand = time(queries.LlmPipeline.ppjoinCandidates(sets)
      .write.format("noop").mode("overwrite").save())
    val tFull = time(queries.LlmPipeline.prefixFilterJoin(spark, dir)
      .write.format("noop").mode("overwrite").save())
    println(s"SUFFIXPROBE dir=$dir candidates=$cand output=$out " +
      f"ratio=${cand.toDouble / out}%.3f tCand=$tCand%.2f tFull=$tFull%.2f verifyShare=${(tFull - tCand) / tFull}%.2f")

    // Experiment: accumulated PPJoin bound (group the candidate rows
    // per pair; O <= shared-prefix-row count + min remaining after the
    // LAST shared prefix token) instead of the per-row positional
    // filter + distinct.
    val exploded = sets.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("token"))
    val df_ = exploded.groupBy("token").agg(count(lit(1)).as("df"))
    val ranked = exploded.join(df_, "token")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df"), col("token"))))
      .filter(col("rn") <= col("n") / 2 + 1)
      .select("doc_id", "token", "rn", "n")
    def accCandidates = ranked.as("a")
      .join(ranked.as("b"), col("a.token") === col("b.token")
        && col("a.doc_id") < col("b.doc_id")
        && col("a.n") <= col("b.n") * 2 && col("b.n") <= col("a.n") * 2)
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("c"),
        max(col("a.rn")).as("r1"), max(col("b.rn")).as("r2"),
        first(col("a.n")).as("n1"), first(col("b.n")).as("n2"))
      .filter((col("c") + least(col("n1") - col("r1"), col("n2") - col("r2")))
        * 3 >= col("n1") + col("n2"))
      .select("id1", "id2")
    val accCand = accCandidates.count()
    val tAccCand = time(accCandidates.write.format("noop").mode("overwrite").save())
    val sets1 = sets.select(col("doc_id").as("id1"), col("sh").as("t1"))
    val sets2 = sets.select(col("doc_id").as("id2"), col("sh").as("t2"))
    def accFull = accCandidates.join(sets1, "id1").join(sets2, "id2")
      .withColumn("jaccard", expr("jaccard_sim(t1, t2)"))
      .filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
    val accOut = accFull.count()
    val tAccFull = time(accFull.write.format("noop").mode("overwrite").save())
    println(s"SUFFIXPROBE_ACC dir=$dir accCandidates=$accCand accOutput=$accOut " +
      f"tAccCand=$tAccCand%.2f tAccFull=$tAccFull%.2f")
    spark.stop()
  }
}
