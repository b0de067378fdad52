package graft

import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline

/** q199's parity law (the TemporalSpec discipline): the distributed
  * BPE training loop must equal an INDEPENDENT in-memory reference —
  * written with the classic index-scan greedy merge (emit merged,
  * skip consumed), not the engine's string replace — on both the
  * merge table and the final vocabulary. This pins the semantics the
  * oracle alone can't: that `replace`-with-delimiters IS the greedy
  * non-overlapping merge of symbol sequences.
  */
class BpeTrainSpec extends SparkSpec {

  private def scanMerge(syms: Vector[String], x: String, y: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
        out += (x + y); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("q199 == pure-Scala greedy BPE recurrence (merge table + final vocab)") {
    import spark.implicits._
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    var state: Vector[(Vector[String], Long)] =
      words.toVector.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to LlmPipeline.BpeRounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, n) =>
        syms.indices.dropRight(1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
        }
      }
      val ((x, y), n) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      merges += ((r, x, y, n))
      state = state.map { case (syms, wn) => (scanMerge(syms, x, y), wn) }
    }
    val vocab = state.flatMap { case (syms, n) => syms.map(_ -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (s, c) => (-c, s) }
      .take(LlmPipeline.BpeVocabTop)
      .zipWithIndex
      .map { case ((s, c), _) => (LlmPipeline.BpeRounds + 1, s, "", c) }
    val expected = (merges.result() ++ vocab)
      .sortBy { case (r, x, y, _) => (r, x, y) }
    val got = LlmPipeline.bpeTrain(spark, sfDir)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == expected,
      s"distributed BPE diverged from the in-memory recurrence:\n got=$got\n exp=$expected")
  }
}
