package graft

import org.apache.spark.sql.functions._

import graft.queries.Joins
import graft.sources.Tables

class FuzzyJoinSpec extends SparkSpec {

  test("q125: blocked pairs match the unblocked quadratic join within the block key") {
    // The fixture's name universe is tiny, so the full quadratic join is
    // computable here: the blocked join must equal it EXACTLY on pairs
    // sharing a noun, and every missed pair must differ in its noun —
    // the recall the blocking key gives up, made explicit.
    val names = Tables.part(spark, sfDir).select("p_name").distinct()
    val a = names.select(col("p_name").as("name_a"))
    val b = names.select(col("p_name").as("name_b"))
    val full = a.crossJoin(b)
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
      .withColumn("noun_a", element_at(split(col("name_a"), " "), 2))
      .withColumn("noun_b", element_at(split(col("name_b"), " "), 2))
      .cache()
    try {
      val blocked = Joins.editDistanceJoin(spark, sfDir)
        .select("name_a", "name_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val sameNoun = full.filter(col("noun_a") === col("noun_b"))
        .select("name_a", "name_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(blocked == sameNoun,
        s"blocked join != quadratic join restricted to the block key")
      // Non-vacuity: the block key actually restricts something here.
      assert(full.count() >= sameNoun.size)
    } finally full.unpersist()
  }
}
