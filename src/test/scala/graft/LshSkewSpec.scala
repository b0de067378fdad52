package graft

import org.apache.spark.sql.functions._

/** Hard guards for the banded-LSH near-dup path (q75/q96):
  *
  *  1. Recall: the DuckDB oracle computes exact all-pairs Jaccard, while
  *     Spark computes banded-LSH candidates — probabilistically a true
  *     pair at J≈0.5 misses all 16 bands with ~35% probability, so the
  *     driver gate is only sound while LSH recall is exactly 1.0 on the
  *     fixtures. This spec fails loudly (naming the missed pairs) if a
  *     fixture/shingle change ever breaks that precondition, instead of
  *     letting the engines silently diverge.
  *  2. Skew: a degenerate bucket (boilerplate corpus — thousands of docs
  *     sharing one band signature) must not materialize an unbounded id
  *     list or an unbounded pair stream in one task. The cap ranks
  *     members by doc_id and keeps the lowest K deterministically.
  */
class LshSkewSpec extends SparkSpec {
  import spark.implicits._

  private def shingledDocs(dir: String) = {
    graft.functions.NativeFunctions.register(spark)
    graft.sources.Tables.documents(spark, dir)
      .withColumn("sh", expr("word_shingles(text, 3)"))
      .select("doc_id", "sh")
  }

  test("LSH pair set equals the exact all-pairs answer on the fixtures (q75/q96 oracle precondition)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val sh = shingledDocs(dir)
      val lsh = queries.LlmPipeline.lshNearDupPairs(sh)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val exact = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
        .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), col("id1") < col("id2"))
        .filter(expr("jaccard_sim(sh1, sh2)") >= 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(lsh == exact,
        s"LSH recall != 1.0 at $dir: missed=${(exact -- lsh).toSeq.sorted.take(5)} " +
          s"extra=${(lsh -- exact).toSeq.sorted.take(5)} — the q75/q96 DuckDB oracle " +
          "computes exact all-pairs Jaccard, so this divergence fails the driver gate")
    }
  }

  test("adversarial giant band bucket: candidate generation is capped deterministically") {
    graft.functions.NativeFunctions.register(spark)
    // 200 byte-identical shingle sets: every one of the 16 band buckets
    // is degenerate with all 200 members.
    val sh = spark.range(0, 200).toDF("doc_id")
      .withColumn("sh", expr("array('a b c', 'b c d', 'c d e')"))
    val cap = 8
    val pairs = queries.LlmPipeline.lshNearDupPairs(sh, cap)
      .select("id1", "id2").as[(Long, Long)].collect()
    // Per bucket ≤ cap members ⇒ ≤ cap·(cap−1)/2 pairs; the kept members
    // (lowest doc_ids) are identical across bands, so the distinct pair
    // set is exactly that bound — not 200·199/2 = 19900.
    assert(pairs.length == cap * (cap - 1) / 2,
      s"capped bucket produced ${pairs.length} pairs, expected ${cap * (cap - 1) / 2}")
    assert(pairs.forall { case (a, b) => a < cap && b < cap && a < b },
      "cap must keep the deterministic lowest doc_ids")
  }

  test("multi-table LSH recall (q97) strictly exceeds single-table recall (q92) vs exact q77") {
    // Exact answer: q77's all-pairs cosine >= 0.4 at sf0.01. One table of
    // 4 hyperplanes only catches pairs agreeing on all 4 sign bits;
    // 3 independent tables recover 1-(1-p)^3 of them.
    val dir = "/root/testdata/sf0.01"
    import org.apache.spark.sql.Row
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map { case Row(a: Long, b: Long) => (a, b) }.toSet
    val exact = pairSet(queries.LlmPipeline.embeddingNearDup(spark, dir))
    val single = pairSet(queries.LlmPipeline.bucketedNearDup(spark, dir))
    val multi = pairSet(queries.LlmPipeline.multiTableNearDup(spark, dir))
    assert(single.subsetOf(exact) && multi.subsetOf(exact),
      "LSH candidates verified at the same threshold must be subsets of the exact answer")
    assert(multi.size > single.size,
      s"multi-table recall ${multi.size}/${exact.size} must strictly exceed " +
        s"single-table ${single.size}/${exact.size}")
  }

  test("q101 clusters satisfy the component laws against the q75 pair graph") {
    // Engine-local graph laws (the DuckDB recursive-CTE oracle is the
    // cross-engine signal): both endpoints of every near-dup pair share
    // a cluster, every cluster id is the min doc_id of its members, and
    // cluster sizes sum to the node count.
    val dir = "/root/testdata/sf0.01"
    val clusters = queries.LlmPipeline.dedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = queries.LlmPipeline.minhashLsh(spark, dir)
      .select("id1", "id2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid is not its min member id")
      assert(members.values.forall(_._2 == members.size), s"cluster $cid size mismatch")
    }
  }

  test("cap is a no-op below the threshold") {
    graft.functions.NativeFunctions.register(spark)
    val sh = spark.range(0, 40).toDF("doc_id")
      .withColumn("sh", expr("array('a b c', 'b c d', 'c d e')"))
    val n = queries.LlmPipeline.lshNearDupPairs(sh).count()
    assert(n == 40L * 39 / 2, s"default cap altered a small bucket: $n pairs")
  }
}
