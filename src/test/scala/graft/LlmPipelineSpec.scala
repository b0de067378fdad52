package graft

import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline

/** Internal-consistency checks between the LSH path and the
  * brute-force baselines, plus property laws for SimHash on top of its
  * r4 cross-engine oracle (engine-neutral Rabin-Karp bit votes).
  */
class LlmPipelineSpec extends SparkSpec {

  test("minhash LSH finds the same pairs as exact Jaccard on its probe subset") {
    // q76 (brute force, probes doc_id < 25, J >= 0.3) must be a superset
    // of q75's pairs restricted to that probe set and J >= 0.5: LSH may
    // only miss with negligible probability, never invent pairs.
    val lsh = LlmPipeline.minhashLsh(spark, sfDir)
      .filter(col("id1") < 25 || col("id2") < 25)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = LlmPipeline.jaccardProbe(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .select("id1", "id2").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    assert(lsh == brute, s"LSH $lsh vs brute-force $brute")
  }

  test("bucketed near-dup (q92) is a same-sim subset of exact near-dup (q77)") {
    // Bucketing can only REMOVE candidate pairs (different buckets),
    // never invent them, and surviving pairs must carry the identical
    // similarity the exact path computes.
    val exact = LlmPipeline.embeddingNearDup(spark, sfDir)
      .select("id1", "id2", "sim_r").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = LlmPipeline.bucketedNearDup(spark, sfDir)
      .select("id1", "id2", "sim_r").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(bucketed.nonEmpty, "bucketed near-dup found nothing — bucketing broken")
    bucketed.foreach { case (pair, sim) =>
      assert(exact.contains(pair), s"bucketed invented pair $pair")
      assert(math.abs(exact(pair) - sim) < 1e-9, s"sim mismatch on $pair")
    }
  }

  test("simhash: near-dup pairs have much smaller Hamming distance than random pairs") {
    val sig = LlmPipeline.simhash(spark, sfDir).select("doc_id", "simhash")
    val pairs = LlmPipeline.minhashLsh(spark, sfDir).select("id1", "id2")
    val s1 = sig.select(col("doc_id").as("id1"), col("simhash").as("h1"))
    val s2 = sig.select(col("doc_id").as("id2"), col("simhash").as("h2"))
    val nearMean = pairs.join(s1, "id1").join(s2, "id2")
      .select(bit_count(col("h1").bitwiseXOR(col("h2"))).as("d"))
      .agg(avg("d")).head.getDouble(0)
    // Random baseline: consecutive doc ids (unrelated by construction).
    val randMean = s1.withColumn("id2", col("id1") + 250)
      .join(s2, "id2")
      .select(bit_count(col("h1").bitwiseXOR(col("h2"))).as("d"))
      .agg(avg("d")).head.getDouble(0)
    assert(nearMean < randMean / 2,
      s"near-dup mean hamming $nearMean not well below random $randMean")
    assert(randMean > 8.0, s"random pairs should differ in many bits, got $randMean")
  }

  test("native word_shingles equals the HOF shingle formulation as sets") {
    graft.functions.NativeFunctions.register(spark)
    val base = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
    val both = base
      .withColumn("native", expr("word_shingles(text, 3)"))
      .withColumn("hof", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', slice(toks, i+1, 3))))"))
      .select(
        size(expr("array_except(native, hof)")).as("extra"),
        size(expr("array_except(hof, native)")).as("missing"))
      .agg(sum("extra").as("e"), sum("missing").as("m")).head
    assert(both.getLong(0) == 0 && both.getLong(1) == 0)
  }

  test("shingle_hash64: hashed Jaccard equals string Jaccard, hashes collision-free on the corpus") {
    graft.functions.NativeFunctions.register(spark)
    val sh = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("sh", expr("word_shingles(text, 3)"))
      .withColumn("hsh", expr("shingle_hash64(word_shingles(text, 3))"))
      .select("doc_id", "sh", "hsh")
    // No collision anywhere in the corpus: distinct shingle strings and
    // distinct hash keys must be in bijection, globally and per doc.
    val counts = sh.select(explode(col("sh")).as("g"))
      .agg(countDistinct(col("g"))).head.getLong(0)
    val hashCounts = sh.select(explode(col("hsh")).as("g"))
      .agg(countDistinct(col("g"))).head.getLong(0)
    assert(counts == hashCounts,
      s"shingle_hash64 collision: $counts distinct strings vs $hashCounts distinct hashes")
    val sizeMismatch = sh.filter(size(col("sh")) =!= size(col("hsh"))).count()
    assert(sizeMismatch == 0, "per-doc shingle/hash cardinality mismatch")
    // Hashed pairwise Jaccard == string pairwise Jaccard on the probe
    // cross (the comparison the LSH verify join performs).
    val a = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"), col("hsh").as("hsh1"))
      .filter(col("id1") < 50)
    val b = sh.select(col("doc_id").as("id2"), col("sh").as("sh2"), col("hsh").as("hsh2"))
    val diff = a.join(b, col("id1") < col("id2"))
      .select(
        expr("jaccard_sim(sh1, sh2)").as("js"),
        expr("jaccard_sim(hsh1, hsh2)").as("jh"))
      .filter(col("js") =!= col("jh"))
      .count()
    assert(diff == 0, s"$diff pairs where hashed Jaccard != string Jaccard")
  }

  test("simhash is deterministic and complete") {
    val a = LlmPipeline.simhash(spark, sfDir).collect()
    val b = LlmPipeline.simhash(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 500)
  }

  test("q103: dup_frac is in [0,1), covers every doc, and zero only when all grams distinct") {
    val rep = LlmPipeline.gramRepetition(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rep.count() == docs)
    val bad = rep.filter(col("dup_frac") < 0.0 || col("dup_frac") >= 1.0 ||
      col("n_distinct") > col("n_grams") || col("n_distinct") < 1).count()
    assert(bad == 0)
    val inconsistent = rep.filter(
      (col("dup_frac") === 0.0) =!= (col("n_grams") === col("n_distinct"))).count()
    assert(inconsistent == 0)
  }

  test("q104: int8 quantization bounds — |q|<=127 implies L1/L2 mass caps, maxabs quantizes to ±127") {
    val q = LlmPipeline.int8Quant(spark, sfDir)
    val bad = q.filter(col("q_l1") > col("n_dims") * 127 ||
      col("q_sq") > col("n_dims") * 127L * 127L || col("q_l1") < 1).count()
    assert(bad == 0)
    // The max-magnitude element maps to exactly ±127, so q_sq >= 127².
    assert(q.filter(col("q_sq") < 127L * 127L).count() == 0)
    // Reconstruction: dequantized values differ from the input by at most
    // 0.5/scale per element — check via the aggregate identity on one row.
    val over = graft.sources.Tables.embeddings(spark, sfDir)
      .withColumn("maxabs", expr("array_max(transform(embedding, x -> abs(x)))"))
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .withColumn("err", expr(
        "array_max(transform(embedding, x -> abs(x - round(x * scale) / scale)))"))
      .filter(col("err") > lit(0.5) / col("scale") + lit(1e-12))
      .count()
    assert(over == 0, s"$over vectors exceed the half-step reconstruction bound")
  }

  test("exact dedup keeps every doc at sf0.001 (no duplicate texts) and is idempotent") {
    val out = LlmPipeline.exactDedup(spark, sfDir)
    val n = out.count()
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.agg(sum("n_copies")).head.getLong(0) == total)
    assert(out.select("keeper").distinct().count() == n)
  }

  test("q126: two-stage projected ANN recalls most of the exact top-30") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    // Exact top-30 by full 64-d quantized distance (the ground truth the
    // candidate-generation stage is allowed to miss only narrowly).
    val quantized = graft.sources.Tables.embeddings(spark, sfDir)
      .withColumn("maxabs", expr("array_max(transform(embedding, x -> abs(x)))"))
      .withColumn("qv", expr("transform(embedding, x -> CAST(round(x * (127.0 / maxabs)) AS BIGINT))"))
      .select("vec_id", "qv")
    val probe = quantized.filter(col("vec_id") === 0).select(col("qv").as("pq"))
    val exact = quantized.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("d", expr(
        "aggregate(zip_with(qv, pq, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, d) -> acc + d)"))
      .orderBy(col("d"), col("vec_id")).limit(30)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = LlmPipeline.projectedAnn(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size
    // Isotropic random fixtures are ANN's worst case (distance
    // concentration); measured recall is 16/30 here and 17/30 at
    // sf0.01. Floor well below measurement, far above the ~6/30 a
    // random 200-candidate subset would score.
    assert(recall >= 12, s"projected-ANN recall $recall/30 vs exact top-30")
  }

  test("q176: semantic clusters cover exactly the exact-pair endpoints, one min-id representative each") {
    val out = LlmPipeline.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val pairs = LlmPipeline.embeddingNearDup(spark, sfDir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && out.nonEmpty)
    // Vertex set = exactly the vectors with >= 1 exact near-neighbor
    // (singletons excluded, the q101 convention).
    val endpoints = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(out.map(_._1).toSet == endpoints)
    // Both endpoints of every exact pair share a cluster.
    val clusterOf = out.map(t => t._1 -> t._2).toMap
    pairs.foreach { case (a, b) =>
      assert(clusterOf(a) == clusterOf(b), s"pair ($a,$b) split across clusters")
    }
    // Exactly one kept representative per cluster, and it is the min id.
    out.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._4) == 1, s"cluster $c kept ${members.count(_._4)}")
      assert(members.filter(_._4).head._1 == members.map(_._1).min &&
        c == members.map(_._1).min, s"cluster $c representative is not the min id")
      assert(members.forall(_._3 == members.size), s"cluster $c size column drifted")
    }
  }

  test("q179: ANN clusters refine q176's exactly, and recover >= 0.8 of its same-cluster pairs") {
    val exact = LlmPipeline.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ann = LlmPipeline.semanticDedupAnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(ann.nonEmpty, "ANN edge source found no clusters")
    // REFINEMENT (hard law, not statistical): every verified ANN edge
    // is an exact edge (identical threshold, candidate set a subset of
    // all pairs), so every ANN cluster sits inside one exact cluster —
    // q179 never merges vectors q176 keeps apart, and its vertex set is
    // a subset of q176's.
    val annClusters = ann.groupBy(_._2)
    annClusters.foreach { case (c, members) =>
      assert(members.forall(m => exact.contains(m._1)),
        s"ANN cluster $c contains a vector q176 considers a singleton")
      val exactOf = members.map(m => exact(m._1)).distinct
      assert(exactOf.size == 1,
        s"ANN cluster $c spans ${exactOf.size} exact clusters — refinement violated")
      // Representative convention carried over: min id, kept once.
      assert(members.count(_._4) == 1 && c == members.map(_._1).min)
      assert(members.forall(_._3 == members.size))
    }
    // RECALL (measured, the swept q163 operating point): of the
    // same-cluster vector pairs q176 asserts, the fraction q179 also
    // co-clusters. Components amplify edge recall (any surviving path
    // reconnects a cluster), so this sits at or above q163's pair
    // recall; gate at the 0.8 the RecallCurve sweep targets.
    val exactPairs = exact.toSeq.groupBy(_._2).values.flatMap { ms =>
      val ids = ms.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    }.toSeq
    val annClusterOf = ann.map(t => t._1 -> t._2).toMap
    val kept = exactPairs.count { case (a, b) =>
      annClusterOf.get(a).exists(ca => annClusterOf.get(b).contains(ca))
    }
    val recall = kept.toDouble / exactPairs.size
    assert(recall >= 0.8,
      f"q179 same-cluster pair recall $recall%.3f (${kept}/${exactPairs.size}) below 0.8")
  }

  test("q181: BM25 ranking matches a pure-Scala rebuild; every hit contains a query term; scores non-increasing") {
    val got = LlmPipeline.bm25Retrieval(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toList
    assert(got.nonEmpty)
    // Independent reference: tokenize the corpus side in plain Scala,
    // derive the same query batch, score with the identical expression
    // tree, rank by (rounded score desc, doc_id).
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 =!= 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val df = docs.flatMap { case (_, ts) => ts.distinct }.groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val terms = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(6).zipWithIndex
      .map { case ((t, d), i) => (i % 3 + 1, t, d) }
    // dl / avgl cover docs with >= 1 token only — the query's doc-length
    // aggregate comes from the exploded token stream, so a zero-token
    // doc contributes no dl row on either engine.
    val dl = docs.filter(_._2.nonEmpty)
      .map { case (id, ts) => id -> ts.length.toLong }.toMap
    val nd = docs.length.toLong
    val avgl = dl.values.sum.toDouble / dl.size.toDouble
    val expected = terms.groupBy(_._1).toList.flatMap { case (qid, qterms) =>
      val scores = docs.flatMap { case (id, ts) =>
        val contribs = qterms.flatMap { case (_, tok, d) =>
          val tf = ts.count(_ == tok).toLong
          if (tf == 0) None
          else Some((nd - d + 0.5) / (d + 0.5) * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgl)))
        }
        if (contribs.isEmpty) None else Some(id -> contribs.sum)
      }
      def r4(x: Double): Double =
        new java.math.BigDecimal(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      scores.sortBy { case (id, s) => (-r4(s), id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, r4(s)) }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected, s"BM25 ranking diverged from the Scala reference")
    // Soundness + shape: every hit matched >= 1 term (score > 0),
    // rounded scores non-increasing within each query.
    assert(got.forall(_._4 > 0))
    got.groupBy(_._1).values.foreach { hits =>
      val ordered = hits.sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
    // The batch is non-trivial: all three queries return hits.
    assert(got.map(_._1).distinct.size == 3)
  }

  test("q181/q168/q188/q189: BM25 against the MERGED artifacts equals BM25 against a full rebuild (read-side merge==rebuild)") {
    // The read-side closure of the index family's maintenance contract
    // (VERDICT r12 item 5, extended r14 to the full-postings triple):
    // merge == rebuild is already hash-verified on the artifact ROWS
    // (q168/q188/q189); this law closes it over the artifacts'
    // CONSUMER — the same query batch ranked against the maintained
    // post-merge artifacts (head index for term selection + df, full
    // postings for (tf, dl), folded stats for N/avgl) and against
    // from-scratch full-corpus rebuilds must return identical
    // rankings. (df drives both term selection and the IDF term, so a
    // merge that drifted df by even 1 on a head term would reorder;
    // one dropped posting row or a mis-added stat cell shifts a
    // score.)
    val mergedIdx = LlmPipeline.incrementalIndexMerge(spark, sfDir)
      .select("token", "df")
    val rebuiltIdx = LlmPipeline.invertedIndex(spark, sfDir)
      .select("token", "df")
    val mergedPost = LlmPipeline.incrementalPostingsMerge(spark, sfDir)
    // q189's output carries the folded one-row stats beside every doc
    // row; any single row is the stats relation.
    val mergedStats = LlmPipeline.incrementalDocStatsMerge(spark, sfDir)
      .select("nd", "ndl", "toktot").limit(1)
    val (rebuiltPost, _, rebuiltStats) = LlmPipeline.postingsFor(
      graft.sources.Tables.documents(spark, sfDir))
    val viaMerged = LlmPipeline.bm25AgainstArtifacts(mergedIdx, mergedPost, mergedStats)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val viaRebuilt = LlmPipeline.bm25AgainstArtifacts(rebuiltIdx, rebuiltPost, rebuiltStats)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(viaMerged.nonEmpty && viaMerged.length == 30,
      s"degenerate retrieval (${viaMerged.length} rows)")
    assert(viaMerged.sameElements(viaRebuilt),
      "retrieval against the merged artifacts diverged from the full rebuild")
  }

  test("q127: representatives are maximal members of their clusters, one per cluster") {
    val clusters = LlmPipeline.dedupClusters(spark, sfDir).cache()
    val reps = LlmPipeline.clusterRepresentatives(spark, sfDir).cache()
    try {
      // Exactly one representative per cluster.
      val nClusters = clusters.select("cluster").distinct().count()
      assert(reps.count() == nClusters)
      assert(reps.select("cluster").distinct().count() == nClusters)
      // The representative belongs to its cluster and no member is longer
      // (ties broken toward the smaller doc_id).
      val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id", "n_chars")
      val joined = clusters.join(docs, "doc_id")
        .join(reps.select(col("cluster"), col("rep_doc"), col("rep_chars")), "cluster")
      assert(joined.filter(col("n_chars") > col("rep_chars")).count() == 0,
        "a cluster member is longer than its representative")
      assert(joined.filter(col("doc_id") === col("rep_doc")).count() == nClusters,
        "some representative is not a member of its own cluster")
    } finally { clusters.unpersist(); reps.unpersist() }
  }

  test("q128: reported pairs are the true global top-30 by frequency") {
    import graft.sources.Tables
    val full = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n")).cache()
    try {
      // Conservation: total pair instances == sum over words of len-1.
      val total = full.agg(sum("n")).head().getLong(0)
      val expected = Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .agg(sum(length(col("w")) - 1)).head().getLong(0)
      assert(total == expected, s"pair instances $total != $expected")
      // The query's 30 rows are the lexicographically-tie-broken head of
      // the full ranking.
      val want = full.orderBy(col("n").desc, col("pair")).limit(30)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val got = LlmPipeline.bpePairCounts(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want)
    } finally full.unpersist()
  }

  test("q129: every language is downsampled to exactly the smallest language's size") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val target = docs.groupBy("lang").count().agg(min("count")).head().getLong(0)
    val kept = LlmPipeline.rebalanceMix(spark, sfDir).cache()
    try {
      val perLang = kept.groupBy("lang").count().collect()
      assert(perLang.nonEmpty && perLang.forall(_.getLong(1) == target),
        s"per-lang kept sizes ${perLang.mkString(",")} != $target")
      // Survivors are the minimal-mhash prefix of each language: no kept
      // row may have a larger hash than an unkept row of the same lang.
      val all = docs.withColumn("mhash",
        pmod(col("doc_id") * 2654435761L, lit(4294967296L)))
      val maxKept = kept.groupBy("lang").agg(max("mhash").as("kept_max"))
      val unkeptBelow = all.join(kept.select("doc_id").withColumn("k", lit(1)),
          Seq("doc_id"), "left_anti")
        .join(maxKept, "lang")
        .filter(col("mhash") < col("kept_max")).count()
      assert(unkeptBelow == 0, s"$unkeptBelow unkept rows hash below a kept row")
    } finally kept.unpersist()
  }

  test("q132: triangle join counts exactly the triangles of a known graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant edge
    // (4,5): node 5 participates in none.
    val k4 = for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)
    val edges = (k4 :+ (4L, 5L)).toDF("id1", "id2")
    val got = LlmPipeline.trianglesPerNode(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"unexpected triangle counts $got")
    // A triangle-free path graph yields nothing.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2")
    assert(LlmPipeline.trianglesPerNode(path).isEmpty)
  }

  test("q135: prefix candidates are a lossless superset of the qualifying pairs") {
    import graft.sources.Tables
    // Brute-force truth: all pairs with shingle-set Jaccard >= 0.5.
    graft.functions.NativeFunctions.register(spark)
    val sets = Tables.documents(spark, sfDir)
      .withColumn("sh", expr("word_shingles(text, 3)")).select("doc_id", "sh")
    val truth = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", expr("jaccard_sim(a.sh, b.sh)"))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = LlmPipeline.prefixFilterJoin(spark, sfDir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      s"prefix-filter join lost ${(truth -- got).size} / invented ${(got -- truth).size} pairs")
    assert(truth.nonEmpty, "fixture has no qualifying pair — test is vacuous")
  }

  test("q169: containment matches a set rebuild, dominates Jaccard, and is genuinely asymmetric") {
    import org.apache.spark.sql.functions._
    val rows = LlmPipeline.containmentProbe(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "fixture must produce containment pairs")
    // Independent set rebuild in plain Scala (3-gram shingles).
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ")
      (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    rows.foreach { case (id1, id2, c) =>
      val (a, b) = (texts(id1), texts(id2))
      val inter = (a & b).size.toDouble
      assert(math.abs(c - BigDecimal(inter / a.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"containment($id1->$id2) != |A∩B|/|A|")
      val jac = inter / (a ++ b).size
      // c is the 4-decimal-rounded output; allow the half-ulp of rounding.
      assert(c >= jac - 5e-5, "containment must dominate Jaccard on the same pair")
      // Asymmetry: the reverse direction differs whenever |A| != |B|.
      if (a.size != b.size)
        assert(math.abs(inter / a.size - inter / b.size) > 0,
          "directions must differ for different-size sets")
    }
  }
}
