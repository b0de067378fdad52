package graft

import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline

/** Laws for the chunking/packing family (q111–q113): brute-force
  * cross-checks and conservation invariants that hold on ANY corpus,
  * not just the fixtures — these are the properties that must survive
  * a 100-TB input unchanged.
  */
class ChunkPackSpec extends SparkSpec {

  test("q111: dup-chunk counts match a brute-force recount and conserve totals") {
    val stats = LlmPipeline.chunkDedupStats(spark, sfDir).collect()
    // Conservation: every doc with >= 8 tokens appears, n_chunks = n_toks / 8.
    val expected = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) / 8).cast("long").as("nc"))
      .filter(col("nc") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats.map(_.getLong(0)).toSet == expected.keySet)
    stats.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)),
        s"doc ${r.getLong(0)}: n_chunks ${r.getLong(1)} != ${expected(r.getLong(0))}")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
    }
    // Brute-force recount of total dup instances via a groupBy (the
    // 2-shuffle plan the window-based query avoids).
    val chunks = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) div 8 - 1), k -> concat_ws(' ', slice(toks, k*8+1, 8)))"))
        .as("chunk"))
    val dupTotal = chunks.groupBy("chunk").count().filter(col("count") > 1)
      .agg(sum("count")).head.getLong(0)
    assert(stats.map(_.getLong(2)).sum == dupTotal,
      "window-based dup instances != groupBy brute-force recount")
  }

  test("q112: packing conserves docs/tokens, respects capacity, and seq ids are dense") {
    val capacity = 128
    val seqs = LlmPipeline.sequencePacking(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok")).collect()
    // Conservation: every doc packed exactly once, every token accounted.
    assert(seqs.map(_.getLong(2)).sum == docs.length.toLong)
    assert(seqs.map(_.getLong(3)).sum == docs.map(_.getInt(1).toLong).sum)
    // Capacity: no sequence overfills (every fixture doc is <= capacity).
    assert(docs.forall(_.getInt(1) <= capacity), "fixture doc exceeds capacity")
    seqs.foreach { r =>
      assert(r.getLong(3) <= capacity, s"sequence overfilled: $r")
      assert(r.getLong(2) >= 1)
      assert(r.getLong(4) == capacity - r.getLong(3))
    }
    // Density: per bucket, seq ids are exactly 0..n-1 (no gaps, no dups).
    seqs.groupBy(_.getInt(0)).foreach { case (b, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.sameElements(0L until ids.length.toLong), s"bucket $b seq ids not dense")
    }
    // Greedy tightness: consecutive sequences in a bucket cannot merge —
    // the FIRST doc of sequence k+1 must not fit in sequence k's residual
    // (that doc is what forced the break). Recompute the per-bucket greedy
    // on the driver and compare the full assignment.
    val expected = docs.map(r => (r.getLong(0) % 8, r.getLong(0), r.getInt(1)))
      .groupBy(_._1).flatMap { case (b, ds) =>
        var seq = 0L; var fill = 0L
        val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
        ds.sortBy(_._2).foreach { case (_, _, n) =>
          if (fill == 0L || fill + n > capacity) {
            if (fill != 0L) seq += 1
            fill = n.toLong
          } else fill += n
          val cur = out.getOrElse((b, seq), (0L, 0L))
          out((b, seq)) = (cur._1 + 1, cur._2 + n)
        }
        out.map { case ((bb, s), (nd, f)) => (bb, s) -> (nd, f) }
      }
    val got = seqs.map(r => (r.getInt(0).toLong, r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, "distributed packing != driver greedy replay")
  }

  test("q113: chunks tile each document with stride 24 and width <= 32") {
    val chunks = LlmPipeline.tokenChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet)
    byDoc.foreach { case (id, cs) =>
      val toks = texts(id)
      val sorted = cs.sortBy(_._2)
      // Dense chunk indices; every chunk is the exact slice it claims.
      assert(sorted.map(_._2).sameElements(0 until sorted.length))
      sorted.foreach { case (_, idx, chunk, nToks) =>
        val start = idx * 24
        val want = toks.slice(start, math.min(start + 32, toks.length))
        assert(chunk == want.mkString(" "), s"doc $id chunk $idx mismatch")
        assert(nToks == want.length && nToks <= 32)
      }
      // Coverage: last chunk reaches the document end.
      val (_, lastIdx, _, lastN) = sorted.last
      assert(lastIdx * 24 + lastN == toks.length, s"doc $id tail not covered")
    }
  }
}
