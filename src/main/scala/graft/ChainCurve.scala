package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{LlmPipeline, PlaneChains}

/** Dev tool (r20 — VERDICT r19 item 3): the resolve-cost curve as a
  * function of CHAIN LENGTH, per plane family — the measurement behind
  * [[graft.queries.LlmPipeline.ChainCompactThreshold]]. Between
  * compactions a manifest chain grows one element per delta/tombstone
  * commit, and `PlaneChains.resolve` pays per element: plan width for
  * the `u:` unions, one broadcast anti-join per `t:` tombstone, one
  * vocabulary-sized groupBy per `o:` break in the `m:` runs, and the
  * bands re-cap window on any multi-element chain. This harness holds
  * the TOTAL data fixed and varies only how many elements carry it
  * (lengths 1/4/16/64), so the measured slope is pure chain overhead —
  * the thing the q211 compaction amortizes and the threshold bounds.
  *
  * Families measured (each: full materialize of the resolved relation
  * to a noop sink; postings additionally the In(token)-filtered
  * retrieval-shaped read):
  *
  *   - postings `u:` union chain (admission deltas),
  *   - postings `t:` tombstone stack over the base (takedowns),
  *   - index `m:` merge chain (head-index deltas),
  *   - bands `u:` chain (the re-cap window suspect).
  *
  * Usage: `sbt "runMain graft.ChainCurve"` (sf0.1 default via
  * SPARK_GRAFT_SF_DIR). Prints a markdown table for BASELINE.md.
  */
object ChainCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.NativeFunctions.register(spark)

    val lengths = Seq(1, 4, 16, 64)
    val tmp = java.nio.file.Files.createTempDirectory("graft-chaincurve-")
    try {
      val root = LlmPipeline.ensurePostingsArtifact(spark, sfDir)
      val idxPath = LlmPipeline.ensureIndexArtifact(spark, sfDir)
      val (bandsPath, _) = LlmPipeline.ensureBandIndex(spark, sfDir)
      val shard = graft.sources.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
        .localCheckpoint()
      val notice = LlmPipeline.takedownDocSet(spark, sfDir).localCheckpoint()
      println(s"shard=${shard.count()} docs, notice=${notice.count()} docs, sf=$sfDir")

      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()

      // Per length L: the SAME total delta data carried by L-1 elements
      // (slice i = rows with (key/4) % (L-1) == i), so only the element
      // count varies across columns.
      def sliceDirs(
          family: String, l: Int, of: DataFrame => DataFrame,
          key: String): Seq[String] =
        (0 until (l - 1)).map { i =>
          val p = s"$tmp/$family-$l-$i"
          of(shard.filter((col(key) / 4) % (l - 1) === i))
            .write.mode(SaveMode.Overwrite).parquet(p)
          p
        }

      def noticeSlices(l: Int): Seq[String] =
        (0 until (l - 1)).map { i =>
          val p = s"$tmp/tomb-$l-$i"
          notice.filter(col("doc_id") % (l - 1) === i)
            .write.mode(SaveMode.Overwrite).parquet(p)
          p
        }

      val queryTerms = spark.read.parquet(idxPath)
        .orderBy(col("df").desc, col("token").asc).limit(6)
        .select("token").collect().map(_.getString(0)).toSeq

      case class Leg(name: String, plane: String, chainOf: Int => String,
        filtered: Boolean = false)
      val legs = Seq(
        Leg("postings u-chain (admission deltas), full resolve", "postings",
          l => (s"$root/postings" +: sliceDirs("post", l,
            d => LlmPipeline.postingsFor(d)._1, "doc_id").map("u:" + _))
            .mkString(";")),
        Leg("postings u-chain, In(token) retrieval read", "postings",
          l => (s"$root/postings" +: sliceDirs("postf", l,
            d => LlmPipeline.postingsFor(d)._1, "doc_id").map("u:" + _))
            .mkString(";"),
          filtered = true),
        Leg("postings t-stack (tombstones), full resolve", "postings",
          l => (s"$root/postings" +: noticeSlices(l).map("t:" + _))
            .mkString(";")),
        Leg("index m-chain (head-index deltas), full resolve", "index",
          l => (idxPath +: sliceDirs("idx", l,
            LlmPipeline.admissionIdxDelta, "doc_id").map("m:" + _))
            .mkString(";")),
        Leg("bands u-chain (re-cap window), full resolve", "bands",
          l => (bandsPath +: sliceDirs("band", l,
            d => LlmPipeline.lshBands(LlmPipeline.shingledFor(d))
              .select("doc_id", "band", "bsig"), "doc_id").map("u:" + _))
            .mkString(";")))

      // Warm-up: JIT + codegen on the shortest chains.
      legs.foreach(leg => noop(
        PlaneChains.resolve(spark, leg.plane, leg.chainOf(1))))

      println(s"\n| resolve read | " +
        lengths.map(l => s"L=$l (s)").mkString(" | ") + " | shape |")
      println("|---|" + lengths.map(_ => "---|").mkString + "---|")
      legs.foreach { leg =>
        val ts = lengths.map { l =>
          val chain = leg.chainOf(l)
          time {
            val r = PlaneChains.resolve(spark, leg.plane, chain)
            noop(if (leg.filtered)
              r.filter(col("token").isin(queryTerms: _*)) else r)
          }
        }
        val shape =
          if (ts.last <= ts.head * 3) "~flat"
          else f"${ts.last / ts.head}%.1fx at L=64"
        println(f"| ${leg.name} | " +
          ts.map(t => f"$t%.2f").mkString(" | ") + s" | $shape |")
      }
      println(s"\nChainCompactThreshold=${LlmPipeline.ChainCompactThreshold} " +
        "(auto-compaction fires when a committed chain exceeds it)")
    } finally {
      LlmPipeline.deleteRecursively(tmp)
      spark.stop()
    }
  }
}
