package graft

import java.io.File

import graft.queries.SourcesOps

class CompactionSpec extends SparkSpec {

  test("q130: compaction collapses 64 fragments to the size-targeted count, losslessly") {
    val row = SourcesOps.compaction(spark, sfDir).head()
    def partFiles(p: String): Int =
      new File(p).listFiles().count(_.getName.startsWith("part-"))
    val small = SourcesOps.ensureSmallFiles(spark, sfDir)
    val smallCount = partFiles(small)
    assert(smallCount == 64, s"fragmented layout has $smallCount files, expected 64")
    val compacted = small.replace("small_li_", "compact_li_")
    val bytes = new File(small).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sum
    val expectTarget = math.max(1L, (bytes + (8L << 20) - 1) / (8L << 20)).toInt
    assert(partFiles(compacted) == expectTarget,
      s"compacted file count ${partFiles(compacted)} != target $expectTarget")
    assert(expectTarget < smallCount, "compaction target not smaller than input")
    // Lossless: the integrity row equals the original table's aggregates.
    import org.apache.spark.sql.functions._
    val orig = graft.sources.Tables.lineitem(spark, sfDir).agg(
      count(lit(1)), sum(col("l_orderkey")),
      sum(col("l_linenumber").cast("long")),
      sum(round(col("l_extendedprice") * 100).cast("long"))).head()
    assert(row == orig, s"integrity row $row != original $orig")
  }
}
