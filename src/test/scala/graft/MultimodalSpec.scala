package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("payload byte length equals ASCII text length and features are deterministic") {
    val media = Multimodal.mediaCorpus(spark, sfDir)
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(
      graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id").as("media_id"), length(col("text")).as("text_len")),
      "media_id")
    assert(joined.filter(col("n_bytes") =!= col("text_len")).count() == 0)
    val a = feats.orderBy("media_id").collect().toSeq
    val b = Multimodal.extractFeatures(media).toDF().orderBy("media_id").collect().toSeq
    assert(a == b, "decode stub must be deterministic")
  }

  test("fake dimensions are within the stub's declared range") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaCorpus(spark, sfDir)).toDF()
    val bad = feats.filter(
      col("fake_width") < 16 || col("fake_width") > 79 ||
      col("fake_height") < 16 || col("fake_height") > 79).count()
    assert(bad == 0)
  }

  test("resize fits the box and preserves aspect ordering") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaCorpus(spark, sfDir)).toDF()
    val resized = Multimodal.resizeToBox(feats, 32)
    val bad = resized.filter(
      col("res_w") > 32 || col("res_h") > 32 ||
      col("res_w") < 1 || col("res_h") < 1 ||
      (col("fake_width") >= col("fake_height")) =!= (col("res_w") >= col("res_h"))).count()
    assert(bad == 0)
    // The long side always hits the box exactly.
    assert(resized.filter(greatest(col("res_w"), col("res_h")) =!= 32).count() == 0)
  }

  test("chunk sampling covers the payload with the declared stride") {
    val media = Multimodal.mediaCorpus(spark, sfDir)
    val chunks = Multimodal.sampleChunks(media, chunk = 16, everyK = 2)
    val r = chunks.select("media_id", "n_bytes", "n_chunks").collect()
    r.foreach { row =>
      val nBytes = row.getInt(1); val nChunks = row.getInt(2)
      val starts = (1 to math.max(nBytes - 16 + 1, 1) by 16).size
      // Spark's filter((s, i) -> ...) index is 0-based.
      val expected = (0 until starts).count(_ % 2 == 0)
      assert(nChunks == expected, s"media ${row.getLong(0)}: $nChunks vs $expected")
    }
    // Chunks are real byte slices of the payload.
    val flat = chunks.select(col("media_id"), explode(col("chunks")).as("c"))
      .withColumn("len", octet_length(col("c")))
    assert(flat.filter(col("len") > 16).count() == 0)
  }
}
