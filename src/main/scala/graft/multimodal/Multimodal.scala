package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column handling (SURVEY.md §2.2.11 / builder mandate):
  * image/audio/video payloads are opaque `binary` columns with typed
  * metadata beside them; decode / feature-extraction runs partition-
  * batched so per-batch setup (a real codec would be expensive to
  * initialize) is amortized — the Scala analogue of `mapInPandas`.
  *
  * The container has no image/audio codecs and the fixtures carry no real
  * media, so the corpus is synthesized deterministically from
  * `documents.text` bytes and [[StubCodec.decode]] is a clearly-marked
  * STUB: it computes deterministic pseudo-features (dimensions, byte
  * stats) from the payload. The Spark-side plumbing — binary schema,
  * metadata struct, partition-batched processing, feature schema — is
  * real and spec-tested; swapping the stub for javacv/ffmpeg is a
  * one-function change.
  *
  * Scale notes: payload bytes never shuffle — features are extracted
  * before any wide operation and the binary column is dropped as soon as
  * features exist. At 100 TB the media table is read with the binary
  * column only in the mapPartitions stage; downstream joins/aggs carry
  * the ~100-byte feature row.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      source: String)

  /** Extracted features (what survives past the decode stage). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      head_byte: Int,
      byte_sum: Long,
      fake_width: Int,
      fake_height: Int)

  /** STUB codec. A real deployment replaces `decode` with an actual
    * image/audio decoder (javacv, TwelveMonkeys, ffmpeg-cli …) — the
    * surrounding pipeline does not change.
    */
  object StubCodec {
    /** Deterministic fake decode: byte stats + pseudo-dimensions. */
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      // STUB: stands in for e.g. ImageIO.read(...).getWidth/Height.
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      val w = 16 + (sum % 64).toInt
      val h = 16 + ((sum / 64) % 64).toInt
      (w, h, sum)
    }
  }

  /** Synthesized media corpus: documents' text bytes as payloads. */
  def mediaCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
          .otherwise(lit("video")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))

  /** Partition-batched feature extraction (the mapInPandas analogue):
    * one codec "session" per partition, payload dropped on output.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // A real codec would be initialized once per partition HERE.
      rows.map { r =>
        val (w, h, sum) = StubCodec.decode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          if (r.payload.isEmpty) -1 else r.payload(0) & 0xff, sum, w, h)
      }
    }
  }

  /** "Frame sampling" on the opaque payload: take every k-th byte chunk
    * (stands in for video frame extraction; pure column ops, codegen'd).
    */
  def sampleChunks(media: DataFrame, chunk: Int, everyK: Int): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("chunk_starts",
        expr(s"filter(sequence(1, greatest(n_bytes - $chunk + 1, 1), $chunk), (s, i) -> i % $everyK = 0)"))
      .withColumn("chunks",
        expr(s"transform(chunk_starts, s -> substring(payload, s, $chunk))"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        size(col("chunks")).as("n_chunks"), col("chunks"))

  /** "Resize" on the decoded dimensions: fit into a box preserving
    * aspect ratio (integer math — a real pipeline would resample pixels
    * here; the dimension arithmetic is the part that shapes downstream
    * batching and is fully real).
    */
  def resizeToBox(features: DataFrame, box: Int): DataFrame =
    features
      .withColumn("long_side", greatest(col("fake_width"), col("fake_height")))
      .withColumn("res_w", (col("fake_width") * box / col("long_side")).cast("int"))
      .withColumn("res_h", (col("fake_height") * box / col("long_side")).cast("int"))
      .drop("long_side")

  /** End-to-end feature query: decode-stub features joined back to the
    * typed metadata, aggregated per kind.
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaCorpus(spark, dir)).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("fake_width")).as("min_w"),
        max(col("fake_height")).as("max_h"))
      .orderBy("kind")
}
