package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Durable exactly-once file→parquet ingest (SURVEY.md §2.2.9 sinks row;
  * reference-direct: the one hard guarantee the reference engine provides
  * is a durable, ordered, exactly-once apply stream —
  * /root/reference/src/raft/rpc_server.go:98-111, replication.go:88-103).
  *
  * Structured Streaming's analogue of that replicated-log guarantee is
  * the checkpoint: source offsets (which input files are consumed) and
  * the sink commit log (which output files are published) both live under
  * `checkpointLocation`, so a query killed at ANY point and restarted
  * from the same checkpoint resumes with no loss and no duplication —
  * CheckpointRecoverySpec stops and restarts a query mid-stream and
  * asserts the final table equals the batch answer exactly once.
  *
  * Scale notes: the file source lists + checkpoints file names, the
  * parquet sink commits atomically via its _spark_metadata log — both
  * driver-side metadata operations, independent of data volume; the data
  * path itself is a plain distributed scan → write.
  */
object DurableIngest {

  /** Input record schema for the ingest demo: (id, v). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  /** Start (or resume — determined solely by the checkpoint contents) the
    * ingest stream. `availableNow = true` drains all currently-available
    * input and terminates (the batch-like incarnation); `false` runs a
    * continuous micro-batch query the caller stops — either way the same
    * checkpoint carries exactly-once state across incarnations.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      checkpointDir: String,
      availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val in = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(srcDir)
    val w = in.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
