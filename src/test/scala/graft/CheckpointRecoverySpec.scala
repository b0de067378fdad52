package graft

import java.nio.file.{Files, Paths}

import graft.streaming.DurableIngest

/** Streaming durability (VERDICT r2 gap #1): a checkpointed file→parquet
  * query stopped and restarted across incarnations must deliver every
  * input record exactly once — the Structured Streaming analogue of the
  * reference's durable ordered apply stream (rpc_server.go:98-111).
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def readIds(out: String): Seq[Long] = {
    import spark.implicits._
    spark.read.schema(DurableIngest.schema).parquet(out)
      .select("id").as[Long].collect().toSeq.sorted
  }

  private def writeFile(src: String, name: String, ids: Range): Unit =
    Files.writeString(
      Paths.get(src, name),
      ids.map(i => s"""{"id":$i,"v":"e$i"}""").mkString("\n"))

  test("file→parquet stream resumes from checkpoint exactly-once across restarts") {
    val base = Files.createTempDirectory("graft_ckpt").toString
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    def drain(): Unit = {
      val q = DurableIngest.start(spark, src, out, ckpt)
      q.awaitTermination()
    }

    // Incarnation 1: two files available.
    writeFile(src, "a.json", 0 until 40)
    writeFile(src, "b.json", 40 until 80)
    drain()
    assert(readIds(out) == (0L until 80L), "incarnation 1 must ingest all available input")

    // New input lands while the query is DOWN; incarnation 2 resumes from
    // the checkpoint and must pick up exactly the new file.
    writeFile(src, "c.json", 80 until 120)
    drain()
    assert(readIds(out) == (0L until 120L), "restart must ingest exactly the new input")

    // Incarnation 3 with no new input: no loss was possible, so the only
    // failure mode is duplication — there must be none.
    drain()
    assert(readIds(out) == (0L until 120L), "restart with no new input must not duplicate")
  }

  test("a query killed mid-stream loses nothing and duplicates nothing on restart") {
    val base = Files.createTempDirectory("graft_ckpt_kill").toString
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))
    (0 until 6).foreach(i => writeFile(src, s"f$i.json", i * 20 until (i + 1) * 20))

    // Continuous incarnation, one file per micro-batch; stop() lands at an
    // arbitrary point in the 6-batch sequence (possibly mid-batch).
    val q = DurableIngest.start(spark, src, out, ckpt, availableNow = false)
    // Let it make some progress, then kill it wherever it happens to be.
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (q.recentProgress.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    q.stop()

    // Resume from the same checkpoint and drain the rest.
    val q2 = DurableIngest.start(spark, src, out, ckpt)
    q2.awaitTermination()
    assert(readIds(out) == (0L until 120L),
      "after kill + resume, every record must appear exactly once")
  }
}
