package graft.streaming

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Generation-directory bookkeeping shared by the streaming state
  * chains ([[StreamingAdmission]]'s label snapshots / history bases,
  * [[SketchMaintenance]]'s sketch bases).
  *
  * Completeness gate (ADVICE r13): Spark's parquet job commit is NOT
  * atomic — a crash mid-write leaves a partial directory under the
  * final name. Any reader that selects a snapshot/base generation by
  * directory name alone would prefer that partial state (and a
  * compaction re-run would "detect" it as a complete prior fold, then
  * truncate the still-needed inputs — permanent state loss). A
  * generation is therefore LIVE only when the `_SUCCESS` job-commit
  * marker Spark writes at successful completion exists; a markerless
  * directory is a crashed partial write, excluded from every read and
  * discarded/redone by the next compaction from its still-present
  * inputs (inputs are deleted LAST, strictly after the marker lands —
  * the write-first/delete-last ordering makes the fallback state
  * always available).
  */
private[streaming] object Generations {

  /** Numbered generation directories under `dir` (driver-side control
    * plane — one listing per batch, never row data).
    */
  def genIds(dir: java.nio.file.Path, prefix: String = "batch_id="): Seq[Long] =
    if (!java.nio.file.Files.isDirectory(dir)) Seq.empty
    else Using.resource(java.nio.file.Files.list(dir)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix).toLong)
        .toSeq
    }

  /** True iff the generation directory carries Spark's `_SUCCESS`
    * job-commit marker — i.e. the write that produced it ran to
    * completion.
    */
  def isComplete(dir: java.nio.file.Path): Boolean =
    java.nio.file.Files.exists(dir.resolve("_SUCCESS"))

  /** Generations under `dir` whose write committed. */
  def completeGenIds(dir: java.nio.file.Path, prefix: String = "batch_id="): Seq[Long] =
    genIds(dir, prefix).filter(g => isComplete(dir.resolve(s"$prefix$g")))
}
