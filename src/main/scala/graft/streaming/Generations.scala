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

  /** Crash-replay guard for the compaction folds (ADVICE r15): an
    * INCOMPLETE (markerless) batch generation strictly past the base
    * being folded and at or below the fold target may be a crashed
    * in-flight batch whose stream replay will rewrite it at the SAME
    * id. Committing a base at `upTo` ≥ that id and deleting the
    * partial would leave the replayed generation ≤ baseGen —
    * permanently invisible to the merged read: silent data loss. A
    * markerless generation ≤ the old base is provably a mid-cleanup
    * leftover (the fold that committed that base ran this guard, so
    * no in-flight partial existed then) and stays safely deletable.
    * Under the in-stream cadence (compact at batchId − 1, foreachBatch
    * strictly sequential so every prior batch is committed) this never
    * fires; it guards the out-of-band compaction API. Call it on the
    * FOLD path only — on the committed-target-skip path the same
    * markerless window holds the partially-deleted inputs of the
    * completed fold, which MUST be cleaned up.
    */
  def requireNoInflight(
      dirs: Seq[java.nio.file.Path], oldBaseMax: Option[Long],
      upTo: Long, what: String): Unit = {
    // In-flight = present in ANY axis but not committed in EVERY axis:
    // a multi-axis commit can crash between axes, leaving one axis'
    // generation complete and a sibling's absent entirely — that id is
    // just as rewritable-by-replay as a markerless partial.
    val present = dirs.flatMap(d => genIds(d)).distinct
    val inflight = present
      .filterNot(b => dirs.forall(d => isComplete(d.resolve(s"batch_id=$b"))))
      .filter(b => b <= upTo && oldBaseMax.forall(b > _))
      .sorted
    if (inflight.nonEmpty)
      throw new IllegalStateException(
        s"$what: incomplete batch generation(s) ${inflight.mkString(",")} at or " +
          s"below fold target $upTo — possibly a crashed in-flight batch a " +
          "stream replay will rewrite at the same id; folding past it would " +
          "make the rewrite permanently invisible. Compact at an id strictly " +
          "below the earliest incomplete generation instead.")
  }
}
