package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregates (SURVEY.md §2.2.10).
  *
  * Both are classic partial-aggregation shapes: the buffer is tiny and
  * mergeable, so Spark runs them map-side-partial + reduce-side-final like
  * any built-in — the 100 TB behavior is identical to sum/avg (shuffle
  * carries one buffer per group per task, never rows).
  *
  * The reference system has no aggregation surface at all (its only record
  * type is an opaque command string — reference src/raft/node.go:16-19);
  * these fulfil the capability-closure rows mandated by SURVEY.md §2.2.4
  * ("Custom typed Aggregator") and §2.2.10 ("Typed UDAF").
  */
object Udafs {

  /** Weighted arithmetic mean: sum(x*w)/sum(w). Input (value, weight). */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Mergeable buffer for [[VectorCentroid]]: elementwise sums + count. */
  final case class CentroidBuf(sums: Array[Double], n: Long)

  /** Elementwise mean of fixed-dimension vectors (embedding centroids).
    * `dim` is fixed per instance so `zero` is well-defined without peeking
    * at the first row.
    */
  final class VectorCentroid(dim: Int)
      extends Aggregator[Seq[Double], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = CentroidBuf(Array.fill(dim)(0.0), 0L)
    override def reduce(b: CentroidBuf, v: Seq[Double]): CentroidBuf = {
      val s = b.sums
      var i = 0
      while (i < dim) { s(i) += v(i); i += 1 }
      CentroidBuf(s, b.n + 1)
    }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      val s = a.sums
      var i = 0
      while (i < dim) { s(i) += b.sums(i); i += 1 }
      CentroidBuf(s, a.n + b.n)
    }
    override def finish(r: CentroidBuf): Seq[Double] =
      if (r.n == 0L) Seq.fill(dim)(Double.NaN)
      else r.sums.map(_ / r.n).toSeq
    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Mergeable buffer for [[SpaceSaving]]: parallel arrays of the
    * tracked keys, their count ESTIMATES, and their error bounds.
    * Arrays (not a map) keep the buffer product-encodable for the
    * partial→final shuffle; within a partition Spark's object
    * aggregation iterator keeps it deserialized, so updates mutate the
    * arrays in place.
    */
  final case class SsBuf(keys: Array[String], counts: Array[Long], errs: Array[Long]) {
    /** Transient O(1) probe index (key → slot). Only the constructor
      * arrays survive the encoder, so this is null after a
      * partial→final round-trip and is rebuilt lazily on first probe;
      * the reduce-path mutators keep it in sync thereafter, so the
      * per-row cost is one hash probe, not a k-wide `indexOf` scan.
      */
    @transient private[functions] var idx: java.util.HashMap[String, Integer] = _

    private[functions] def index: java.util.HashMap[String, Integer] = {
      if (idx == null) {
        idx = new java.util.HashMap[String, Integer](keys.length * 2 + 8)
        var i = 0
        while (i < keys.length) { idx.put(keys(i), i); i += 1 }
      }
      idx
    }
  }

  /** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a
    * typed Aggregator, with the MERGE rule from Agarwal et al.,
    * "Mergeable Summaries" (PODS 2012) — the one-pass approximate
    * top-k that replaces a full groupBy when only items with
    * frequency > N/k matter (top tokens/domains/keys over 100 TB
    * without shuffling every distinct key; the shuffle carries one
    * k-slot buffer per task, like any partial aggregate).
    *
    * Maintained guarantees (the q154 contract gate asserts all three
    * against exact counts):
    *   1. est(x) >= true(x) for every tracked x (estimates are upper
    *      bounds);
    *   2. est(x) - err(x) <= true(x) (the error bound is honest);
    *   3. every x with true(x) > N/k is tracked (heavy hitters are
    *      never evicted past their guarantee).
    *
    * Reduce: hit → count+1; miss with a free slot → insert (1, 0);
    * miss when full → replace the min-count slot, inheriting its count
    * as the error bound. Merge: for a key absent from a FULL side,
    * that side's true count is at most its min count — add min to the
    * estimate AND to the error (net zero on the lower bound); for a
    * key absent from a non-full side the true count there is exactly
    * 0. Then keep the top k by estimate. The tracked SET is
    * partition-order-dependent (ties are broken by arrival), which is
    * why q154 gates the three CONTRACTS (deterministic theorems), not
    * the sketch contents — the q143 sketch-gate design.
    *
    * Per-row probes are O(1): the encoded parallel arrays carry a
    * TRANSIENT hash index (key → slot) that the encoder ignores —
    * rebuilt lazily after each partial→final round-trip, kept in sync
    * by the reduce-path mutators. The remaining O(k) work is the min
    * scan, paid only on EVICTION (a miss against a full sketch) — on
    * the skewed streams the sketch exists for, hits dominate. k is
    * fixed per instance so `zero` is well-defined.
    */
  final class SpaceSaving(k: Int)
      extends Aggregator[String, SsBuf, Seq[SpaceSaving.Entry]] {
    require(k > 0, "k must be positive")

    override def zero: SsBuf =
      SsBuf(Array.empty[String], Array.empty[Long], Array.empty[Long])

    override def reduce(b: SsBuf, key: String): SsBuf = {
      val ix = b.index
      val slot = ix.get(key)
      if (slot != null) { b.counts(slot) += 1L; b }
      else if (b.keys.length < k) {
        // Growth phase: the O(k) append-copy happens at most k times
        // per task, and the index is carried forward (one put), never
        // rebuilt.
        val nb = SsBuf(b.keys :+ key, b.counts :+ 1L, b.errs :+ 0L)
        ix.put(key, b.keys.length)
        nb.idx = ix
        b.idx = null // nb owns the index now; b is dead after return
        nb
      } else {
        var m = 0
        var j = 1
        while (j < b.counts.length) { if (b.counts(j) < b.counts(m)) m = j; j += 1 }
        val min = b.counts(m)
        ix.remove(b.keys(m))
        ix.put(key, m)
        b.keys(m) = key
        b.counts(m) = min + 1L
        b.errs(m) = min
        b
      }
    }

    override def merge(a: SsBuf, b: SsBuf): SsBuf = {
      if (b.keys.isEmpty) return a
      if (a.keys.isEmpty) return b
      // Bound on the true count of a key UNSEEN by a side: its min
      // count if that side is full, else 0 (a non-full sketch has seen
      // every key it ever will — nothing was evicted).
      val defA = if (a.keys.length >= k) a.counts.min else 0L
      val defB = if (b.keys.length >= k) b.counts.min else 0L
      val bIdx = b.keys.zipWithIndex.toMap
      val merged = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var i = 0
      while (i < a.keys.length) {
        val key = a.keys(i)
        bIdx.get(key) match {
          case Some(j) =>
            merged += ((key, a.counts(i) + b.counts(j), a.errs(i) + b.errs(j)))
          case None =>
            merged += ((key, a.counts(i) + defB, a.errs(i) + defB))
        }
        i += 1
      }
      val aKeys = a.keys.toSet
      var j = 0
      while (j < b.keys.length) {
        if (!aKeys.contains(b.keys(j)))
          merged += ((b.keys(j), b.counts(j) + defA, b.errs(j) + defA))
        j += 1
      }
      // Keep top k by estimate; ties by key for a deterministic CUT
      // (the retained set can still differ by arrival order upstream).
      val top = merged.sortBy { case (key, est, _) => (-est, key) }.take(k)
      SsBuf(top.map(_._1).toArray, top.map(_._2).toArray, top.map(_._3).toArray)
    }

    override def finish(r: SsBuf): Seq[SpaceSaving.Entry] =
      r.keys.indices
        .map(i => SpaceSaving.Entry(r.keys(i), r.counts(i), r.errs(i)))
        .sortBy(e => (-e.est, e.token))

    override def bufferEncoder: Encoder[SsBuf] = Encoders.product[SsBuf]
    override def outputEncoder: Encoder[Seq[SpaceSaving.Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SpaceSaving.Entry]]()
  }

  object SpaceSaving {
    /** One tracked item: estimate is an upper bound on the true count,
      * `est - err` a lower bound.
      */
    final case class Entry(token: String, est: Long, err: Long)
  }

  /** The k smallest distinct-ish longs per group, as a sorted array —
    * the bounded "posting-list head" aggregation (q149). Why an
    * Aggregator and not a window: `row_number().over(partitionBy(key))`
    * routes EVERY row of a hot key through one task (a corpus-scale
    * stop-word token at 100 TB = one sequential task), while this
    * buffer is a classic mergeable partial: each map task keeps ≤ k
    * values per key, the shuffle carries ≤ k per (key, partition), and
    * the reducer merges sorted runs — bounded state AND bounded
    * per-task work under any skew. Input values need not be distinct
    * (the caller dedups) or ordered.
    *
    * Buffer is a sorted Array[Long] of ≤ k elements; reduce does a
    * binary-search insert only when the value beats the current k-th
    * (O(log k) probe, O(k) memmove on accept — k is small by design).
    */
  final class MinKLongs(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0)
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], v: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, v)
      if (pos >= 0) b // already present — heads are over distinct ids
      else {
        val ins = -pos - 1
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = v
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins < k) {
          val out = b.clone()
          System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
          out(ins) = v
          out
        } else b
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // Merge two sorted runs, dropping duplicates, keeping the first k.
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (b(j) < a(i)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v }
        if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
