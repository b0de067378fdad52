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
}
