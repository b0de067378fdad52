package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile-sketch aggregates (q183 — the quantile analog of q182's
  * HLL maintenance; VERDICT r12 item 6). Same architecture as Spark's
  * own `hll_sketch_agg`/`hll_union_agg` family: native
  * `TypedImperativeAggregate`s whose in-memory buffer IS the
  * DataSketches sketch object — rows update the heap sketch directly
  * and serialization happens only at partial-aggregation boundaries,
  * so per-row cost is O(1) amortized, the buffer is constant-size
  * (~3 KB at k = 200), and partials merge map-side like any built-in
  * sketch. A Scala `Aggregator` over serialized bytes would instead
  * heapify+reserialize per input row.
  *
  * The KLL sketch (Karnin, Lang, Liberty, "Optimal Quantile
  * Approximation in Streams", FOCS 2016; the Apache DataSketches
  * implementation bundled with Spark) is MERGEABLE: per-shard sketches
  * union into a sketch whose normalized rank error keeps the published
  * ε(k) bound regardless of how the stream was sharded — the property
  * that makes percentile maintenance a 100-TB primitive (shards are
  * sketched once; only ~3 KB sketches move). Like the HLL family
  * (q182's measured lesson), compaction uses randomized offsets and is
  * merge-path dependent, so NOTHING value-level is claimed
  * cross-engine: queries emit exact columns plus BOOLEAN rank-band
  * contract cells with multi-ε headroom.
  */
object KllSketchAggs {
  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `kll_sketch_agg(value, k)` — build a KLL doubles sketch over the
  * group's values; returns the serialized sketch (binary).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg: k $k outside [8, 65535]")

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllSketchAggs.heapify(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_union_agg(sketch)` — merge serialized KLL sketches (the late
  * fold over per-shard sketches). The buffer starts as the first
  * input's heapified sketch so the union inherits its k; merging
  * sketches of different k is legal KLL (result takes the smaller k,
  * i.e. the looser bound), exactly like the library.
  */
case class KllUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[KllDoublesSketch]] with UnaryLike[Expression] {

  override def prettyName: String = "kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[KllDoublesSketch] = None

  override def update(
      buffer: Option[KllDoublesSketch], input: InternalRow): Option[KllDoublesSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = KllSketchAggs.heapify(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(in)
        case Some(b) => b.merge(in); buffer
      }
    }
  }

  override def merge(
      buffer: Option[KllDoublesSketch],
      other: Option[KllDoublesSketch]): Option[KllDoublesSketch] = (buffer, other) match {
    case (Some(b), Some(o)) => b.merge(o); buffer
    case (Some(_), None) => buffer
    case _ => other
  }

  override def eval(buffer: Option[KllDoublesSketch]): Any =
    buffer.map(_.toByteArray).orNull

  override def serialize(buffer: Option[KllDoublesSketch]): Array[Byte] =
    buffer.map(_.toByteArray).getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[KllDoublesSketch] =
    if (storageFormat.isEmpty) None else Some(KllSketchAggs.heapify(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** `kll_sketch_quantile(sketch, rank)` — read one quantile estimate
  * from a serialized KLL sketch. Scalar, evaluated on a handful of
  * final rows (the sketches are group-count-sized), so interpreted
  * eval is the right trade — no codegen needed.
  */
@ExpressionDescription(usage = "kll_sketch_quantile(sk, rank)")
case class KllSketchQuantile(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "kll_sketch_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val sk = left.eval(input)
    val rk = right.eval(input)
    if (sk == null || rk == null) null
    else {
      val s = KllSketchAggs.heapify(sk.asInstanceOf[Array[Byte]])
      if (s.isEmpty) null else s.getQuantile(rk.asInstanceOf[Double])
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllSketchQuantile =
    copy(left = newLeft, right = newRight)
}
