package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min frequency-sketch aggregates (q184 — the point-FREQUENCY
  * member of the mergeable-sketch maintenance plane, beside q182's HLL
  * distinct counts and q183's KLL quantiles): per-shard CM sketches
  * built once, merged late, point-queried for per-key counts. Same
  * architecture as the KLL family (functions/KllSketch.scala): native
  * `TypedImperativeAggregate`s whose buffer IS the sketch object, so
  * rows update in place and serialization happens only at partial-agg
  * boundaries.
  *
  * The CM sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005; Spark's bundled `org.apache.spark.util.sketch` implementation)
  * is a depth×width grid of counters: update = +1 at one hashed cell
  * per row, point query = min over rows. Two properties make it the
  * strongest-contract member of the plane:
  *
  *   - NEVER UNDERESTIMATES: est(k) ≥ exact(k) is a theorem (each cell
  *     holds the key's count plus non-negative collision mass).
  *   - MERGE-PATH INDEPENDENT: merge is cell-wise counter addition,
  *     which commutes and associates EXACTLY — so (unlike HLL's HIP
  *     estimator and KLL's randomized compaction, q182/q183's measured
  *     lessons) the merged sketch is bit-identical under EVERY
  *     sharding, and merged == direct-build. Probed before pinning:
  *     identical estimates across %7 / %13 shardings and direct build
  *     at sf0.01 (the q182 discipline of measuring library behavior
  *     before contracting it).
  *
  * The overestimate is bounded by ε·n with ε = 2/width (probabilistic
  * per key at confidence 1 − 2^−depth, but DETERMINISTIC given data +
  * seed — hashing is seeded, so a cell that holds at a fixture holds on
  * every re-run).
  */
object CountMinAggs {
  private[functions] def fromBytes(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  private[functions] def toBytes(cm: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    cm.writeTo(bos)
    bos.toByteArray
  }
}

/** `cm_sketch_agg(key, depth, width, seed)` — build a count-min sketch
  * over the group's long keys; returns the serialized sketch (binary).
  * depth/width/seed must be literals and must match across every shard
  * that will later be unioned (`mergeInPlace` requires identical
  * geometry and seed — enforced by the library).
  */
case class CmSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 64, s"cm_sketch_agg: depth $depth outside [1, 64]")
  require(width >= 8 && width <= (1 << 24), s"cm_sketch_agg: width $width outside [8, 2^24]")

  override def prettyName: String = "cm_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v.asInstanceOf[Number].longValue(), 1L)
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = CountMinAggs.toBytes(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] = CountMinAggs.toBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): CountMinSketch =
    CountMinAggs.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmSketchAgg =
    copy(child = newChild)
}

/** `cm_union_agg(sketch)` — merge serialized count-min sketches (the
  * late fold over per-shard sketches). Cell-wise addition: exact,
  * commutative, associative — the merged grid is identical no matter
  * how the stream was sharded or in what order partials arrive.
  */
case class CmUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CountMinSketch]] with UnaryLike[Expression] {

  override def prettyName: String = "cm_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[CountMinSketch] = None

  override def update(
      buffer: Option[CountMinSketch], input: InternalRow): Option[CountMinSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = CountMinAggs.fromBytes(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(in)
        case Some(b) => b.mergeInPlace(in); buffer
      }
    }
  }

  override def merge(
      buffer: Option[CountMinSketch],
      other: Option[CountMinSketch]): Option[CountMinSketch] = (buffer, other) match {
    case (Some(b), Some(o)) => b.mergeInPlace(o); buffer
    case (Some(_), None) => buffer
    case _ => other
  }

  override def eval(buffer: Option[CountMinSketch]): Any =
    buffer.map(CountMinAggs.toBytes).orNull

  override def serialize(buffer: Option[CountMinSketch]): Array[Byte] =
    buffer.map(CountMinAggs.toBytes).getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[CountMinSketch] =
    if (storageFormat.isEmpty) None else Some(CountMinAggs.fromBytes(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmUnionAgg =
    copy(child = newChild)
}

/** `cm_estimate(sketch, key)` — point-query one key's frequency
  * estimate from a serialized count-min sketch. Scalar, evaluated on a
  * handful of final rows (the per-query heapify is metadata-sized), so
  * interpreted eval is the right trade — the KllSketchQuantile
  * convention.
  */
@ExpressionDescription(usage = "cm_estimate(sk, key)")
case class CmEstimate(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "cm_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val sk = left.eval(input)
    val key = right.eval(input)
    if (sk == null || key == null) null
    else CountMinAggs.fromBytes(sk.asInstanceOf[Array[Byte]])
      .estimateCount(java.lang.Long.valueOf(key.asInstanceOf[Number].longValue()))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}
