package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Theta-sketch aggregates and set-operation readers (q185 — the
  * SET-ALGEBRA member of the mergeable-sketch maintenance plane): the
  * operation HLL fundamentally cannot provide. HLL registers only
  * union; a theta sketch (Dasgupta, Lang, Rhodes, Thaler, "A framework
  * for estimating stream expression cardinalities", EDBT 2016; the
  * Apache DataSketches implementation bundled with Spark) is a uniform
  * SAMPLE of the key set — the k smallest values of a fixed seeded hash
  * — so merged per-shard sketches support INTERSECTION and DIFFERENCE
  * estimates, not just union: audience overlap across 100-TB
  * partitions without a distinct-join.
  *
  * Merge-path independence (probed before pinning, the q182
  * discipline): a per-shard sketch retains its shard's k smallest
  * hashes; any hash in the global k-smallest is in its own shard's
  * k-smallest, so the union of per-shard sketches retains exactly the
  * global k-smallest — the MinKLongs postings-head argument — and the
  * merged sketch is IDENTICAL under every sharding (measured: %7 and
  * %13 shardings estimate bit-equal at sf0.1). Hashing is fixed-seed,
  * so estimates are deterministic given the key SET. Below k retained
  * entries the sketch is in exact mode (estimate == true cardinality);
  * above, the relative standard error is ~1/√k (~1.56 % at the shipped
  * k = 4096). Intersection/difference errors grow as the result
  * shrinks relative to the inputs — the reader for A∖B therefore
  * surfaces the sketch's own [lb, ub] interval rather than a naked
  * point estimate.
  */
object ThetaSketchAggs {
  private[functions] def heapify(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  private[functions] def newUnion(k: Int): Union =
    SetOperation.builder().setNominalEntries(k).buildUnion()

  private[functions] def result(u: Union): CompactSketch = u.getResult(true, null)
}

/** `theta_sketch_agg(key, k)` — build a theta sketch over the group's
  * long keys; returns the serialized compact sketch (binary). The
  * buffer is a theta Union (which accepts raw updates), so row updates
  * and partial merges share one in-place structure.
  */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(k >= 16 && k <= (1 << 26) && (k & (k - 1)) == 0,
    s"theta_sketch_agg: k $k must be a power of 2 in [16, 2^26]")

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketchAggs.newUnion(k)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(ThetaSketchAggs.result(other))
    buffer
  }

  override def eval(buffer: Union): Any = ThetaSketchAggs.result(buffer).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    ThetaSketchAggs.result(buffer).toByteArray
  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = ThetaSketchAggs.newUnion(k)
    u.union(ThetaSketchAggs.heapify(storageFormat))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sketch, k)` — merge serialized theta sketches (the
  * late fold over per-shard sketches).
  */
case class ThetaUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(k >= 16 && k <= (1 << 26) && (k & (k - 1)) == 0,
    s"theta_union_agg: k $k must be a power of 2 in [16, 2^26]")

  override def prettyName: String = "theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketchAggs.newUnion(k)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(ThetaSketchAggs.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(ThetaSketchAggs.result(other))
    buffer
  }

  override def eval(buffer: Union): Any = ThetaSketchAggs.result(buffer).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    ThetaSketchAggs.result(buffer).toByteArray
  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = ThetaSketchAggs.newUnion(k)
    u.union(ThetaSketchAggs.heapify(storageFormat))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `theta_estimate(sketch)` — distinct-count estimate of one serialized
  * theta sketch. Scalar on final rows; interpreted eval (the
  * KllSketchQuantile convention).
  */
@ExpressionDescription(usage = "theta_estimate(sk)")
case class ThetaEstimate(child: Expression)
  extends Expression with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val sk = child.eval(input)
    if (sk == null) null
    else ThetaSketchAggs.heapify(sk.asInstanceOf[Array[Byte]]).getEstimate
  }

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_bounds(sk)` — [lower(3σ), estimate, upper(3σ)] of one
  * serialized theta sketch: the scale-honest read. The ±band contract
  * cells are calibrated at fixture depth; at 100-TB depth the claim
  * that survives is "the truth is inside the sketch's OWN interval",
  * which tightens/widens with the retained-sample depth automatically.
  * In exact mode lb == est == ub.
  */
@ExpressionDescription(usage = "theta_bounds(sk)")
case class ThetaBounds(child: Expression)
  extends Expression with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "theta_bounds"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val sk = child.eval(input)
    if (sk == null) null
    else {
      val s = ThetaSketchAggs.heapify(sk.asInstanceOf[Array[Byte]])
      new GenericArrayData(Array(s.getLowerBound(3), s.getEstimate, s.getUpperBound(3)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ThetaBounds =
    copy(child = newChild)
}

/** `theta_intersect_estimate(a, b)` — |A ∩ B| estimate from two
  * serialized theta sketches: the read HLL cannot answer.
  */
@ExpressionDescription(usage = "theta_intersect_estimate(a, b)")
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "theta_intersect_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val i = SetOperation.builder().buildIntersection()
      i.intersect(ThetaSketchAggs.heapify(a.asInstanceOf[Array[Byte]]))
      i.intersect(ThetaSketchAggs.heapify(b.asInstanceOf[Array[Byte]]))
      i.getResult().getEstimate
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** `theta_intersect_bounds(a, b)` — [lower(3σ), estimate, upper(3σ)]
  * of |A ∩ B|; the theta_bounds form of the intersection read.
  */
@ExpressionDescription(usage = "theta_intersect_bounds(a, b)")
case class ThetaIntersectBounds(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "theta_intersect_bounds"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val i = SetOperation.builder().buildIntersection()
      i.intersect(ThetaSketchAggs.heapify(a.asInstanceOf[Array[Byte]]))
      i.intersect(ThetaSketchAggs.heapify(b.asInstanceOf[Array[Byte]]))
      val r = i.getResult()
      new GenericArrayData(Array(r.getLowerBound(3), r.getEstimate, r.getUpperBound(3)))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectBounds =
    copy(left = newLeft, right = newRight)
}

/** `theta_anotb_bounds(a, b)` — [lower(3σ), estimate, upper(3σ)] of
  * |A ∖ B| from two serialized theta sketches. The difference of two
  * large near-equal sets is the high-relative-error read (measured
  * ~15 % at the fixture's 239-of-19.7k difference), so this reader
  * surfaces the sketch's own confidence interval instead of a naked
  * point — the contract bounds the TRUTH, not the estimator. In exact
  * mode (either input below k) lb == est == ub == the exact count.
  */
@ExpressionDescription(usage = "theta_anotb_bounds(a, b)")
case class ThetaAnotbBounds(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "theta_anotb_bounds"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val d = SetOperation.builder().buildANotB().aNotB(
        ThetaSketchAggs.heapify(a.asInstanceOf[Array[Byte]]),
        ThetaSketchAggs.heapify(b.asInstanceOf[Array[Byte]]))
      new GenericArrayData(Array(d.getLowerBound(3), d.getEstimate, d.getUpperBound(3)))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAnotbBounds =
    copy(left = newLeft, right = newRight)
}
