package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native set-similarity kernels (SURVEY.md §2.2.10 "native expression",
  * added on profiling evidence like [[MinHashSignature]]): Spark's
  * collection expressions (array_intersect etc.) and HOF lambdas evaluate
  * interpreted per element — measured 7 s (q76) and 4 s (q79) at sf0.1.
  * One interpreted call per ROW with a tight JVM loop inside is ~20×
  * cheaper on the same work.
  */

/** Exact Jaccard similarity of two arrays treated as sets — either two
  * `array<string>` (raw shingles) or two `array<bigint>`
  * ([[ShingleHash64]]-hashed shingles, the 8-byte-key form the LSH
  * verify join ships at scale). The long path is a sort-merge
  * intersection over primitive arrays: no boxing, no hash table.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim expects two array<string> or two array<bigint> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sim"

  private lazy val elementsAreLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Sorted copy of a long array-column value with duplicates removed
    * in place; returns (array, distinctCount).
    */
  private def sortedDistinct(a: ArrayData): (Array[Long], Int) = {
    val n = a.numElements()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = a.getLong(i); i += 1 }
    java.util.Arrays.sort(arr)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    (arr, w)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (elementsAreLong) {
      val (ax, nx) = sortedDistinct(x)
      val (ay, ny) = sortedDistinct(y)
      var i = 0; var j = 0; var inter = 0
      while (i < nx && j < ny) {
        if (ax(i) == ay(j)) { inter += 1; i += 1; j += 1 }
        else if (ax(i) < ay(j)) i += 1
        else j += 1
      }
      val union = nx + ny - inter
      if (union == 0) null else inter.toDouble / union
    } else {
      val sx = new java.util.HashSet[UTF8String](x.numElements() * 2)
      var i = 0
      while (i < x.numElements()) { sx.add(x.getUTF8String(i)); i += 1 }
      val sy = new java.util.HashSet[UTF8String](y.numElements() * 2)
      var inter = 0
      var j = 0
      while (j < y.numElements()) {
        val e = y.getUTF8String(j)
        if (sy.add(e) && sx.contains(e)) inter += 1
        j += 1
      }
      val union = sx.size() + sy.size() - inter
      if (union == 0) null else inter.toDouble / union
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 30-bit SimHash fingerprint over a string array: per-element
  * Rabin-Karp polynomial hash (base 131 mod 1e9+7 over UTF-8 bytes —
  * the [[RollingHashStats]] q88 hash, integer-exact in any engine),
  * bit-vote over the 30 hash bits (1e9+7 < 2³⁰), sign. Returns a
  * non-negative long.
  *
  * The earlier xxHash64 formulation was Spark-specific, which blocked
  * any cross-engine oracle for q79; the polynomial hash is reproducible
  * in plain SQL (`list_reduce` over character codes), making the whole
  * fingerprint hash-comparable while keeping the same bit-vote
  * semantics. Ties (vote sum 0) leave the bit 0 in both engines.
  */
case class SimHashSignature(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Base = 131L
  private val Mod = 1000000007L
  private val Bits = 30

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < arr.numElements()) {
      val bytes = arr.getUTF8String(i).getBytes
      var h = 0L
      var k = 0
      while (k < bytes.length) {
        h = (h * Base + (bytes(k) & 0xff)) % Mod
        k += 1
      }
      var j = 0
      while (j < Bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
