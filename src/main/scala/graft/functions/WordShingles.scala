package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingling (same profiling rationale as
  * the other kernels): equivalent to
  * `array_distinct(transform(sequence(0, size(toks)-n), i -> concat_ws(' ', slice(toks, i+1, n))))`
  * over `split(text, ' ')`, but one pass per row instead of interpreted
  * per-window lambdas. Element order is first-occurrence (like
  * array_distinct); all downstream consumers (minhash, jaccard, simhash)
  * are set-semantics and order-insensitive.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "shingle size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    // split(text, ' ') semantics: empty tokens from repeated separators
    // are KEPT (limit -1), matching Spark's split.
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = mutable.LinkedHashSet.empty[UTF8String]
    if (toks.length < n) {
      // Deliberate DIVERGENCE from the HOF formulation for short inputs:
      // sequence(0, size-n) with size < n ERRORS in Spark, so the HOF
      // chain cannot process <n-token rows at all. We degrade to a
      // single whole-text shingle instead. The native==HOF equality spec
      // therefore only holds for rows with >= n tokens (all fixture
      // documents qualify: min 10 tokens).
      out.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
