package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-hash fingerprint stats (struct-returning expression;
  * same profiling rationale as [[MinHashSignature]]): one O(n) pass with
  * a true rolling update — the HOF formulation recomputes every 16-char
  * window from scratch through interpreted lambdas (O(n·w), measured
  * 7.5 s for q88 at sf0.1).
  *
  * Semantics are bit-identical to the SQL oracle: for each window start
  * i, h(i) = fold(chars[i..i+15], (a, c) → (a·131 + c) mod 1e9+7);
  * windows with h % 8 == 0 are the winnowing sample; fingerprint = min
  * sampled hash (-1 if none); doc_hash = fold over ALL bytes. Operates
  * on the UTF-8 bytes (the fixture corpus is ASCII, where bytes ==
  * ascii(char)).
  */
case class RollingHashStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Base = 131L
  private val Mod = 1000000007L
  private val W = 16

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_stats expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", IntegerType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = false),
    StructField("fingerprint", LongType, nullable = false),
    StructField("doc_hash", LongType, nullable = false)))

  override def prettyName: String = "rolling_stats"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // B^(W-1) mod M for the rolling pop of the outgoing byte.
    var pow = 1L
    var p = 0
    while (p < W - 1) { pow = pow * Base % Mod; p += 1 }

    var docHash = 0L
    var i = 0
    while (i < n) { docHash = (docHash * Base + (bytes(i) & 0xff)) % Mod; i += 1 }

    val nWindows = math.max(n - W + 1, 1)
    var h = 0L
    var nChunks = 0
    var fingerprint = Long.MaxValue
    val firstLen = math.min(W, n)
    i = 0
    while (i < firstLen) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    var start = 0
    while (start < nWindows) {
      if (h % 8 == 0) {
        nChunks += 1
        if (h < fingerprint) fingerprint = h
      }
      if (start + W < n) {
        val out = (bytes(start) & 0xff).toLong
        h = ((h - out * pow % Mod + Mod) % Mod * Base + (bytes(start + W) & 0xff)) % Mod
      }
      start += 1
    }
    new GenericInternalRow(Array[Any](
      nWindows, nChunks, if (fingerprint == Long.MaxValue) -1L else fingerprint, docHash))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
