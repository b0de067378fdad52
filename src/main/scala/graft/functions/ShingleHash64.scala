package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hash each string shingle to one engine-neutral 8-byte key
  * (`array<string>` → `array<bigint>`, element-wise, order-preserving).
  *
  * At 100 TB the LSH dedup pipeline's dominant shuffle payload is the
  * shingle sets riding through the band/verify joins — 3-gram word
  * shingles average tens of bytes each, so hashing every shingle to a
  * fixed 8-byte key before the signature/verify stages cuts the
  * shuffled bytes by ~5–10× while leaving the banding asymptotics
  * untouched (minhash and Jaccard are set-semantics, and a permutation
  * of distinct shingles hashes to a same-size set of distinct keys
  * unless two shingles collide).
  *
  * The key combines TWO Rabin-Karp polynomial hashes over the UTF-8
  * bytes — h1 (base 131 mod 1e9+7, the q79/q88 SimHash/rolling-hash
  * kernel) and h2 (base 137 mod 1e9+9) — as `h1 * 1e9+9 + h2`:
  *   - max value ≈ 1.0e18 < 2⁶³, so the key is a plain signed int64;
  *   - every step fits int64 arithmetic (h < 1e9+9, h·137+255 < 2⁴⁰),
  *     so the identical value is computable in any SQL engine without
  *     128-bit math — the DuckDB oracles CAN reproduce it, keeping
  *     hashed-shingle queries oracle-expressible (the reason this is
  *     Rabin-Karp and not Spark-private xxhash64);
  *   - a single 30-bit modulus would collide at ~2¹⁵ shingles
  *     (birthday); the ~60-bit pair pushes that to ~2³⁰ distinct
  *     shingles per comparison universe. A collision anywhere in a
  *     fixture would shift a Jaccard value or a set size and fail the
  *     cross-engine hash gate LOUDLY (LlmPipelineSpec also pins
  *     hashed == string Jaccard and corpus-wide hash distinctness).
  *
  * CodegenFallback like [[MinHashSignature]]: one interpreted call per
  * row around a tight JVM loop; the per-element work is the point.
  */
case class ShingleHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      var h1 = 0L
      var h2 = 0L
      var k = 0
      while (k < bytes.length) {
        val b = bytes(k) & 0xff
        h1 = (h1 * 131L + b) % 1000000007L
        h2 = (h2 * 137L + b) % 1000000009L
        k += 1
      }
      out(i) = h1 * 1000000009L + h2
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
