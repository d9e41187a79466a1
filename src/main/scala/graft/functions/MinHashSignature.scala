package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared MinHash kernel: one pass over a token array, computing the min of
  * each of `numHashes` affine permutations of the word-trigram hashes.
  *
  * Duplicated trigrams cannot change a minimum, so no distinct pass is
  * needed — the signature over the trigram MULTISET equals the signature
  * over the SET, which is what the LSH banding theory assumes.
  *
  * Hash family (kept identical to the exploded groupBy formulation this
  * kernel replaces, so band candidates are reproducible):
  *   h    = abs(xxhash64(trigram, seed=42)) % P
  *   m_k  = min over trigrams of (h*(2k+1) + (k*12345+7)) % P
  * with P = 2^31 - 1; h < 2^31 and k < 64 keep every intermediate below
  * 2^38 — exact in 64-bit arithmetic.
  */
object MinHashUtil {
  val P: Long = 2147483647L
  private val Space = UTF8String.fromString(" ")

  /** Signature of the token array's word-trigram set, or null when the
    * array has fewer than 3 tokens (no trigram exists — callers filter on
    * size >= 3, mirroring the gramRows guard).
    */
  def signature(tokens: ArrayData, numHashes: Int): Array[Long] = {
    val n = tokens.numElements()
    if (n < 3) return null
    val mins = Array.fill(numHashes)(P)
    var i = 0
    while (i <= n - 3) {
      // concatWs skips nulls — same behavior as the concat_ws(" ", ...)
      // column formulation (split() never yields null tokens in practice).
      val g = UTF8String.concatWs(Space,
        tokens.getUTF8String(i), tokens.getUTF8String(i + 1),
        tokens.getUTF8String(i + 2))
      // math.abs, not &Long.MaxValue — must equal Spark's abs(xxhash64(g))
      // so signatures reproduce the exploded-aggregate formulation bit for
      // bit (pinned by MinHashSpec).
      val h = math.abs(XxHash64Function.hash(g, StringType, 42L)) % P
      var k = 0
      while (k < numHashes) {
        val v = (h * (2 * k + 1) + (k * 12345 + 7)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    mins
  }

  /** LSH band keys of the signature: `numHashes / bandRows` strings, each
    * "b:m_m_m_m" (band index prefix prevents cross-band key collisions, so
    * callers join on the key alone). Null when no trigram exists.
    */
  def bandKeys(tokens: ArrayData, numHashes: Int, bandRows: Int): Array[UTF8String] = {
    val mins = signature(tokens, numHashes)
    if (mins == null) return null
    val numBands = numHashes / bandRows
    val keys = new Array[UTF8String](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder(24)
      sb.append(b).append(':')
      var r = 0
      while (r < bandRows) {
        if (r > 0) sb.append('_')
        sb.append(mins(b * bandRows + r))
        r += 1
      }
      keys(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    keys
  }
}

/** Native MinHash signature over a token-array column: `numHashes` mins in
  * one compiled per-row loop — no per-gram explode, no corpus-wide shuffle,
  * no interpreted higher-order lambdas. The signature stage of MinHash-LSH
  * becomes embarrassingly parallel map work, which is the property that
  * makes it viable at 100 TB (the only shuffle left in the LSH pipeline is
  * the narrow band-key self-join).
  *
  * Replaces: explode(trigrams) -> xxhash64 -> groupBy(doc).agg(64 mins),
  * which shuffled (doc_id, h) for every gram in the corpus.
  */
final case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Defined (non-null) only when a trigram exists: needs >= 3 tokens.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(toks: Any): Any = {
    val m = MinHashUtil.signature(toks.asInstanceOf[ArrayData], numHashes)
    if (m == null) null else new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val m = ctx.freshName("mins")
      // The loop body lives in compiled Scala (MinHashUtil.signature, a
      // static call) — inside whole-stage codegen, zero interpreter
      // dispatch, without emitting the kernel as a Java string.
      s"""
         |long[] $m = graft.functions.MinHashUtil.signature($toks, $numHashes);
         |if ($m == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($m);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** LSH band keys in one native pass: MinHash signature + banding fused, so
  * the plan explodes a small array<string> instead of carrying a 64-long
  * signature through 64 element_at's and 16 concat_ws's (that wide Generate
  * expression dominated both codegen-compile time and steady-state cost of
  * the LSH candidate stage).
  */
final case class MinHashBands(child: Expression, numHashes: Int, bandRows: Int)
    extends UnaryExpression {

  require(numHashes > 0 && bandRows > 0 && numHashes % bandRows == 0,
    "numHashes must be a positive multiple of bandRows")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(toks: Any): Any = {
    val keys = MinHashUtil.bandKeys(
      toks.asInstanceOf[ArrayData], numHashes, bandRows)
    if (keys == null) null
    else new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val k = ctx.freshName("keys")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $k =
         |  graft.functions.MinHashUtil.bandKeys($toks, $numHashes, $bandRows);
         |if ($k == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $k);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
