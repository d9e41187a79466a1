package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash kernel: the 32-bit token-vote signature in one compiled
  * per-row pass.
  *
  * Replaces the relational vote pipeline — explode(tokens) x
  * explode(0..31) -> groupBy(doc_id, bit).sum -> groupBy(doc_id) — which
  * shuffled 32 rows PER TOKEN OCCURRENCE: a corpus-sized x32 exchange, the
  * one scale-killer in the dedup suite. Here the signature is
  * embarrassingly parallel map work (same design as [[MinHashSignature]]);
  * the only shuffle left in SimHash near-dup is the narrow pigeonhole
  * band-key self-join.
  *
  * Bit-parity contract with the replaced formulation (and the DuckDB
  * oracle, pinned by SimHashSpec):
  *   h(token) = left fold over CODE POINTS of (acc*131 + cp) mod (2^31-1)
  *     — exactly `aggregate(split(t, ""), 0L, (acc,c) => (acc*131+ascii(c)) % P)`
  *     (Spark `ascii` returns the code point for all of BMP and beyond) and
  *     DuckDB `list_reduce(... ord(c) ...)`;
  *   vote_j  = sum over token OCCURRENCES (multiset, not set) of
  *     ((h >> j) & 1) * 2 - 1;
  *   bit j set iff vote_j > 0.
  * All intermediates < 2^39, exact in 64-bit arithmetic.
  */
object SimHashUtil {
  val P: Long = 2147483647L

  /** Polynomial rolling hash over code points — bit-identical to
    * TextFunctions.polyHash (the built-ins column form). Empty token -> 0,
    * matching `aggregate(split("", ""), ...)` = ascii("") = 0.
    */
  def polyHash(t: UTF8String): Long = {
    val s = t.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** 32-bit SimHash of a token array. Null token slots contribute no
    * votes — exactly the vote-pipeline semantics, where a null token
    * hashes to null and its 32 vote rows are dropped. Returns null when
    * NOTHING voted (empty array / all-null slots): the vote pipeline's
    * groupBy would emit no row at all for such a document, and null is
    * the scalar analog of that absence. (split() never produces null or
    * empty arrays, so both cases are caller-built-array territory.)
    */
  def signature(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](32)
    var voted = false
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        voted = true
        val h = polyHash(tokens.getUTF8String(i))
        var j = 0
        while (j < 32) {
          votes(j) += (((h >>> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    if (!voted) return null
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

final case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(toks: Any): Any = {
    val s = SimHashUtil.signature(toks.asInstanceOf[ArrayData])
    if (s == null) null else s.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val s = ctx.freshName("sig")
      // Loop body in compiled Scala (static call) — inside whole-stage
      // codegen with zero interpreter dispatch, like MinHashUtil.
      s"""
         |java.lang.Long $s = graft.functions.SimHashUtil.signature($toks);
         |if ($s == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $s.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}
