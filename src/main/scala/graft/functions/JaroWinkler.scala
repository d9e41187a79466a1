package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Jaro–Winkler kernel (one compiled method for both interpreted
  * eval and codegen).
  *
  * Semantics pinned BIT-FOR-BIT against DuckDB's
  * `jaro_winkler_similarity` (fuzzed 20k random pairs, exact double
  * equality — see JaroWinklerSpec):
  *  - either side empty → 0.0 (INCLUDING both empty — DuckDB's choice);
  *  - match window = max(len)/2 − 1 (floored at 0), greedy left-to-right
  *    flagging, transpositions halved;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3 in exactly that IEEE operation
  *    order;
  *  - Winkler boost ONLY when jaro > 0.7: + prefix·0.1·(1−jaro) with the
  *    common prefix capped at 4.
  * Comparison is per Java char (BMP/ASCII contract — the ER surface
  * normalizes with [[NfcNormalize]] first).
  */
object JaroWinklerUtil {
  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(l1, l2))
      var broke = false
      i = 0
      while (i < pMax && !broke) {
        if (s1.charAt(i) == s2.charAt(i)) p += 1 else broke = true
        i += 1
      }
      jaro = jaro + p * 0.1 * (1.0 - jaro)
    }
    jaro
  }
}

/** Native codegen'd Jaro–Winkler string similarity — the fuzzy-match
  * scoring kernel the entity-resolution surface was missing beside edit
  * distance (PassJoin) and Jaccard (PPJoin): JW is the standard
  * Fellegi–Sunter comparator for SHORT IDENTITY STRINGS (names,
  * addresses) where a shared prefix outweighs a mid-string typo.
  */
final case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerUtil.jw($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
