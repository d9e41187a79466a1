package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-16 Hilbert curve index (the rot-and-walk form of Warren,
  * Hacker's Delight §16 / the classic d2xy inverse): 16 sequential
  * (mask, rotate, accumulate) steps — inherently a loop, so a compiled
  * kernel rather than a Column expression tree (each step reads the
  * previous x AND y twice; composing Columns would blow up 4^16).
  * Inputs are masked to 16 bits (the caller quantizes wider domains
  * down, exactly like [[graft.operators.Layout.zValue]]'s contract).
  */
object HilbertUtil {
  def index(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Native codegen'd 2-D Hilbert index — the locality-preserving
  * alternative to the Morton/Z-value ([[graft.operators.Layout.zValue]]):
  * Hilbert has no Z-order "seams" (adjacent curve positions are ALWAYS
  * grid neighbors), so range-partitioning by it clusters 2-D range
  * queries into strictly fewer files at the same file count — the
  * standard layout upgrade for heavily range-scanned fact tables.
  */
final case class HilbertIndex2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert2 expects (bigint, bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.index(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertUtil.index($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)
}
