package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization of a string column —
  * the multilingual-pipeline prerequisite the ASCII-only operators skip:
  * the same visible text arrives from different sources as different code
  * point sequences (é as U+00E9 vs e + U+0301), so WITHOUT canonical
  * normalization exact dedup, n-gram fingerprints, vocabulary counts, and
  * equality joins all silently treat equal text as distinct. Run this at
  * ingest, before any hashing operator.
  *
  * Java's `java.text.Normalizer` implements Unicode Normalization Form C
  * per UAX #15 — the same normative algorithm DuckDB's `nfc_normalize`
  * implements, which is what makes the operator oracle-checkable: both
  * engines must produce identical code point sequences, not just
  * "equivalent" text.
  *
  * Pure map work: zero shuffle, stays in whole-stage codegen (the body is
  * a library call; the codegen win is staying inside the fused loop
  * rather than falling back to interpreted eval). An ASCII fast path
  * skips the normalizer entirely — `Normalizer.isNormalized` is O(n) over
  * a quick-check table and almost always answers yes on real corpora.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.NfcNormalize.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
