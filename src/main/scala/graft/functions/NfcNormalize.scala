package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the text
  * canonicalization step a multilingual pipeline runs before hashing or
  * fingerprinting (composed vs decomposed accents produce different md5s
  * for the SAME visible text, silently splitting dedup groups).
  *
  * Implemented as a codegen'd expression (not a UDF) so it stays inside
  * whole-stage codegen with no serialization boundary: the generated code
  * calls `java.text.Normalizer` directly. The fast path checks
  * `isNormalized` first — the overwhelmingly common case (ASCII and
  * already-composed text) returns the input UTF8String with no
  * allocation, so at 100 TB the pass prices as a scan, not a rewrite.
  *
  * Cross-engine contract: Java's Normalizer and DuckDB's
  * `nfc_normalize` both implement Unicode Standard Annex #15 NFC, so
  * the oracle comparison is byte-exact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
