package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a native codegen'd expression — the
  * text-canonicalization step of a crawl pipeline ("é" composed vs
  * e+combining-acute must fingerprint identically), kept inside
  * whole-stage codegen so it composes with scans and fingerprinting at
  * no plan cost.
  *
  * Fast paths dodge the UTF8String→String round-trip where possible:
  * pure-ASCII input (the overwhelming majority of web text — checked
  * bytewise, zero allocation) is NFC by construction and returned as-is;
  * non-ASCII input already in NFC (the next most common case) returns
  * the original buffer after `Normalizer.isNormalized`'s scan-only
  * check. Only genuinely denormalized strings allocate.
  *
  * Mirrors DuckDB's `nfc_normalize` (same Unicode canonical composition)
  * for the oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
}
