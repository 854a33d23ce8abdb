package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression:
  * `nfc_normalize(s)` → canonical-composition form of `s`.
  *
  * Exists because text curation needs byte-identical equality across
  * sources before exact dedup / fingerprinting — the same rendered
  * string arrives both precomposed (é = U+00E9) and decomposed
  * (e + U+0301) from real crawls, and every hash-based stage
  * ([[graft.ext.Dedup]] exact, line/span dedup, fingerprints) treats
  * those as different documents unless normalization runs first.
  * Spark has no built-in; a Scala UDF would break whole-stage
  * codegen. DuckDB's `nfc_normalize` is the oracle twin.
  *
  * Fast path: `Normalizer.isNormalized` (a scan, no allocation)
  * returns the input UTF8String untouched — real corpora are almost
  * entirely NFC already, so the common case costs one pass and zero
  * copies; only genuinely decomposed strings pay the String
  * round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-level entry point (Spark 4 Column↔Expression bridge). */
  def nfc_normalize(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfcNormalize(Bridge.expression(s)))
  }
}
