package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization as a native expression — the
  * [[NfcNormalize]] discipline extended with COMPATIBILITY
  * decomposition (SentencePiece's default normalizer): ligatures
  * (ﬁ → fi), full-width forms (２３ → 23), squared/circled signs and
  * width variants all fold onto their plain equivalents before
  * canonical composition, so exact dedup / fingerprinting treats
  * presentation variants of one string as one document.
  *
  * Oracle note: DuckDB ships `nfc_normalize` but NO NFKC
  * (environment-checked round 11), so the gate verifies through the
  * aux-primitive discipline (the xxhash64 convention): the engine
  * materializes the per-CODEPOINT compatibility decomposition map
  * (`nfkd_map` aux — the trusted primitive, known-answer-spec'd
  * against published Unicode data points), and DuckDB re-runs
  * everything around it — the per-document recursive fold and the
  * canonical recomposition, as `nfc_normalize(string_agg(nfkd))`.
  * That equality is exact by UAX#15: NFKC(s) = NFC(NFKD(s)), NFKD is
  * the concatenation of per-codepoint recursive compatibility
  * decompositions up to canonical reordering, and NFC reorders
  * before composing, so the ordering difference cannot show.
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"nfkc_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfkcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfkcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfkc_normalize"
}

/** NFD (CANONICAL decomposition, no recomposition) — the BERT basic
  * tokenizer's accent-strip substrate (`_run_strip_accents`: NFD,
  * then drop the combining marks): `é` splits to `e` + U+0301, and a
  * following `regexp_replace(…, "\\p{Mn}", "")` leaves the base
  * letter. Canonical (not compatibility) decomposition is what BERT
  * specifies — ligatures and width variants survive, only accents
  * fold. The DuckDB oracle twin is `strip_accents` (utf8proc), which
  * performs the same decompose-and-drop for canonical marks. */
case class NfdNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"nfd_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfkcNormalize.computeNfd(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfkcNormalize.computeNfd($c)")

  override protected def withNewChildInternal(newChild: Expression): NfdNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfd_normalize"
}

/** NFKD (compatibility decomposition, no recomposition) — exists for
  * the `nfkd_map` aux: the per-codepoint decompositions the DuckDB
  * oracle folds and recomposes itself. Not a gate operator. */
case class NfkdNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"nfkd_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfkcNormalize.computeNfkd(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfkcNormalize.computeNfkd($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkdNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfkd_normalize"
}

object NfkcNormalize {

  /** Called from generated code. Same zero-copy fast path as
    * [[NfcNormalize.compute]]: already-NFKC input (virtually all real
    * corpus text) returns the input UTF8String untouched. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }

  /** Called from generated code. */
  def computeNfd(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFD)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD))
  }

  /** Called from generated code. */
  def computeNfkd(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKD)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKD))
  }

  /** Column-level entry points (Spark 4 Column↔Expression bridge). */
  def nfkc_normalize(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfkcNormalize(Bridge.expression(s)))
  }

  def nfkd_normalize(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfkdNormalize(Bridge.expression(s)))
  }

  def nfd_normalize(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfdNormalize(Bridge.expression(s)))
  }
}
