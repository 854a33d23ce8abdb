package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All space-joined word `n`-grams of a token array as ONE native
  * pass: `word_gram_strings(tokens, n)` → `array<string>`, one
  * element per consecutive-token window; empty array when the doc is
  * shorter than `n`. Bit-identical to the composable form
  *
  *   when(size(w) >= n, transform(sequence(0, size(w)-n),
  *     i => array_join(slice(w, i+1, n), " "))).otherwise(array())
  *
  * which runs per-gram through interpreted HOFs, allocating a sliced
  * array AND a joined string per window plus a lambda dispatch per
  * element (the [[NgramHash64]] rationale, for the gram-STRING
  * consumers — decontamination, repetition stats, span islands —
  * whose gram identity must stay a string because it joins/aggregates
  * against the DuckDB oracle's own gram strings). Here each window
  * concatenates its UTF8String tokens directly.
  *
  * Null tokens are skipped with their separator — `array_join`'s
  * default semantics — though no caller produces null tokens.
  * [[WordNgrams]] stays the Generator twin for one-row-per-window
  * streaming; this is the array form the pinned-projection sites
  * need (they posexplode or re-use the array).
  */
case class WordGramStrings(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"word_gram_strings requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordGramStrings.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordGramStrings.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramStrings =
    copy(child = newChild)

  override def prettyName: String = "word_gram_strings"
}

object WordGramStrings {

  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. Empty result when fewer than n tokens. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var s = 0
    while (s <= len - n) {
      // array_join semantics: nulls are dropped together with their
      // separator — collect kept parts, interleave single spaces
      var kept = 0
      var j = 0
      while (j < n) {
        if (!tokens.isNullAt(s + j)) kept += 1
        j += 1
      }
      if (kept == 0) out(s) = UTF8String.EMPTY_UTF8
      else {
        val parts = new Array[UTF8String](2 * kept - 1)
        var p = 0
        j = 0
        while (j < n) {
          if (!tokens.isNullAt(s + j)) {
            if (p > 0) { parts(p) = Space; p += 1 }
            parts(p) = tokens.getUTF8String(s + j)
            p += 1
          }
          j += 1
        }
        out(s) = UTF8String.concat(parts: _*)
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  def word_gram_strings(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WordGramStrings(Bridge.expression(tokens), n))
  }
}
