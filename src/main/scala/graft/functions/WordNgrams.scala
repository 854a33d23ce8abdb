package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram table function: `word_ngrams(tokens, n)` generates one
  * output row per consecutive n-token window — the UDTF surface
  * (SURVEY.md §2.10) as a native Catalyst `Generator`, the same node
  * family as `explode`/`posexplode`: the analyzer plans it into
  * `Generate`, so it composes with LATERAL VIEW from SQL text and
  * with projections from the DataFrame API.
  *
  * A Generator rather than a `transform`+`explode` HOF chain because
  * it materializes NO intermediate array: each input row streams its
  * windows straight into the Generate iterator — for a 10k-token
  * document the HOF form allocates a 10k-element array of
  * concatenated strings per row before exploding it; this emits one
  * UTF8String per window on demand. Per-row output is bounded by
  * token count, and the generate happens map-side before any
  * shuffle, so the op is scan-shaped at any corpus size.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"word_ngrams: n must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires array<string>, got $other")
  }

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements() - n + 1
      if (m <= 0) Iterator.empty
      else Iterator.tabulate(m) { i =>
        val parts = new Array[UTF8String](2 * n - 1)
        var j = 0
        while (j < n) {
          parts(2 * j) =
            if (arr.isNullAt(i + j)) UTF8String.EMPTY_UTF8
            else arr.getUTF8String(i + j)
          if (j < n - 1) parts(2 * j + 1) = WordNgrams.Space
          j += 1
        }
        InternalRow(UTF8String.concat(parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  /** Column-level entry point (Spark 4 Column↔Expression bridge). */
  def wordNgrams(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WordNgrams(Bridge.expression(tokens), n))
  }
}
