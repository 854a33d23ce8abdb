package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit hashes of all word `n`-grams of a token array, as a native
  * expression: `ngram_hash64(tokens)` → `array<long>`, one hash per
  * consecutive-token window.
  *
  * Exists because the composable form —
  * `transform(sequence(...), i -> xxhash64(concat_ws(' ', slice(...))))`
  * — runs per-gram through interpreted higher-order functions (Spark
  * HOFs have no whole-stage codegen) and builds a gram STRING per
  * window; measured 9.4 s for 5 000 docs at sf0.1. Here each token is
  * hashed once and windows combine the token hashes in a tight loop:
  * no string allocation, one static call from generated code.
  *
  * Gram identity: distinct n-grams map to distinct hashes up to 64-bit
  * collisions (chained xxHash64 of the per-token hashes, order-
  * sensitive). Downstream Jaccard math only needs equality structure,
  * so any injective-up-to-collision encoding is exact.
  */
case class NgramHash64(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"ngram_hash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHash64.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHash64.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHash64 =
    copy(child = newChild)

  override def prettyName: String = "ngram_hash64"
}

object NgramHash64 {

  /** Called from generated code. Empty result when fewer than n tokens. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // hash each token once
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = if (tokens.isNullAt(i)) 0L
        else SimHash64.hashUtf8(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    var s = 0
    while (s <= len - n) {
      var acc = 0x27d4eb2f165667c5L // xxHash64 prime seed
      var j = 0
      while (j < n) {
        acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(s + j), acc)
        j += 1
      }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  def ngram_hash64(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NgramHash64(Bridge.expression(tokens), n))
  }
}
