package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash over a token array as a native Catalyst expression.
  *
  * `simhash64(tokens)` → 64-bit signature whose Hamming distance
  * approximates the cosine distance between the token multisets —
  * the classic near-duplicate fingerprint (Charikar 2002; used at
  * web scale for crawl dedup).
  *
  * Algorithm: each token is hashed to 64 bits (xxHash64 over its
  * UTF-8 bytes — the same hash family as Spark's `xxhash64`); each
  * bit position accumulates +1/−1 per token depending on the bit;
  * the signature takes the sign of each accumulator.
  *
  * A native `Expression` with `doGenCode` rather than a Scala UDF:
  * stays inside whole-stage codegen (no Row boxing, no serialization
  * of a closure per executor), which at 100 TB is the difference
  * between a pure scan-speed map and a UDF bottleneck.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = hashUtf8(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** xxHash64 over the string's UTF-8 bytes, seed 42 — same family
    * Spark's `xxhash64` builtin uses.
    */
  def hashUtf8(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L)

  /** Column-level entry point (Spark 4 Column↔Expression bridge). */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  }

  /** Hamming distance between two 64-bit signatures, as a Column. */
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }
}
