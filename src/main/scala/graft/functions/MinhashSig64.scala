package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The full MinHash signature of a shingle-hash array in ONE pass, as
  * a native expression: `minhash_sig64(sh, k)` → `array<long>` of
  * length `k`, slot `s` = `min over h in sh of xxhash64(h, s)` — the
  * exact values of the composable form
  * `array((0 until k).map(s => array_min(transform(sh, h =>
  * xxhash64(h, lit(s))))))`, bit for bit.
  *
  * Exists because the composable form runs k=64 interpreted
  * higher-order-function passes per document (HOFs have no whole-stage
  * codegen), each allocating a transformed copy of the shingle array
  * before `array_min` scans it — 64 array allocations and 64×|sh|
  * lambda dispatches per document, the dominant map-side CPU of the
  * whole MinHash family at any corpus scale (profiled at sf0.1:
  * the signature+banding stage carried ~30–50 s of task time per
  * gate evaluation). Here each shingle's first-level hash
  * `XXH64.hashLong(h, 42)` is computed once and the k per-slot
  * candidates fold through `XXH64.hashInt(s, ·)` into a preallocated
  * min buffer: one pass, no allocation, one static call from
  * generated code.
  *
  * Spark-equivalence notes (the properties the bit-parity test pins):
  *  - `xxhash64(h, lit(s))` folds seed 42 → hashLong(h) → hashInt(s);
  *  - a NULL shingle contributes `hashInt(s, 42)` (Spark hash
  *    expressions skip null children, leaving the running hash);
  *  - an EMPTY input yields all-null slots (`array_min` of an empty
  *    array is NULL) — unreachable behind [[graft.ext.Dedup
  *    .minhashShingles]]'s `size(sh) > 0` filter but preserved.
  */
case class MinhashSig64(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"minhash_sig64 requires array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashSig64.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSig64.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig64 =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig64"
}

object MinhashSig64 {

  private val Seed = 42L // Spark's XxHash64 expression seed

  /** Called from generated code. */
  def compute(sh: ArrayData, numHashes: Int): ArrayData = {
    val n = sh.numElements()
    val out = new Array[Any](numHashes)
    if (n == 0) return new GenericArrayData(out) // all-null slots
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val v1 = if (sh.isNullAt(i)) Seed else XXH64.hashLong(sh.getLong(i), Seed)
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashInt(s, v1)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    var s = 0
    while (s < numHashes) { out(s) = mins(s); s += 1 }
    new GenericArrayData(out)
  }

  def minhash_sig64(sh: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinhashSig64(Bridge.expression(sh), numHashes))
  }
}
