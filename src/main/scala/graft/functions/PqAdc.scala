package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance computation for product-quantized vectors:
  * `pq_adc(codes, table)` = Σ_s `table[s][codes[s]]` — the inner loop
  * of a PQ scan, one lookup-add per subspace instead of a full
  * d-dimensional dot product.
  *
  * `codes` is a vector's `array<int>` subspace code word; `table` is
  * the per-query `array<array<double>>` of precomputed sub-distances
  * (dot products or squared norms, m × k_sub doubles — tiny,
  * broadcast on the query side). Native expression for the same
  * reason as [[CentroidScores]]: the composable
  * `aggregate(sequence(...), ...)` form runs interpreted per row, and
  * the PQ scan IS the hot loop of the compressed search path.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<int>, array<array<double>>), got $l / $r")
    }

  override def nullSafeEval(codes: Any, table: Any): Any =
    PqAdc.adc(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.PqAdc.adc($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

object PqAdc {

  /** Σ_s table[s][codes[s]] (called from generated code). */
  def adc(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += table.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }

  def pq_adc(codes: Column, table: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(table)))
  }
}
