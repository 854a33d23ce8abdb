package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Index (0-based, first winner) of the maximum of an
  * `array<double>` — one native pass.
  *
  * The composable form,
  * `array_position(transform(xs, x -> x = array_max(xs)), true)`,
  * re-evaluates `array_max` for EVERY element inside the interpreted
  * lambda (no common-subexpression elimination in higher-order
  * functions): O(k²) boxed comparisons per row. At quantizer sizes
  * (k = 256 over a 50k corpus) that argmax dominated the whole IVF
  * build; this expression is the O(k) loop it should be, inside
  * whole-stage codegen.
  */
case class ArgMaxDouble(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"arg_max_double requires array<double>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    ArgMaxDouble.argMax(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ArgMaxDouble.argMax($a)")

  override protected def withNewChildInternal(newChild: Expression): ArgMaxDouble =
    copy(child = newChild)

  override def prettyName: String = "arg_max_double"
}

object ArgMaxDouble {

  /** First index of the max (called from generated code); -1 on
    * empty. NaN never wins (`v > NaN` is false for every v, so a NaN
    * in slot 0 would otherwise capture the argmax forever — e.g. one
    * zero-norm embedding poisoning a whole quantizer); an all-NaN
    * array returns 0.
    */
  def argMax(a: ArrayData): Int = {
    val n = a.numElements()
    if (n == 0) return -1
    var best = 0
    var bestV = a.getDouble(0)
    var i = 1
    while (i < n) {
      val v = a.getDouble(i)
      if (v > bestV || (java.lang.Double.isNaN(bestV) && !java.lang.Double.isNaN(v))) {
        bestV = v; best = i
      }
      i += 1
    }
    best
  }

  def arg_max_double(a: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ArgMaxDouble(Bridge.expression(a)))
  }
}
