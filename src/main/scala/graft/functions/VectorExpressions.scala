package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(array<double>, array<double>) -> double` — a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why custom: Spark's built-in route for a dot product is
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — higher-order functions,
  * which never enter whole-stage codegen and are evaluated by the
  * interpreter per row (measured 10-50× slower on the ANN queries, and
  * the interpreter re-evaluates nested subtrees per lambda element).
  * This is exactly the "(b) custom Catalyst Expression" tier of the
  * design rules: same semantics, sequential left-to-right accumulation
  * (bit-identical to the HOF formulation and DuckDB's
  * list_dot_product), but a tight codegen'd loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $x.getDouble($i) * $y.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object VectorExpressions {
  /** Idempotently register graft_dot in the session's function registry
    * so `expr("graft_dot(a, b)")` resolves. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)): Expression,
      "internal")
}
