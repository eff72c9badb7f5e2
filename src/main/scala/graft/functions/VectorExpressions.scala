package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen vector kernels (SURVEY.md §2.11 similarity ops).
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is semantically right but interpreted: LambdaFunction expressions
  * don't participate in whole-stage codegen, and the zip materializes an
  * intermediate array per row — on an O(n²) knn join that allocation is
  * the bottleneck. These expressions generate a tight fused
  * multiply-add loop over the two `ArrayData`s (no intermediate array,
  * no virtual calls) and keep the operator inside WholeStageCodegen.
  *
  * Summation order is strictly left-to-right, bit-identical to both the
  * HOF fold and the oracle's `list_reduce` — required for cross-engine
  * hash equality of rounded cosine outputs.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** Java source for the per-element accumulation into `s` given element
    * expressions `x` and `y`. */
  protected def kernel(x: String, y: String): String

  protected def accumulate(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    accumulate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  ${kernel(s"$a.getDouble($i)", s"$b.getDouble($i)")
             .replace("ACC", s)}
        |}
        |${ev.value} = $s;
      """.stripMargin
    })
}

/** Σ aᵢ·bᵢ over two double arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"
  protected def kernel(x: String, y: String): String = s"ACC += $x * $y;"
  protected def accumulate(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — squared L2 distance. */
case class SquaredL2(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_l2sq"
  protected def kernel(x: String, y: String): String =
    s"final double d = $x - $y; ACC += d * d;"
  protected def accumulate(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Codegen dot product of two ArrayType(Double) columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen squared L2 distance of two ArrayType(Double) columns. */
  def squaredL2(a: Column, b: Column): Column =
    Bridge.column(SquaredL2(Bridge.expression(a), Bridge.expression(b)))
}
