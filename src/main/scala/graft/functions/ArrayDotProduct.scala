package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product of two float-array columns, summing
  * sequentially in double — bit-identical to the declarative
  * `aggregate(zip_with(a, b, *), 0.0, +)` form (and to the DuckDB
  * oracle) but with no per-row intermediate array allocation and no
  * higher-order-function dispatch: the generated code is one tight
  * loop over the two ArrayData buffers. This is the hot kernel of
  * every similarity-search operator, executed once per candidate pair.
  *
  * Elements must be non-null (embedding vectors are dense); arrays of
  * unequal length dot over the common prefix.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |  ? $a.numElements() : $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "array_dot"
}

object ArrayDotProduct {
  def arrayDot(a: Column, b: Column): Column =
    ColumnExpr.toColumn(ArrayDotProduct(ColumnExpr.expr(a), ColumnExpr.expr(b)))
}
