package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for dot(a, b) over `array<float>` columns.
  *
  * The UDF version (VectorKernels.dotUdf) pays a row-boundary conversion
  * per call: ArrayData → Array[Float] for both sides, then a boxed Double
  * back. ANN scoring calls it once per candidate pair — the dominant
  * per-row work in v1/v3/v5 — so this expression reads the unsafe array
  * buffers in place and participates in whole-stage codegen (no lambda
  * dispatch, no allocation).
  *
  * Arithmetic contract (oracle-critical): elementwise float→double casts,
  * strict left-to-right accumulation over min(len(a), len(b)) — the exact
  * IEEE expression tree of VectorKernels.dot and the DuckDB list_reduce
  * fragment, so hashes stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot requires array<float> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: dot(a, b) as a codegen'd native expression. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProduct(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  /** norm(a) = sqrt(dot(a, a)) without leaving codegen. */
  def norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(a, a))
}
