package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Codegen'd dot product over two array<double> columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is a
  * higher-order function — interpreted (CodegenFallback), allocating a
  * lambda frame per element. For similarity search the dot product IS the
  * hot loop (|corpus| × k × dim multiply-adds), so this is the SURVEY
  * §4.3(b) case: a native Catalyst `Expression` with `doGenCode`, keeping
  * the whole operator inside whole-stage codegen.
  *
  * Semantics match the built-in exactly: sequential left-fold double
  * accumulation (bit-identical results — the DuckDB oracle reproduces it
  * too). NULL if either array is NULL; array length mismatch uses the
  * shorter (inputs here are fixed-dim embeddings).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column API for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))
}
