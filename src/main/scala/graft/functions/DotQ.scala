package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer dot product of two `array<long>`
  * columns with whole-stage codegen.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0, _+_)`) allocates
  * an intermediate array per row and walks generic ArrayData lambdas; this
  * expression emits a single fused multiply-add loop instead — the
  * preference-order step (b) of the builder contract: a custom Expression
  * before any UDF. Semantics match the composable form for equal-length
  * non-null arrays (the only shape [[VectorFns.qvec]] produces); length
  * mismatch truncates to the shorter side.
  */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotq expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dotq"
}

object DotQ {
  /** Register `dotq` in the session's function registry (idempotent) so it
    * is reachable from the public Column API via `call_function`. */
  def register(spark: SparkSession): Unit =
    // delegates to the shared definition list so the lazy in-session
    // path and the spark.sql.extensions injector cannot drift
    FunctionDefs.registerAll(spark)

  def dotq(a: Column, b: Column): Column = call_function("dotq", a, b)
}
