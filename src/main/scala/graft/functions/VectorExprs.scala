package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd float-vector dot product: replaces the
  * `aggregate(zip_with(...))` higher-order-function chain (which
  * allocates an intermediate array and walks an expression tree per
  * element) with a tight primitive loop over the two ArrayData buffers.
  * Left-to-right double accumulation — the same order as the DuckDB
  * oracle's list_dot_product, so results stay bit-identical.
  *
  * SURVEY.md §4 "custom Catalyst work": this is the one hot-path scalar
  * the built-ins can't express efficiently (12.5M pairs × 64 dims in the
  * brute-force dedup baseline made it the top cost in BENCH).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorExprs {

  /** Register `dot_f` in the session's function registry (idempotent;
    * Column↔Expression bridging is private in Spark 4, so SQL-name
    * registration is the supported route — same mechanism
    * GraftExtensions uses for spark.sql.extensions users). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs.head, exprs(1)), "built-in")

  /** dot_f(a, b): double dot product of two ArrayType(FloatType) columns
    * (names must be resolvable column references). */
  def dotF(a: String, b: String): Column = expr(s"dot_f($a, $b)")

  /** L2 norm of a float-vector column. */
  def normF(a: String): Column =
    org.apache.spark.sql.functions.sqrt(expr(s"dot_f($a, $a)"))
}
