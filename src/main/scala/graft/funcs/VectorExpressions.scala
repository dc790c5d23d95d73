package graft.funcs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over `array<float>` embedding columns, accumulated
  * in double in element order (bit-identical to the sequential
  * `aggregate(zip_with(...))` formulation it replaces, but staying inside
  * whole-stage codegen: the higher-order-function version allocates a zipped
  * array and interprets two lambdas per pair, which dominated the brute-force
  * similarity join's runtime).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
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
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  private val Name = "graft_dot_f"

  /** Register the expression in the session's function registry (idempotent);
    * the registry + `call_function` is the public route from Column to a
    * custom Catalyst expression. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => DotProductFloat(exprs.head, exprs(1)), "built-in")

  /** Column API for the codegen'd float-array dot product; requires
    * [[register]] on the active session (Similarity does this on entry). */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(Name, a, b)
}
