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

/** Codegen'd random-hyperplane LSH signature over an `array<float>` vector:
  * `bits` integer projections onto deterministic LCG pseudo-random planes,
  * packed into one long (bit p = sign of projection p). Components are
  * quantized to `floor(x · 10^6)` and plane coefficients are
  * `((p·1000003 + d) · 2654435761) mod 2000003 − 1000001`, so every
  * projection is an exact 64-bit integer sum — order-independent,
  * bit-identical to the declarative `aggregate(zip_with(...))` formulation
  * AND to the ANSI-SQL mirror the DuckDB oracle runs. The fused loop
  * replaces `bits` interpreted higher-order-function folds per row (the
  * dominant cost of the LSH queries) with one codegen'd O(dims · bits) pass.
  */
case class LshSignatureFloat(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val acc = new Array[Long](bits)
    var d = 0
    while (d < n) {
      val q = math.floor(v.getFloat(d).toDouble * 1000000.0).toLong
      var p = 0
      while (p < bits) {
        val c = (p * 1000003L + d) * 2654435761L % 2000003L - 1000001L
        acc(p) += q * c
        p += 1
      }
      d += 1
    }
    var sig = 0L
    var p = 0
    while (p < bits) { if (acc(p) >= 0) sig |= (1L << p); p += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val c = ctx.freshName("c")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |long[] $acc = new long[$bits];
         |for (int $d = 0; $d < $n; $d++) {
         |  long $q = (long) java.lang.Math.floor(((double) $v.getFloat($d)) * 1000000.0);
         |  for (int $p = 0; $p < $bits; $p++) {
         |    long $c = ($p * 1000003L + $d) * 2654435761L % 2000003L - 1000001L;
         |    $acc[$p] += $q * $c;
         |  }
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < $bits; $p++) {
         |  if ($acc[$p] >= 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignatureFloat =
    copy(child = newChild)
}

object VectorFunctions {

  private val Name = "graft_dot_f"
  private val SigName = "graft_lsh_sig"

  /** Register the expressions in the session's function registry (idempotent);
    * the registry + `call_function` is the public route from Column to a
    * custom Catalyst expression. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      Name, exprs => DotProductFloat(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      SigName, exprs => exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Int, _) =>
          LshSignatureFloat(exprs.head, b)
        case other =>
          throw new IllegalArgumentException(s"bits must be an int literal, got $other")
      }, "built-in")
  }

  /** Column API for the codegen'd float-array dot product; requires
    * [[register]] on the active session (Similarity does this on entry). */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(Name, a, b)

  /** Column API for the codegen'd LSH signature; requires [[register]]. */
  def lshSig(v: Column, bits: Int): Column =
    org.apache.spark.sql.functions.call_function(SigName, v,
      org.apache.spark.sql.functions.lit(bits))
}
