package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns — a custom Catalyst
  * `Expression` with `doGenCode` (the (b)-tier of SURVEY's custom-op
  * cascade).
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: higher-order
  * functions are interpreted — every pair allocates a boxed-double array
  * and folds with boxing. At 200k pairs × 64 dims that's ~25M transient
  * objects per query; the resulting GC pressure made similarity timings
  * swing 2s↔28s run-to-run. This expression compiles to a primitive loop
  * over the unsafe array data: zero allocation, stable timings, and the
  * SAME left-to-right accumulation order, so results stay bit-identical
  * to the HOF form (and to the DuckDB oracle).
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
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
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** One-pass Johnson-Lindenstrauss projection — the Expression-shaped
  * twin of `Similarity.jlProject`'s relational form. The relational
  * form pays a |rows|·dIn·dOut explode/aggregate fan-out (51M
  * intermediate rows at sf0.1 for dOut=16) because DECIMAL-exact sums
  * need an aggregation; this expression folds the same arithmetic
  * per row in one pass with zero data movement.
  *
  * Bit-parity with the relational form is engineered, not hoped for:
  * each term replays Spark's double→DECIMAL(27,10) cast exactly
  * (BigDecimal.valueOf — the Double.toString route — then HALF_UP to
  * scale 10; HALF_UP is symmetric, so quantize-then-sign equals
  * sign-then-quantize), terms sum EXACTLY as scale-10 longs
  * (Math.addExact, with a BigDecimal fallback if a pathological input
  * overflows), and the final decimal→double + round(_, 6) steps reuse
  * the same BigDecimal conventions. The sign matrix is md5-derived per
  * (salt, j, i) — identical to the relational form and the oracle —
  * and cached per input dimension. CodegenFallback tier: the per-row
  * loop is already primitive long arithmetic.
  */
case class JlProjectExpr(child: Expression, dOut: Int, salt: String)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def signs(dIn: Int): Array[Array[Byte]] =
    signCache.computeIfAbsent(dIn, _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dOut) { j =>
        Array.tabulate(dIn) { i =>
          md.reset()
          val h = md.digest(s"$salt|$j|$i".getBytes("UTF-8"))
          // first hex char < '8' ⇔ top nibble < 8 ⇔ top bit clear
          if (((h(0) >> 4) & 0x0f) < 8) 1.toByte else (-1).toByte
        }
      }
    })

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dIn = arr.numElements()
    val sg = signs(dIn)
    // quantize each element once: Spark's cast(double as decimal(27,10))
    val q = new Array[Long](dIn)
    var overflow = false
    var i = 0
    while (i < dIn && !overflow) {
      val bd = java.math.BigDecimal.valueOf(arr.getDouble(i))
        .setScale(10, java.math.RoundingMode.HALF_UP)
      try q(i) = bd.movePointRight(10).longValueExact()
      catch { case _: ArithmeticException => overflow = true }
      i += 1
    }
    val out = new Array[Double](dOut)
    if (!overflow) {
      var j = 0
      var jOverflow = false
      while (j < dOut && !jOverflow) {
        var s = 0L
        val row = sg(j)
        var k = 0
        try {
          while (k < dIn) {
            s = Math.addExact(s, if (row(k) > 0) q(k) else -q(k))
            k += 1
          }
          out(j) = roundedDouble(java.math.BigDecimal.valueOf(s, 10))
        } catch { case _: ArithmeticException => jOverflow = true }
        j += 1
      }
      if (!jOverflow)
        return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
    // pathological magnitudes: full-BigDecimal path, same quantization
    var j = 0
    while (j < dOut) {
      var acc = java.math.BigDecimal.ZERO
      val row = sg(j)
      var k = 0
      while (k < dIn) {
        val term = java.math.BigDecimal.valueOf(arr.getDouble(k))
          .setScale(10, java.math.RoundingMode.HALF_UP)
        acc = if (row(k) > 0) acc.add(term) else acc.subtract(term)
        k += 1
      }
      out(j) = roundedDouble(acc)
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** decimal → double, then round(_, 6) — Spark's exact conventions. */
  private def roundedDouble(sum: java.math.BigDecimal): Double =
    java.math.BigDecimal.valueOf(sum.doubleValue())
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def withNewChildInternal(newChild: Expression): JlProjectExpr =
    copy(child = newChild)
  override def prettyName: String = "jl_project"
}

object VectorExpressions {
  /** Column surface for [[DotProductExpr]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column surface for [[JlProjectExpr]]: array<double> in, projected
    * array<double> out (same values as `Similarity.jlProject`, row-local). */
  def jlProject(vec: Column, dOut: Int, salt: String = "jl"): Column =
    GraftColumnBridge.column(JlProjectExpr(
      GraftColumnBridge.expression(vec), dOut, salt))
}
