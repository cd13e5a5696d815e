package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expressions for dense-vector math over array<double>
 * columns — the KNN / embedding-dedup hot path.
 *
 * Spark's higher-order functions (aggregate/zip_with) are interpreted
 * per-element with closure invocation and boxing; these expressions compile
 * to a tight primitive loop inside whole-stage codegen, which matters when
 * the inner loop runs N·Q times (brute-force KNN) or per candidate pair
 * (LSH verification). Interpreted eval is provided for completeness
 * (codegen fallback paths, unit tests).
 */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over two array<double> columns (length = min of the two). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** √(Σ aᵢ²) of an array<double> column. */
  case class L2Norm(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_l2norm"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0; val n = x.numElements()
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $a.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Squared L2 distance Σ (aᵢ−bᵢ)² — IVF cell assignment hot loop. */
  case class SquaredDistance(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_sqdist"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = $a.getDouble($i) - $b.getDouble($i);
           |  $s += $d * $d;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ---- Column API ---------------------------------------------------------

  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def l2norm(a: Column): Column = c(L2Norm(e(a)))
  def squaredDistance(a: Column, b: Column): Column = c(SquaredDistance(e(a), e(b)))
}
