package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

  /** Random-hyperplane LSH bucket: `bits` sign bits, one per Rademacher (±1)
    * hyperplane. Component i of hyperplane b is ±1 by bit 16 of
    * (b·1000003 + i)·2654435761 — the exact integer-mix semantics of the
    * declarative formulation (Ann.hyperplaneBucketHof, the spec oracle), so
    * the external SQL oracle reproduces it with plain 64-bit arithmetic.
    *
    * The declarative form stacks `bits` interpreted zip_with+aggregate HOF
    * pairs per row (closure dispatch + boxing per element per bit); this is
    * one O(bits·|v|) primitive loop inside whole-stage codegen — the same
    * disease/cure as SimHash64. */
  case class HyperplaneBucket(child: Expression, bits: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_hyperplane_bucket"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var bucket = 0L; var b = 0
      while (b < bits) {
        var s = 0.0; var i = 0
        while (i < n) {
          val m = (b * 1000003L + i) * 2654435761L
          s += x.getDouble(i) * (if (((m >> 16) % 2L) == 0L) 1.0 else -1.0)
          i += 1
        }
        if (s >= 0) bucket |= (1L << b)
        b += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val b = ctx.freshName("b")
        val i = ctx.freshName("i"); val s = ctx.freshName("s")
        val m = ctx.freshName("m"); val bucket = ctx.freshName("bucket")
        s"""
           |int $n = $a.numElements();
           |long $bucket = 0L;
           |for (int $b = 0; $b < $bits; $b++) {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    long $m = ($b * 1000003L + $i) * 2654435761L;
           |    $s += $a.getDouble($i) * (((($m >> 16) % 2L) == 0L) ? 1.0 : -1.0);
           |  }
           |  if ($s >= 0) $bucket |= (1L << $b);
           |}
           |${ev.value} = $bucket;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column API ---------------------------------------------------------

  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def l2norm(a: Column): Column = c(L2Norm(e(a)))
  def squaredDistance(a: Column, b: Column): Column = c(SquaredDistance(e(a), e(b)))
  def hyperplaneBucket(v: Column, bits: Int): Column = c(HyperplaneBucket(e(v), bits))
}
