package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Coalesce, Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SWAR (SIMD-within-a-register) pointwise byte max over 8 lanes of a long.
  *
  * PRECONDITION: every byte lane holds a value in [0, 127] (high bit clear).
  * HLL ranks are ≤ 64 − p + 1 ≤ 61 for p ≥ 4, so packed register lanes
  * always qualify. With 7-bit lanes, `(x | H) − y` can never borrow across
  * a lane boundary (each lane of `x | H` is ≥ 0x80 ≥ the matching lane of
  * y), so the high bit of each result lane is 1 exactly when x_i ≥ y_i;
  * `(d >>> 7) * 0xFF` widens those indicator bits to full-lane masks
  * (lanes of d >>> 7 are 0 or 1, so the multiply never carries), and the
  * final blend selects the larger lane. Plain Java long arithmetic — the
  * wraparound the trick relies on — independent of SQL ANSI mode.
  */
object RegOps {
  private final val H = 0x8080808080808080L
  def bytewiseMax(x: Long, y: Long): Long = {
    val d = ((x | H) - y) & H
    val m = (d >>> 7) * 0xFFL
    (x & m) | (y & ~m)
  }
}

/** Pointwise byte-lane max of two longs (see [[RegOps.bytewiseMax]] for the
  * 7-bit-lane precondition). Codegen-friendly: one static call, no boxing. */
case class BytewiseMax(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bytewise_max"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    RegOps.bytewiseMax(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.RegOps.bytewiseMax($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Pointwise byte-lane max AGGREGATE over packed-long register columns — the
  * HLL union-merge as a DeclarativeAggregate with a single fixed-width
  * LongType buffer, so Spark plans it as a true HashAggregate (codegen,
  * UnsafeFixedWidthAggregationMap, graceful sort fallback) instead of the
  * ObjectHashAggregate a typed-Aggregator UDAF gets, which abandons its hash
  * map after `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128!) distinct keys per task and sort-aggregates everything —
  * the measured 58 GB spill / default-heap OOM on the scale-22 HyperBall
  * drill. NULL input merges as the empty register block (all-zero lanes). */
case class BytewiseMaxAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bytewise_max_agg"

  private lazy val bmax = AttributeReference("bmax", LongType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = bmax :: Nil
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] =
    Seq(BytewiseMax(bmax, Coalesce(Seq(child, Literal(0L)))))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(BytewiseMax(bmax.left, bmax.right))
  override lazy val evaluateExpression: Expression = bmax

  override protected def withNewChildInternal(newChild: Expression): BytewiseMaxAgg =
    copy(child = newChild)
}

object RegMaxFunctions {
  /** Column API for [[BytewiseMax]]. */
  def bytewiseMax(a: Column, b: Column): Column =
    Bridge.column(BytewiseMax(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[BytewiseMaxAgg]] — `agg(bytewiseMaxAgg($"r0"), ...)`. */
  def bytewiseMaxAgg(c: Column): Column =
    Bridge.column(BytewiseMaxAgg(Bridge.expression(c)).toAggregateExpression())
}
