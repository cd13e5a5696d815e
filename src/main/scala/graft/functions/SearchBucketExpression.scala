package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/**
 * Bucket id by binary search over driver-literal sorted boundaries:
 * `searchBucket(v, bounds)` = the number of boundaries strictly LESS THAN
 * `v` (the left insertion point), i.e. the contiguous-range bucket `v`
 * falls into when the boundaries split the key space.
 *
 * This is the O(log parts) replacement for the O(parts) chained
 * `when(v > b, 1) + …` comparison ladder `packBins` used for its
 * driver-literal range bucketing: identical semantics (a value equal to a
 * boundary lands LEFT of it under both forms), but at cluster-typical
 * partition counts (2000+) a 2000-term expression chain is a real
 * planning- and per-row cost where this stays one codegen'd loop over a
 * shared constant array.
 */
object SearchBucket {

  // bounds is a Seq, not an Array: case-class equality on an Array is
  // reference identity, which would defeat Catalyst semanticEquals
  // (subexpression elimination / ReuseExchange between separately built
  // but equal instances); the codegen-side long[] is derived once below.
  case class LongSearchBucket(child: Expression, bounds: Seq[Long])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(bounds.nonEmpty, "bounds must be non-empty")
    require((1 until bounds.length).forall(i => bounds(i - 1) < bounds(i)),
      "bounds must be strictly increasing")

    override def inputTypes: Seq[Bridge.AbstractType] = Seq(LongType)
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_search_bucket"

    @transient private lazy val arr: Array[Long] = bounds.toArray

    private def lowerBound(v: Long): Int = {
      var lo = 0
      var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < v) lo = mid + 1 else hi = mid
      }
      lo
    }

    override protected def nullSafeEval(input: Any): Any =
      lowerBound(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("bounds", arr, "long[]")
        val lo = ctx.freshName("lo")
        val hi = ctx.freshName("hi")
        val mid = ctx.freshName("mid")
        s"""
           |int $lo = 0, $hi = $ref.length;
           |while ($lo < $hi) {
           |  int $mid = ($lo + $hi) >>> 1;
           |  if ($ref[$mid] < $v) $lo = $mid + 1; else $hi = $mid;
           |}
           |${ev.value} = $lo;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Number of `bounds` strictly below `c` (left insertion point). `bounds`
    * must be sorted strictly increasing and non-empty. */
  def searchBucket(c: Column, bounds: Seq[Long]): Column =
    Bridge.column(LongSearchBucket(Bridge.expression(c), bounds))
}
