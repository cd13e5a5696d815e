package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/**
 * Native Catalyst expressions over SORTED-ASCENDING distinct long arrays —
 * the neighborhood-intersection hot path shared by triangle counting, local
 * clustering coefficient, Adamic-Adar and Jaccard edge similarity.
 *
 * `array_intersect` builds a hash set per call and runs interpreted; on a
 * co-occurrence graph the intersection executes once per EDGE, so a tight
 * loop inside whole-stage codegen is the difference between seconds and
 * milliseconds. The loops live in [[GraphSetOps]] (one static call from the
 * generated code): linear merge walk for comparable sizes, galloping binary
 * search when one side is ≥8× larger — a mixed hub/non-hub edge costs
 * O(small · log big), which is what keeps 10⁵-degree hubs tractable.
 * Inputs come from `array_sort(collect_set(...))` — sorted, distinct.
 */
object GraphSetExpressions {

  /** |a ∩ b| for two sorted distinct array<long> columns (merge walk). */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_sorted_intersect_count"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      GraphSetOps.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.GraphSetOps.intersectCount($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** a ∩ b as a sorted array<long> (merge walk; both inputs sorted distinct). */
  case class SortedIntersect(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_sorted_intersect"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      GraphSetOps.intersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.GraphSetOps.intersect($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Σ wsA[i] over positions i where nbrsA[i] ∈ nbrsB — per-edge Adamic-Adar
    * in one merge walk (nbrsA aligned with wsA, both nbr arrays sorted
    * distinct). Returns NULL when the intersection is empty, so callers can
    * drop no-common-neighbor edges without a separate membership pass. */
  case class SortedIntersectWeightSum(first: Expression, second: Expression,
                                      third: Expression)
      extends TernaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(LongType), ArrayType(DoubleType), ArrayType(LongType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_sorted_intersect_wsum"

    override protected def nullSafeEval(a: Any, w: Any, b: Any): Any = {
      val r = GraphSetOps.intersectWeightSum(a.asInstanceOf[ArrayData],
        w.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (r == null) null else r.doubleValue()
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, w, b) => {
        val r = ctx.freshName("r")
        s"""
           |java.lang.Double $r = graft.functions.GraphSetOps.intersectWeightSum($a, $w, $b);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                   t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** All ordered pairs (a[i], a[j]) with i < j from one array<long> — the
    * co-occurrence pair expansion (items per order/basket/document →
    * co-purchase edges). The declarative nested-HOF form
    * (`flatten(transform(ps, (x,i) -> transform(slice(ps,i+2,n), ...)))`)
    * allocates a slice + lambda frames per element, interpreted; this is one
    * codegen'd k·(k-1)/2 loop. Output order: lexicographic by (i, j). */
  case class ArrayPairs(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dst", LongType, nullable = false))),
      containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_array_pairs"

    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = new Array[Any]((n.toLong * (n - 1) / 2).toInt)
      var c = 0; var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          out(c) = org.apache.spark.sql.catalyst.InternalRow(a.getLong(i), a.getLong(j))
          c += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val i = ctx.freshName("i"); val j = ctx.freshName("j"); val c = ctx.freshName("c")
        val row = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
        s"""
           |int $n = $a.numElements();
           |Object[] $out = new Object[$n * ($n - 1) / 2];
           |int $c = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  for (int $j = $i + 1; $j < $n; $j++) {
           |    $out[$c++] = new $row(new Object[] {
           |      (Object) $a.getLong($i), (Object) $a.getLong($j) });
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** All cross pairs (x, y) with x ∈ left, y ∈ right — the BIG-order arm of
    * the salted co-occurrence expansion: a mega-basket's sorted item array is
    * chunked, chunk pairs are spread over the cluster by a hash repartition,
    * and each cross-chunk row expands |xs|·|ys| pairs here (contiguous slices
    * of a sorted array, so every x < y holds by construction — callers must
    * pass slices in ascending chunk order). One codegen'd loop, same contract
    * as ArrayPairs. */
  case class ArrayCrossPairs(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dst", LongType, nullable = false))),
      containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_array_cross_pairs"

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val xs = l.asInstanceOf[ArrayData]; val ys = r.asInstanceOf[ArrayData]
      val n = xs.numElements(); val m = ys.numElements()
      val out = new Array[Any](n * m)
      var c = 0; var i = 0
      while (i < n) {
        var j = 0
        while (j < m) {
          out(c) = org.apache.spark.sql.catalyst.InternalRow(xs.getLong(i), ys.getLong(j))
          c += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val out = ctx.freshName("out"); val c = ctx.freshName("c")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val row = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
        s"""
           |int $n = $l.numElements(), $m = $r.numElements();
           |Object[] $out = new Object[$n * $m];
           |int $c = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  for (int $j = 0; $j < $m; $j++) {
           |    $out[$c++] = new $row(new Object[] {
           |      (Object) $l.getLong($i), (Object) $r.getLong($j) });
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ---- Column API ---------------------------------------------------------

  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def arrayPairs(a: Column): Column = c(ArrayPairs(e(a)))
  def arrayCrossPairs(xs: Column, ys: Column): Column = c(ArrayCrossPairs(e(xs), e(ys)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    c(SortedIntersectCount(e(a), e(b)))
  def sortedIntersect(a: Column, b: Column): Column =
    c(SortedIntersect(e(a), e(b)))
  def sortedIntersectWeightSum(nbrsA: Column, wsA: Column, nbrsB: Column): Column =
    c(SortedIntersectWeightSum(e(nbrsA), e(wsA), e(nbrsB)))
}
