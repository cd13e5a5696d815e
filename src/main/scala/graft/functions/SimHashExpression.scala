package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * 64-bit SimHash from an array of per-token 64-bit hashes, in ONE pass:
 * for every token hash, each of the 64 bit-counters moves ±1 by the sign of
 * that bit; bit b of the result is set iff counter b ≥ 0 (ties → set —
 * identical to Dedup.simHashFromHashes, the declarative reference
 * formulation, which `Poly64Spec` pins this against).
 *
 * The declarative form nests aggregate() HOFs 64×|tokens| deep — Spark
 * higher-order functions run interpreted (closure dispatch + boxing per
 * element), which made SimHash the slowest stage of the dedup bench. This
 * expression is O(64·|tokens|) compiled adds inside whole-stage codegen.
 */
object SimHashExpression {

  case class SimHash64(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      val n = hs.numElements()
      var j = 0
      while (j < n) {
        val h = hs.getLong(j)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        j += 1
      }
      var sh = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) >= 0) sh |= (1L << b)
        b += 1
      }
      sh
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, hs => {
        val counts = ctx.freshName("counts"); val n = ctx.freshName("n")
        val j = ctx.freshName("j"); val b = ctx.freshName("b")
        val h = ctx.freshName("h"); val sh = ctx.freshName("sh")
        s"""
           |int[] $counts = new int[64];
           |int $n = $hs.numElements();
           |for (int $j = 0; $j < $n; $j++) {
           |  long $h = $hs.getLong($j);
           |  for (int $b = 0; $b < 64; $b++) {
           |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
           |  }
           |}
           |long $sh = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($counts[$b] >= 0) $sh |= (1L << $b);
           |}
           |${ev.value} = $sh;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def simHash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))
}
