package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * POSITIONAL n-gram window hashes from a token array: element i is a 64-bit
 * hash of tokens [i, i+n) — `max(0, L−n+1)` elements, empty for docs shorter
 * than n tokens (the `shinglesFromTokens` short-doc convention).
 *
 * This is the hot-loop twin of [[ShingleExpression]] for consumers that
 * only need gram EQUALITY (the repeated-span detector): the declarative
 * form (`transform(sequence(...), i -> xxhash64(concat_ws(" ",
 * slice(toks, i+1, n))))`) materializes every n-token gram STRING — an
 * ~n× copy of the document per row — before hashing it. Here each token
 * is hashed ONCE (Poly64 fold over its code points + the mix64 avalanche,
 * the repo's reproducible family), and each window is a length-n wrapping
 * polynomial fold over those per-token hashes: O(chars + L·n) long ops,
 * zero GRAM-string allocation (one String per token remains — the
 * code-point fold reads through toString). Token-sequence hashing is
 * also strictly more
 * faithful than string hashing — it needs no separator-injectivity
 * argument (moot for whitespace-split tokens, but free here).
 *
 * Hash values are an internal equality key (consumers gate on OUTPUT
 * equality, e.g. span positions), so they intentionally do NOT match
 * xxhash64-of-the-string; collision odds are the usual 64-bit
 * (#grams)²/2⁶⁴.
 */
object GramHash {

  /** Window fold over per-token hashes (eval's helper; the codegen body
    * and Poly64Spec's reference each implement the same fold
    * independently — the spec's independence is the point). */
  private[functions] def foldWindow(th: Array[Long], p: Int, n: Int): Long = {
    var h = Poly64.Seed2
    var j = 0
    while (j < n) { h = h * Poly64.Mult2 + th(p + j); j += 1 }
    h
  }

  case class GramHashes(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1, "gram length must be >= 1")
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_gram_hashes"

    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val cnt = toks.numElements()
      val m = cnt - n + 1
      if (m <= 0) new GenericArrayData(Array.empty[Long])
      else {
        val th = new Array[Long](cnt)
        var i = 0
        while (i < cnt) {
          val t = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8
                  else toks.getUTF8String(i)
          th(i) = Poly64.mix(Poly64.hash(t, Poly64.Seed1, Poly64.Mult1))
          i += 1
        }
        val out = new Array[Long](m)
        var p = 0
        while (p < m) { out(p) = foldWindow(th, p, n); p += 1 }
        new GenericArrayData(out)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val cnt = ctx.freshName("cnt"); val m = ctx.freshName("m")
        val th = ctx.freshName("th"); val out = ctx.freshName("out")
        val i = ctx.freshName("i"); val p = ctx.freshName("p")
        val j = ctx.freshName("j"); val t = ctx.freshName("t")
        val str = ctx.freshName("str"); val h = ctx.freshName("h")
        val g = ctx.freshName("g")
        val u = classOf[UTF8String].getName
        s"""
           |int $cnt = $arr.numElements();
           |int $m = $cnt - $n + 1;
           |long[] $out;
           |if ($m <= 0) { $out = new long[0]; }
           |else {
           |  long[] $th = new long[$cnt];
           |  for (int $i = 0; $i < $cnt; $i++) {
           |    $u $t = $arr.isNullAt($i) ? $u.EMPTY_UTF8 : $arr.getUTF8String($i);
           |    String $str = $t.toString();
           |    ${Poly64.polyGenCode(ctx, str, h, Poly64.Seed1, Poly64.Mult1)}
           |    $h ^= $h >>> 33; $h *= ${Poly64.MixC1}L;
           |    $h ^= $h >>> 29; $h *= ${Poly64.MixC2}L;
           |    $h ^= $h >>> 32;
           |    $th[$i] = $h;
           |  }
           |  $out = new long[$m];
           |  for (int $p = 0; $p < $m; $p++) {
           |    long $g = ${Poly64.Seed2}L;
           |    for (int $j = 0; $j < $n; $j++) $g = $g * ${Poly64.Mult2}L + $th[$p + $j];
           |    $out[$p] = $g;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** array<long> of positional n-gram window hashes of a token array. */
  def gramHashes(tokens: Column, n: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(tokens), n))
}
