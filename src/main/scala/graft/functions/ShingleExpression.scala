package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word n-gram shingles from a token array, as one codegen'd pass.
 *
 * The declarative formulation (`array_distinct(filter(transform(sequence(...),
 * i -> concat_ws(" ", slice(toks, i+1, n))), len > 0))`) runs through
 * interpreted higher-order functions — per position it allocates a slice
 * array, a lambda frame, and an intermediate array per HOF layer. This
 * expression emits the same shingle set (first-occurrence order, empty for
 * docs shorter than n tokens, empty-string shingles dropped — concat_ws null
 * semantics included) in a single tight loop over the token array.
 */
object ShingleExpression {

  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1, "shingle length must be >= 1")
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_shingles"

    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val cnt = toks.numElements()
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val sep = UTF8String.fromString(" ")
      var i = 0
      while (i + n <= cnt) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        val s = UTF8String.concatWs(sep, parts: _*)
        if (s.numBytes > 0) seen.add(s)
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val cnt = ctx.freshName("cnt")
        val seen = ctx.freshName("seen")
        val parts = ctx.freshName("parts")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val u = classOf[UTF8String].getName
        s"""
           |int $cnt = $arr.numElements();
           |java.util.LinkedHashSet<$u> $seen = new java.util.LinkedHashSet<$u>();
           |for (int $i = 0; $i + $n <= $cnt; $i++) {
           |  $u[] $parts = new $u[$n];
           |  for (int $j = 0; $j < $n; $j++) $parts[$j] = $arr.getUTF8String($i + $j);
           |  $u $s = $u.concatWs($u.fromString(" "), $parts);
           |  if ($s.numBytes() > 0) $seen.add($s);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($seen.toArray());
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def wordShingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))
}
