package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass MinHash signature over a shingle array.
 *
 * The naive formulation (`transform(seq(0,k-1), i -> array_min(transform(
 * shingles, s -> xxhash64(i, s))))`) hashes every shingle k times through
 * interpreted HOFs — O(k·|S|) hash calls with closure dispatch. This
 * expression computes TWO xxh64 hashes per shingle and derives all k slots
 * as h1 + i·h2 (the standard Carter–Wegman construction for min-wise
 * families), maintaining the k running minima in one tight loop:
 * O(|S|) hashes + O(k·|S|) adds, fully codegen'd.
 */
object MinHashExpression {

  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_minhash"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        val s = arr.getUTF8String(j)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 7919L) | 1L
        var i = 0
        var h = h1
        while (i < numHashes) {
          if (h < mins(i)) mins(i) = h
          h += h2
          i += 1
        }
        j += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val mins = ctx.freshName("mins")
        val i = ctx.freshName("i"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val h1 = ctx.freshName("h1")
        val h2 = ctx.freshName("h2"); val h = ctx.freshName("h")
        val xxh = classOf[XXH64].getName.stripSuffix("$")
        s"""
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |int $n = $arr.numElements();
           |for (int $j = 0; $j < $n; $j++) {
           |  UTF8String $s = $arr.getUTF8String($j);
           |  long $h1 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
           |  long $h2 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 7919L) | 1L;
           |  long $h = $h1;
           |  for (int $i = 0; $i < $numHashes; $i++) {
           |    if ($h < $mins[$i]) $mins[$i] = $h;
           |    $h += $h2;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minHashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))
}
