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
 *
 * `poly = true` swaps the base hashes for the Poly64 Rabin family
 * (h1 = poly(seed1, mult1), h2 = poly(seed2, mult2) | 1) — identical slot
 * derivation, but the base hash is reproducible in ANSI-ish SQL so the whole
 * MinHash pipeline can be verified against an external-engine oracle.
 */
object MinHashExpression {

  case class MinHashSignature(child: Expression, numHashes: Int,
                              poly: Boolean = false)
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
        val h1 =
          if (poly) Poly64.hash(s, Poly64.Seed1, Poly64.Mult1)
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h2 =
          (if (poly) Poly64.hash(s, Poly64.Seed2, Poly64.Mult2)
           else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 7919L)) | 1L
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
        val hashes =
          if (poly) {
            val str = ctx.freshName("str")
            val p1 = ctx.freshName("p1"); val p2 = ctx.freshName("p2")
            s"""
               |java.lang.String $str = $s.toString();
               |${Poly64.polyGenCode(ctx, str, p1, Poly64.Seed1, Poly64.Mult1)}
               |${Poly64.polyGenCode(ctx, str, p2, Poly64.Seed2, Poly64.Mult2)}
               |long $h1 = $p1;
               |long $h2 = $p2 | 1L;
             """.stripMargin
          } else
            s"""
               |long $h1 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
               |long $h2 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 7919L) | 1L;
             """.stripMargin
        s"""
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |int $n = $arr.numElements();
           |for (int $j = 0; $j < $n; $j++) {
           |  UTF8String $s = $arr.getUTF8String($j);
           |  $hashes
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

  def minHashSignature(shingles: Column, numHashes: Int, poly: Boolean = false): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes, poly))

  /**
   * Banded LSH bucket keys from a MinHash signature: bucket(b) = base-31
   * Horner fold of the band's slots seeded with b+1, with Long wraparound
   * (mod 2^64). One pass over the signature, no per-band slice allocation —
   * and wraparound multiplication is intentional here, which ANSI-mode SQL
   * arithmetic (Spark 4 default) would reject in a HOF formulation.
   * Slot values are uniform 64-bit already, so the fold only needs
   * injectivity-ish mixing; it is reproducible in the DuckDB oracle as a
   * HUGEINT mod-2^64 weighted sum.
   */
  case class BandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(ArrayType(org.apache.spark.sql.types.LongType))
    override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_band_buckets"

    override protected def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var acc = (b + 1).toLong
        var j = 0
        while (j < rowsPerBand) {
          acc = acc * 31L + sig.getLong(b * rowsPerBand + j)
          j += 1
        }
        out(b) = acc
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, sig => {
        val out = ctx.freshName("out"); val b = ctx.freshName("b")
        val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
        s"""
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $acc = $b + 1;
           |  for (int $j = 0; $j < $rowsPerBand; $j++) {
           |    $acc = $acc * 31L + $sig.getLong($b * $rowsPerBand + $j);
           |  }
           |  $out[$b] = $acc;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def bandBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(BandBuckets(Bridge.expression(sig), bands, rowsPerBand))
}
