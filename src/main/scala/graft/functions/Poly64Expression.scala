package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 64-bit polynomial (Rabin-style) string hash: a left fold over Unicode code
 * points, `h := h·mult + cp` with Long wraparound (i.e. mod 2^64).
 *
 * This is the cross-engine-reproducible member of graft's hash families: any
 * engine with 64-bit modular integer arithmetic can rebuild it exactly (the
 * DuckDB correctness oracles do, with HUGEINT mod-2^64 `list_reduce` folds),
 * unlike xxhash64 whose avalanche rounds are impractical to express in SQL.
 * Rabin fingerprints are the original MinHash hash family (Broder, "On the
 * resemblance and containment of documents", 1997), so using this for the
 * dedup pipelines is standard practice, not a concession: mixing comes from
 * the large odd multiplier — any input of ≥2 code points wraps 2^64 and
 * spreads over the full range. xxhash64 remains the default family where
 * cross-engine reproducibility isn't needed.
 */
object Poly64 {
  /** Primary family member: FNV-64 prime multiplier. */
  val Seed1 = 1125899906842597L
  val Mult1 = 1099511628211L
  /** Second, independent member: PCG64 LCG multiplier. */
  val Seed2 = 2065775093L
  val Mult2 = 6364136223846793005L

  def hash(s: UTF8String, seed: Long, mult: Long): Long = {
    val str = s.toString
    var h = seed
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = h * mult + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** Xorshift–multiply avalanche constants (public domain families: the
    * PCG64 LCG multiplier and Marsaglia's xorshift64* multiplier). */
  val MixC1 = 6364136223846793005L
  val MixC2 = 2685821657736338717L

  /** 64-bit avalanche finalizer. Poly64 alone is NOT an avalanche hash:
    * over short decimal-ish strings the high bits live on a coarse lattice
    * (each varying character contributes `d · mult^k` from a ≤ 10-value
    * set), which breaks leading-zero statistics (HLL ranks). Three
    * xorshift/multiply rounds restore per-bit diffusion while staying
    * exactly reproducible in oracle SQL (unsigned shift = `// 2^s`,
    * bitwise xor, wrap-around multiply mod 2^64 — both constants < 2^63 so
    * the HUGEINT product stays in range). */
  def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= MixC1
    h ^= h >>> 29; h *= MixC2
    h ^= h >>> 32
    h
  }

  case class Mix64(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(LongType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_mix64"

    override protected def nullSafeEval(input: Any): Any =
      mix(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, h0 => {
        val h = ctx.freshName("h")
        s"""
           |long $h = $h0;
           |$h ^= $h >>> 33; $h *= ${MixC1}L;
           |$h ^= $h >>> 29; $h *= ${MixC2}L;
           |$h ^= $h >>> 32;
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def mix64(c: Column): Column = Bridge.column(Mix64(Bridge.expression(c)))

  /** Wrapping Carter–Wegman combine `a + i·b` on Java long semantics (mod
    * 2^64) — Column `+`/`*` would throw under ANSI overflow checking, but
    * hash-family arithmetic WANTS the wraparound. */
  case class WrapMulAdd(first: Expression, second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] =
      Seq(LongType, LongType, LongType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_wrap_mul_add"

    override protected def nullSafeEval(a: Any, i: Any, b: Any): Any =
      a.asInstanceOf[Long] + i.asInstanceOf[Long] * b.asInstanceOf[Long]

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, i, b) => s"${ev.value} = $a + $i * $b;")

    override protected def withNewChildrenInternal(
        a: Expression, i: Expression, b: Expression): Expression =
      copy(first = a, second = i, third = b)
  }

  /** `a + i·b` with Long wraparound (never ANSI-throws). */
  def wrapMulAdd(a: Column, i: Column, b: Column): Column =
    Bridge.column(WrapMulAdd(Bridge.expression(a), Bridge.expression(i),
      Bridge.expression(b)))

  /** Generated-Java fragment computing the same fold (shared with
    * MinHashExpression's poly family codegen). `str` must be a String local;
    * declares and assigns the long local `h`. */
  private[functions] def polyGenCode(ctx: CodegenContext, str: String, h: String,
                                 seed: Long, mult: Long): String = {
    val i = ctx.freshName("i"); val cp = ctx.freshName("cp")
    s"""
       |long $h = ${seed}L;
       |int $i = 0;
       |while ($i < $str.length()) {
       |  int $cp = $str.codePointAt($i);
       |  $h = $h * ${mult}L + $cp;
       |  $i += java.lang.Character.charCount($cp);
       |}
     """.stripMargin
  }

  case class Poly64Hash(child: Expression, seed: Long, mult: Long)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_poly64"

    override protected def nullSafeEval(input: Any): Any =
      hash(input.asInstanceOf[UTF8String], seed, mult)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val str = ctx.freshName("str"); val h = ctx.freshName("h")
        s"""
           |java.lang.String $str = $s.toString();
           |${polyGenCode(ctx, str, h, seed, mult)}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def poly64(c: Column, seed: Long = Seed1, mult: Long = Mult1): Column =
    Bridge.column(Poly64Hash(Bridge.expression(c), seed, mult))

  /**
   * Winnowing-style document fingerprints in one pass: the `maxOut` smallest
   * DISTINCT Poly64 hashes over sliding k-code-point windows, ascending
   * (signed order — same as `array_sort` / DuckDB BIGINT sort).
   *
   * Each window hash equals the plain Poly64 fold of that substring, but the
   * loop maintains it with the classic Rabin ROLLING update
   * `h' = (h − seed·mult^k − cp_out·mult^(k−1))·mult + cp_in + seed·mult^k`
   * (all mod 2^64), so cost is O(len), not O(len·k). Input shorter than k
   * code points yields the fold of the whole string (the `substr(s, i, k)`
   * window semantics); empty input yields [seed].
   */
  def rollingFingerprints(s: UTF8String, k: Int, maxOut: Int,
                          seed: Long, mult: Long): GenericArrayData = {
    val str = s.toString
    val len = str.length
    var cnt = 0
    var ci = 0
    while (ci < len) { ci += Character.charCount(str.codePointAt(ci)); cnt += 1 }
    val cps = new Array[Int](cnt)
    ci = 0; var i = 0
    while (ci < len) {
      val cp = str.codePointAt(ci); cps(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    val ts = new java.util.TreeSet[java.lang.Long]()
    def add(h: Long): Unit = { ts.add(h); if (ts.size > maxOut) ts.pollLast() }
    if (cnt <= k) {
      var h = seed; var j = 0
      while (j < cnt) { h = h * mult + cps(j); j += 1 }
      add(h)
    } else {
      var b = 1L; var t = 0
      while (t < k - 1) { b *= mult; t += 1 } // mult^(k-1), wrapped
      val a = b * mult * seed                 // seed·mult^k, wrapped
      var h = seed; var j = 0
      while (j < k) { h = h * mult + cps(j); j += 1 }
      add(h)
      var w = 0
      while (w + k < cnt) {
        h = (h - a - cps(w) * b) * mult + cps(w + k) + a
        add(h); w += 1
      }
    }
    val out = new Array[Long](ts.size)
    val it = ts.iterator; var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  case class RollingFingerprintsExpr(child: Expression, k: Int, maxOut: Int,
                                     seed: Long, mult: Long)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k >= 1, "window length must be >= 1")
    require(maxOut >= 1, "fingerprint count must be >= 1")
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_rolling_fps"

    override protected def nullSafeEval(input: Any): Any =
      rollingFingerprints(input.asInstanceOf[UTF8String], k, maxOut, seed, mult)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, s =>
        s"graft.functions.Poly64.rollingFingerprints($s, $k, $maxOut, ${seed}L, ${mult}L)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column form of [[rollingFingerprints]] (array<bigint>, ≤ maxOut ascending). */
  def rollingFps(c: Column, k: Int = 8, maxOut: Int = 16,
                 seed: Long = Seed1, mult: Long = Mult1): Column =
    Bridge.column(RollingFingerprintsExpr(Bridge.expression(c), k, maxOut, seed, mult))

  /**
   * Content-defined chunk lengths (Rabin-style CDC): scan code points left
   * to right maintaining the same rolling Poly64 window hash as
   * [[rollingFingerprints]]; cut AFTER position i when the window ending at
   * i satisfies `(hash & (2^maskBits − 1)) == 0` and the running chunk has
   * at least `minLen` code points; force a cut at `maxLen` regardless.
   * Returns the chunk lengths in order (they sum to the code-point count);
   * empty input → empty array.
   *
   * Why CDC instead of fixed windows: boundaries depend only on local
   * content, so an insertion/deletion perturbs ONLY the chunk it lands in —
   * the chunk stream resynchronizes within one window, which is what makes
   * chunk-level dedup stable across document revisions (fixed-size chunking
   * shifts every downstream chunk). Expected chunk length ≈ 2^maskBits.
   */
  def cdcChunkLengths(s: UTF8String, k: Int, maskBits: Int,
                      minLen: Int, maxLen: Int): GenericArrayData = {
    val str = s.toString
    val len = str.length
    var cnt = 0
    var ci = 0
    while (ci < len) { ci += Character.charCount(str.codePointAt(ci)); cnt += 1 }
    val cps = new Array[Int](cnt)
    ci = 0; var i = 0
    while (ci < len) {
      val cp = str.codePointAt(ci); cps(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    val mask = (1L << maskBits) - 1
    var b = 1L; var t = 0
    while (t < k - 1) { b *= Mult1; t += 1 } // mult^(k-1), wrapped
    val a = b * Mult1 * Seed1                // seed·mult^k, wrapped
    val lens = new scala.collection.mutable.ArrayBuffer[Long]()
    var h = Seed1
    var lastCut = -1
    var end = 0
    while (end < cnt) {
      if (end < k) h = h * Mult1 + cps(end) // growing first window
      else h = (h - a - cps(end - k) * b) * Mult1 + cps(end) + a
      val curLen = end - lastCut
      if (curLen >= maxLen ||
          (end >= k - 1 && (h & mask) == 0 && curLen >= minLen)) {
        lens += curLen.toLong
        lastCut = end
      }
      end += 1
    }
    if (cnt - 1 > lastCut) lens += (cnt - 1 - lastCut).toLong
    new GenericArrayData(lens.toArray)
  }

  case class CdcChunkLengthsExpr(child: Expression, k: Int, maskBits: Int,
                                 minLen: Int, maxLen: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k >= 1, "window length must be >= 1")
    require(maskBits >= 1 && maskBits <= 62, "maskBits must be in [1, 62]")
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_cdc_chunks"

    override protected def nullSafeEval(input: Any): Any =
      cdcChunkLengths(input.asInstanceOf[UTF8String], k, maskBits, minLen, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, s =>
        s"graft.functions.Poly64.cdcChunkLengths($s, $k, $maskBits, $minLen, $maxLen)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column form of [[cdcChunkLengths]] (array<bigint> chunk lengths). */
  def cdcChunks(c: Column, k: Int = 8, maskBits: Int = 6,
                minLen: Int = 1, maxLen: Int = Int.MaxValue): Column =
    Bridge.column(CdcChunkLengthsExpr(Bridge.expression(c), k, maskBits, minLen, maxLen))

  /**
   * [[cdcChunkLengths]] plus each chunk's CONTENT fingerprint (the plain
   * Poly64 fold of the chunk's code points — identical to `poly64` of the
   * chunk substring, maintained incrementally in the same single scan):
   * array of (chunk_len, chunk_fp) structs. Two co-identified chunks have
   * equal fingerprints iff their text hashes equal — the join key for
   * chunk-level dedup across document revisions.
   */
  def cdcChunkInfo(s: UTF8String, k: Int, maskBits: Int,
                   minLen: Int, maxLen: Int): GenericArrayData = {
    val str = s.toString
    val len = str.length
    var cnt = 0
    var ci = 0
    while (ci < len) { ci += Character.charCount(str.codePointAt(ci)); cnt += 1 }
    val cps = new Array[Int](cnt)
    ci = 0; var i = 0
    while (ci < len) {
      val cp = str.codePointAt(ci); cps(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    val mask = (1L << maskBits) - 1
    var b = 1L; var t = 0
    while (t < k - 1) { b *= Mult1; t += 1 }
    val a = b * Mult1 * Seed1
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow]()
    var h = Seed1
    var chunkH = Seed1
    var lastCut = -1
    var end = 0
    while (end < cnt) {
      if (end < k) h = h * Mult1 + cps(end)
      else h = (h - a - cps(end - k) * b) * Mult1 + cps(end) + a
      chunkH = chunkH * Mult1 + cps(end)
      val curLen = end - lastCut
      if (curLen >= maxLen ||
          (end >= k - 1 && (h & mask) == 0 && curLen >= minLen)) {
        rows += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](curLen.toLong, chunkH))
        chunkH = Seed1
        lastCut = end
      }
      end += 1
    }
    if (cnt - 1 > lastCut)
      rows += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any]((cnt - 1 - lastCut).toLong, chunkH))
    new GenericArrayData(rows.toArray[Any])
  }

  case class CdcChunkInfoExpr(child: Expression, k: Int, maskBits: Int,
                              minLen: Int, maxLen: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k >= 1, "window length must be >= 1")
    require(maskBits >= 1 && maskBits <= 62, "maskBits must be in [1, 62]")
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("chunk_len", LongType, nullable = false),
        StructField("chunk_fp", LongType, nullable = false))),
      containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_cdc_chunk_info"

    override protected def nullSafeEval(input: Any): Any =
      cdcChunkInfo(input.asInstanceOf[UTF8String], k, maskBits, minLen, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, s =>
        s"graft.functions.Poly64.cdcChunkInfo($s, $k, $maskBits, $minLen, $maxLen)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column form of [[cdcChunkInfo]]: array<struct<chunk_len, chunk_fp>>. */
  def cdcChunkInfoCol(c: Column, k: Int = 8, maskBits: Int = 6,
                      minLen: Int = 1, maxLen: Int = Int.MaxValue): Column =
    Bridge.column(CdcChunkInfoExpr(Bridge.expression(c), k, maskBits, minLen, maxLen))
}
