package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * Runtime kernels for the sorted-set intersections in
 * [[GraphSetExpressions]], shared by interpreted eval and generated code
 * (the codegen emits one static call — same JIT'd loop either way).
 *
 * Size-adaptive: comparable sizes take the linear merge walk
 * (O(n+m), branch-predictable); when one side is ≥ [[GallopRatio]]× larger
 * the SMALL side gallops into the big one with a lower-bound binary search
 * from a monotonically advancing floor (O(small · log big)). That bound is
 * what makes a 10⁵-degree hub tractable: a mixed hub/non-hub edge costs
 * O(3 · log d) instead of O(d), so the intersection family's total work on
 * a star-like hub is O(E log d), not O(d²).
 */
object GraphSetOps {

  /** Big/small ratio above which galloping beats the linear walk. */
  final val GallopRatio = 8

  /** First index in [lo, n) with y(idx) ≥ v (n when none). */
  @inline private def lowerBound(y: ArrayData, lo: Int, n: Int, v: Long): Int = {
    var l = lo; var h = n
    while (l < h) {
      val mid = (l + h) >>> 1
      if (y.getLong(mid) < v) l = mid + 1 else h = mid
    }
    l
  }

  /** |x ∩ y| over sorted distinct long arrays. */
  def intersectCount(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 || m == 0) return 0
    if (n > m) return intersectCount(y, x)
    // here n ≤ m: x is the small side
    var c = 0
    if (m >= GallopRatio.toLong * n) {
      var i = 0; var lo = 0
      while (i < n && lo < m) {
        val v = x.getLong(i)
        val l = lowerBound(y, lo, m, v)
        if (l < m && y.getLong(l) == v) { c += 1; lo = l + 1 } else lo = l
        i += 1
      }
    } else {
      var i = 0; var j = 0
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  /** x ∩ y as a sorted long array (inputs sorted distinct). */
  def intersect(x: ArrayData, y: ArrayData): ArrayData = {
    val n = x.numElements(); val m = y.numElements()
    if (n > m) return intersect(y, x)
    val out = new Array[Long](n)
    var c = 0
    if (n > 0 && m >= GallopRatio.toLong * n) {
      var i = 0; var lo = 0
      while (i < n && lo < m) {
        val v = x.getLong(i)
        val l = lowerBound(y, lo, m, v)
        if (l < m && y.getLong(l) == v) { out(c) = v; c += 1; lo = l + 1 }
        else lo = l
        i += 1
      }
    } else {
      var i = 0; var j = 0
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { out(c) = xv; c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, c))
  }

  /** Σ ws(i) over positions i of x with x(i) ∈ y (ws aligned with x);
    * null when the intersection is empty. Gallops whichever side is the
    * small one — when x is big, y's elements are searched in x and the
    * FOUND position indexes ws. */
  def intersectWeightSum(x: ArrayData, ws: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements(); val m = y.numElements()
    var c = 0; var s = 0.0
    if (n > 0 && m >= GallopRatio.toLong * n) {
      var i = 0; var lo = 0
      while (i < n && lo < m) {
        val v = x.getLong(i)
        val l = lowerBound(y, lo, m, v)
        if (l < m && y.getLong(l) == v) { s += ws.getDouble(i); c += 1; lo = l + 1 }
        else lo = l
        i += 1
      }
    } else if (m > 0 && n >= GallopRatio.toLong * m) {
      var j = 0; var lo = 0
      while (j < m && lo < n) {
        val v = y.getLong(j)
        val l = lowerBound(x, lo, n, v)
        if (l < n && x.getLong(l) == v) { s += ws.getDouble(l); c += 1; lo = l + 1 }
        else lo = l
        j += 1
      }
    } else {
      var i = 0; var j = 0
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { s += ws.getDouble(i); c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    if (c == 0) null else java.lang.Double.valueOf(s)
  }
}
