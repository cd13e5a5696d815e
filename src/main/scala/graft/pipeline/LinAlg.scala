package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/**
 * Distributed linear algebra over an embedding column — the PCA/whitening
 * preparation step of an embedding-dedup / ANN pipeline.
 *
 * The distributed part is ONE bounded-state aggregation: a typed mergeable
 * `Aggregator` folds, per partition, the upper-triangle second-moment matrix
 * Σ q(x_i·x_j), the first-moment vector Σ q(x_i) and the row count, with
 * every term quantized to integer micros `q(p) = floor(p·1e6 + 0.5)` BEFORE
 * summation. Integer sums are associative-exact: the result is bit-identical
 * under any partitioning, merge order, retry, or engine (a float Σ is none
 * of those). State is O(d²) longs per map task — at 100 TB the corpus
 * streams through one scan and only d(d+1)/2 + d + 1 longs per partition
 * ever move.
 *
 * Everything downstream of the moments (covariance, eigendecomposition,
 * whitening basis) is a driver-side O(d³) on a d×d matrix — d is the
 * embedding width (64–4096), not the corpus size, so the driver step is
 * microseconds and the "big data" never touches it.
 */
object LinAlg {

  /** Mergeable moment state: row count, Σ q(x_i) micros (d), upper-triangle
    * Σ q(x_i·x_j) micros (d(d+1)/2, row-major i ≤ j). Empty until the first
    * row fixes d. */
  case class MomentState(n: Long, sums: Seq[Long], gram: Seq[Long])

  private def q(p: Double): Long = math.floor(p * 1e6 + 0.5).toLong

  final class Moments extends Aggregator[Seq[Float], MomentState, MomentState] {
    def zero: MomentState = MomentState(0L, Nil, Nil)

    def reduce(b: MomentState, v: Seq[Float]): MomentState = {
      val d = v.length
      val sums = (if (b.sums.isEmpty) Seq.fill(d)(0L) else b.sums).toArray
      val gram = (if (b.gram.isEmpty) Seq.fill(d * (d + 1) / 2)(0L) else b.gram).toArray
      require(sums.length == d, s"mixed embedding widths: ${sums.length} vs $d")
      var i = 0; var t = 0
      while (i < d) {
        val xi = v(i).toDouble
        sums(i) += q(xi)
        var j = i
        while (j < d) { gram(t) += q(xi * v(j).toDouble); j += 1; t += 1 }
        i += 1
      }
      MomentState(b.n + 1, sums.toSeq, gram.toSeq)
    }

    def merge(a: MomentState, b: MomentState): MomentState =
      if (a.n == 0) b else if (b.n == 0) a
      else MomentState(a.n + b.n,
        a.sums.zip(b.sums).map { case (x, y) => x + y },
        a.gram.zip(b.gram).map { case (x, y) => x + y })

    def finish(b: MomentState): MomentState = b
    def bufferEncoder = org.apache.spark.sql.Encoders.product[MomentState]
    def outputEncoder = org.apache.spark.sql.Encoders.product[MomentState]
  }

  /** Fold the moment state over `vecCol` (array<float>); NULL vectors are
    * skipped. Exposed for callers that want the raw state. */
  def moments(df: DataFrame, vecCol: String): MomentState = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs: Dataset[Seq[Float]] =
      df.filter(col(vecCol).isNotNull).select(col(vecCol)).as[Seq[Float]]
    vecs.select(new Moments().toColumn).head()
  }

  /** Per-group, per-dimension integer moment profile: (groupCol, dim, n,
    * sum_micro) with each component floor-quantized to micro-units before a
    * BIGINT fold — the exact, engine-portable building block for embedding
    * drift monitoring (compare a delta batch's profile against the base:
    * mean shift per dimension = Δ(sum_micro/n), computed downstream where
    * presentation precision is someone else's problem). One posexplode +
    * one combinable groupBy — a narrow map then a hash shuffle on
    * (group, dim); no per-row UDF, no matrix library. */
  def groupDimProfile(df: DataFrame, groupCol: String,
                      vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(groupCol), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * lit(1e6)).cast("long")).as("sum_micro"))

  /** Upper-triangle second-moment ("Gram") matrix as rows
    * (i, j, s_micro) with 1-based i ≤ j — the exact integer sums, suitable
    * for a cross-engine hash gate. */
  def gramMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val st = moments(df, vecCol)
    val d = st.sums.length
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield Row(i + 1, j + 1, st.gram(i * d - i * (i - 1) / 2 + (j - i)))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("s_micro", LongType, nullable = false))))
  }

  /** Covariance matrix (d×d, dense symmetric) from the integer moments:
    * cov_ij = E[x_i x_j] − E[x_i]·E[x_j], micros → doubles at the driver. */
  def covariance(st: MomentState): Array[Array[Double]] = {
    val d = st.sums.length
    require(st.n > 0, "covariance of an empty corpus")
    val n = st.n.toDouble
    val mean = st.sums.map(_ / 1e6 / n).toArray
    val c = Array.ofDim[Double](d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val e2 = st.gram(t) / 1e6 / n
        c(i)(j) = e2 - mean(i) * mean(j); c(j)(i) = c(i)(j)
        j += 1; t += 1
      }
      i += 1
    }
    c
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, eigenvectors as rows, matching order). Driver-side
    * O(d³) — deterministic (fixed sweep order, no RNG). */
  def symEigen(a0: Array[Array[Double]], sweeps: Int = 32,
               tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var r = p + 1
        while (r < d) {
          val apq = a(p)(r)
          off += apq * apq
          if (math.abs(apq) > tol) {
            // standard symmetric Jacobi rotation (Rutishauser): annihilate
            // a_pr, update only the touched rows/columns + the diagonal
            val theta = (a(r)(r) - a(p)(p)) / (2.0 * apq)
            // θ = 0 must give t = 1 (a 45° rotation), so no signum(0) = 0
            val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                    else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            a(p)(p) -= t * apq
            a(r)(r) += t * apq
            a(p)(r) = 0.0; a(r)(p) = 0.0
            var k = 0
            while (k < d) {
              if (k != p && k != r) {
                val akp = a(k)(p); val akr = a(k)(r)
                a(k)(p) = c * akp - s * akr; a(p)(k) = a(k)(p)
                a(k)(r) = s * akp + c * akr; a(r)(k) = a(k)(r)
              }
              val vkp = v(k)(p); val vkr = v(k)(r)
              v(k)(p) = c * vkp - s * vkr
              v(k)(r) = s * vkp + c * vkr
              k += 1
            }
          }
          r += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }

  /** Top-k principal components of `vecCol`: ONE distributed moment pass +
    * driver-side eigen. Returns (eigenvalues desc, components as rows). */
  def pca(df: DataFrame, vecCol: String, k: Int): (Array[Double], Array[Array[Double]]) = {
    val (vals, vecs) = symEigen(covariance(moments(df, vecCol)))
    (vals.take(k), vecs.take(k))
  }

  /** Project `vecCol` onto a driver-computed basis (rows of `comps`, e.g.
    * `pca(...)._2`), optionally mean-centering and whitening (dividing
    * component i by √λ_i). The basis rides the closure as a literal — a
    * broadcast-sized control value — and the projection itself is a rowwise
    * codegen'd dot product: the 100 TB side never shuffles. Appends
    * `projCol` as array<double> of length k. */
  def project(df: DataFrame, vecCol: String, comps: Array[Array[Double]],
              mean: Option[Array[Double]] = None,
              scales: Option[Array[Double]] = None,
              projCol: String = "proj"): DataFrame = {
    val d = comps.headOption.map(_.length).getOrElse(0)
    val mu = mean.getOrElse(Array.fill(d)(0.0))
    require(mu.length == d, s"mean width ${mu.length} != basis width $d")
    val sc = scales.getOrElse(Array.fill(comps.length)(1.0))
    val centered = (0 until d).map(i =>
      col(vecCol).getItem(i).cast("double") - lit(mu(i)))
    val projections = comps.zip(sc).map { case (row, s) =>
      row.zip(centered).map { case (w, x) => x * lit(w) }
        .reduce(_ + _) * lit(s)
    }
    df.withColumn(projCol, array(projections: _*))
  }
}
