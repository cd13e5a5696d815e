package graft

import org.apache.spark.sql.functions._

import graft.pipeline.LinAlg

/** Integer-exact distributed moments (partition-order invariance, reference
  * parity) and the driver-side eigen/PCA steps built on them. */
class LinAlgSpec extends SparkSpec {
  import spark.implicits._

  private def q(p: Double): Long = math.floor(p * 1e6 + 0.5).toLong

  private val rnd = new scala.util.Random(42)
  private def vecs(n: Int, d: Int): Seq[Seq[Float]] =
    Seq.fill(n)(Seq.fill(d)((rnd.nextDouble() * 2 - 1).toFloat))

  test("moments match a driver-side reference and are partition-invariant") {
    val data = vecs(200, 6)
    val df1 = data.map(Tuple1(_)).toDF("embedding").repartition(1)
    val df7 = data.map(Tuple1(_)).toDF("embedding").repartition(7)
    val (m1, m7) = (LinAlg.moments(df1, "embedding"), LinAlg.moments(df7, "embedding"))
    assert(m1 === m7) // integer sums: merge order cannot matter
    assert(m1.n === 200)
    val d = 6
    val refSums = (0 until d).map(i => data.map(v => q(v(i).toDouble)).sum)
    assert(m1.sums === refSums)
    val refGram = for (i <- 0 until d; j <- i until d)
      yield data.map(v => q(v(i).toDouble * v(j).toDouble)).sum
    assert(m1.gram === refGram)
  }

  test("gramMatrix rows are the exact upper-triangle integer sums") {
    val data = vecs(50, 4)
    val df = data.map(Tuple1(_)).toDF("embedding").repartition(3)
    val got = LinAlg.gramMatrix(df, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size === 10)
    for (i <- 0 until 4; j <- i until 4) {
      val want = data.map(v => q(v(i).toDouble * v(j).toDouble)).sum
      assert(got((i + 1, j + 1)) === want, s"($i,$j)")
    }
  }

  test("symEigen: golden 2x2, and A·v = λ·v on a random symmetric matrix") {
    val (vals, vecsE) = LinAlg.symEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-9 && math.abs(vals(1) - 1.0) < 1e-9)
    assert(math.abs(math.abs(vecsE(0)(0)) - math.sqrt(0.5)) < 1e-9)
    val d = 8
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      m(i)(j) = rnd.nextDouble() * 2 - 1; m(j)(i) = m(i)(j)
    }
    val (ev, evec) = LinAlg.symEigen(m)
    assert(ev.toSeq === ev.toSeq.sortBy(-_)) // descending
    for (k <- 0 until d) {
      val av = (0 until d).map(i => (0 until d).map(j => m(i)(j) * evec(k)(j)).sum)
      val res = (0 until d).map(i => math.abs(av(i) - ev(k) * evec(k)(i))).max
      assert(res < 1e-8, s"eigenpair $k residual $res")
    }
  }

  test("pca: top component aligns with the planted stretch direction") {
    val d = 5
    val dir = Array(3.0, 1.0, 0.0, -1.0, 2.0)
    val norm = math.sqrt(dir.map(x => x * x).sum)
    val u = dir.map(_ / norm)
    // x = t·u + small noise, t ~ U(-10, 10): variance dominated by u
    val data = Seq.fill(500) {
      val t = rnd.nextDouble() * 20 - 10
      Seq.tabulate(d)(i => (t * u(i) + (rnd.nextDouble() - 0.5) * 0.1).toFloat)
    }
    val df = data.map(Tuple1(_)).toDF("embedding").repartition(5)
    val (vals, comps) = LinAlg.pca(df, "embedding", 2)
    val cosTop = math.abs((0 until d).map(i => comps(0)(i) * u(i)).sum)
    assert(cosTop > 0.999, s"top PC misaligned: |cos|=$cosTop")
    assert(vals(0) > 20 * vals(1), s"spectrum not dominated: ${vals.toSeq}")
  }

  test("project: rowwise plan, driver-side parity, whitening unit variance") {
    val d = 4
    val data = vecs(300, d)
    val df = data.map(Tuple1(_)).toDF("embedding").repartition(3)
    val st = LinAlg.moments(df, "embedding")
    val mean = st.sums.map(_ / 1e6 / st.n).toArray
    val (vals, comps) = LinAlg.pca(df, "embedding", 2)
    val scales = vals.map(v => 1.0 / math.sqrt(v))
    val out = LinAlg.project(df, "embedding", comps, Some(mean), Some(scales))
    // no shuffle beyond the test's own repartition: project adds none
    val flat = LinAlg.project(data.map(Tuple1(_)).toDF("embedding"),
      "embedding", comps, Some(mean), Some(scales))
    assert(!flat.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection introduced a shuffle")
    val got = out.select(col("proj")).collect().map(_.getSeq[Double](0))
    // whitened components have ~unit variance over the corpus
    for (c <- 0 until 2) {
      val xs = got.map(_(c))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
      assert(math.abs(v - 1.0) < 0.05, s"component $c variance $v")
    }
    // parity with a driver-side projection of the first row
    val v0 = data.head.map(_.toDouble)
    val want = comps.zip(scales).map { case (row, s) =>
      row.indices.map(i => (v0(i) - mean(i)) * row(i)).sum * s
    }
    val first = out.select(col("proj"))
      .where(col("embedding") === typedLit(data.head)).head().getSeq[Double](0)
    want.zip(first).foreach { case (w, g) => assert(math.abs(w - g) < 1e-9) }
  }
}
