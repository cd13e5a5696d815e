package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.GraphSetExpressions._
import graft.pipeline.Dedup

/** Equivalence pins for the codegen'd merge-walk set expressions and the
  * one-pass SimHash expression against their declarative formulations.
  * Raw ScalaCheck generators with a manual sampling loop (no scalatestplus
  * bridge in the offline dependency cache). */
class GraphSetExprSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 40).foreach { _ =>
      (ga.sample, gb.sample) match {
        case (Some(a), Some(b)) => f(a, b)
        case _ =>
      }
    }

  private val sortedArr: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct.sorted)

  test("sorted intersect count/members match array_intersect on random sorted sets") {
    forAll(sortedArr, sortedArr) { (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(
          sortedIntersectCount(col("a"), col("b")).as("c"),
          sortedIntersect(col("a"), col("b")).as("m"),
          array_intersect(col("a"), col("b")).as("ref"))
        .head()
      val ref = row.getSeq[Long](2)
      assert(row.getInt(0) === ref.size)
      assert(row.getSeq[Long](1) === ref) // array_intersect keeps a's (sorted) order
    }
  }

  test("sorted intersect weight sum = sum of a-side weights over common members; NULL on empty") {
    forAll(sortedArr, sortedArr) { (a, b) =>
      val ws = a.map(x => x * 0.25 + 1.0)
      val row = Seq((a, ws, b)).toDF("a", "w", "b")
        .select(sortedIntersectWeightSum(col("a"), col("w"), col("b")).as("s")).head()
      val common = a.toSet.intersect(b.toSet)
      if (common.isEmpty) assert(row.isNullAt(0))
      else {
        val expect = a.zip(ws).filter(p => common(p._1)).map(_._2).sum
        assert(math.abs(row.getDouble(0) - expect) < 1e-12)
      }
    }
  }

  test("galloping path (skewed sizes) ≡ linear merge on all three kernels") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.functions.GraphSetOps
    val rnd = new scala.util.Random(7)
    def arr(xs: Seq[Long]) = ArrayData.toArrayData(xs.toArray)
    // size pairs straddling the ratio-8 gallop threshold, both directions,
    // including empties and no-overlap extremes
    val cases = Seq(0 -> 100, 1 -> 100, 3 -> 1000, 12 -> 1000, 100 -> 3,
      1000 -> 12, 50 -> 50, 0 -> 0, 7 -> 56, 56 -> 7)
    for ((na, nb) <- cases; overlap <- Seq(0.0, 0.3, 1.0)) {
      val pool = (0L until 4000L by 3L).toArray
      val a = rnd.shuffle(pool.toSeq).take(na).distinct.sorted
      val b = {
        val shared = a.take((na * overlap).toInt)
        (rnd.shuffle(pool.toSeq).take(nb) ++ shared).distinct.sorted.take(math.max(nb, shared.size))
      }
      val expectC = a.toSet.intersect(b.toSet).size
      assert(GraphSetOps.intersectCount(arr(a), arr(b)) === expectC, s"$na/$nb")
      assert(GraphSetOps.intersect(arr(a), arr(b)).toLongArray().toSeq ===
        a.filter(b.toSet), s"$na/$nb members")
      val ws = a.map(x => x * 0.5 + 1.0)
      val r = GraphSetOps.intersectWeightSum(arr(a),
        ArrayData.toArrayData(ws.toArray), arr(b))
      val common = b.toSet
      val expectS = a.zip(ws).filter(p => common(p._1)).map(_._2).sum
      if (expectC == 0) assert(r == null, s"$na/$nb wsum null")
      else assert(math.abs(r.doubleValue() - expectS) < 1e-9, s"$na/$nb wsum")
    }
  }

  test("SimHash64 expression equals the declarative HOF formulation") {
    val docs = Seq(
      "the quick brown fox", "the quick brown fox", "jumps over the lazy dog",
      "a", "", "mixed 123 tokens with für unicode"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (poly <- Seq(false, true)) {
      val rows = docs
        .select(col("id"), Dedup.simHashTokenHashes(col("text"), poly).as("hs"))
        .select(col("id"),
          Dedup.simHashFromHashes(col("hs")).as("fast"),
          Dedup.simHashFromHashesHof(col("hs")).as("ref"))
        .collect()
      rows.foreach(r => assert(r.getLong(1) === r.getLong(2), s"poly=$poly id=${r.getLong(0)}"))
    }
  }

  test("empty token-hash array → all 64 bits set (tie rule), matching HOF") {
    val r = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(Dedup.simHashFromHashes(col("hs")).as("fast"),
        Dedup.simHashFromHashesHof(col("hs")).as("ref")).head()
    assert(r.getLong(0) === -1L)
    assert(r.getLong(1) === -1L)
  }

  test("triangle family agrees with the wedge-enumeration oracle on K4 plus a tail") {
    import graft.core.KGraph
    import graft.algos.GraphAlgorithms
    // K4 on {1,2,3,4} (4 triangles), tail 4-5 (no triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst").withColumn("value", lit(1L))
    val g = KGraph.fromEdges(edges, id => id)
    assert(GraphAlgorithms.globalTriangleCount(g) === 4L)
    val tri = GraphAlgorithms.triangleCounts(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
    // adamic-adar on edge (1,2): common {3,4}, deg(3)=3, deg(4)=4
    val aa = GraphAlgorithms.adamicAdar(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(aa((1L, 2L)) - (math.log(1.0 / 3) + math.log(1.0 / 4))) < 1e-12)
    assert(!aa.contains((4L, 5L))) // no common neighbors → no row
    // jaccard on (1,2): |{3,4}| / |{1,2,3,4} \ {}|: na={2,3,4}, nb={1,3,4} → 2/4
    val jc = GraphAlgorithms.jaccard(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(jc((1L, 2L)) - 0.5) < 1e-12)
  }
}
