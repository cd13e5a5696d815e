package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions._

/** Custom Catalyst expression tests: values + codegen path + null behavior. */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0, 0.0), Array(0.0, 0.0))
  ).toDF("id", "a", "b")

  test("dot / l2norm / squaredDistance values") {
    val r = vecs.select(dot(col("a"), col("b")), l2norm(col("a")),
      squaredDistance(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) === 32.0)
    assert(math.abs(r(0).getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(r(0).getDouble(2) === 27.0)
    assert(r(1).getDouble(0) === 0.0)
  }

  test("float arrays implicitly cast") {
    val f = Seq((1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("id", "a", "b")
    assert(f.select(dot(col("a"), col("b"))).head().getDouble(0) === 11.0)
  }

  test("null inputs produce null") {
    val n = Seq((1L, null.asInstanceOf[Array[Double]], Array(1.0))).toDF("id", "a", "b")
    assert(n.select(dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("expressions run inside WholeStageCodegen") {
    // spark.range source (not a literal local table, which constant-folds)
    val df = spark.range(100)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(dot(col("a"), col("b")).as("d"))
    // "*(n)" prefixes mark operators inside WholeStageCodegen stage n
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), s"plan was:\n$plan")
    assert(df.agg(sum(col("d"))).head().getDouble(0) === (0 until 100).map(i => 3.0 * i).sum)
  }

  test("JL projection: rpProjectMicro ≡ exact driver reference (long " +
       "arithmetic); rpProject ≡ driver float fold; projected space " +
       "preserves the two-cluster structure (the JL use case)") {
    import graft.pipeline.Ann
    def sign(b: Int, i: Int): Long =
      if ((((b * 1000003L + i) * 2654435761L) >> 16) % 2 == 0) 1L else -1L
    val rng = new scala.util.Random(11)
    val dim = 24; val k = 6
    // two tight clusters on far-apart centers
    val base = Array.fill(dim)(rng.nextDouble() * 2 - 1)
    val vecs = (0 until 40).map { n =>
      val c = if (n % 2 == 0) 10.0 else -10.0
      (n.toLong, base.map(x => (x * c + rng.nextDouble() * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    // integer shadow ≡ driver longs
    val gotM = Ann.rpProjectMicro(df, k).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    vecs.foreach { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      (0 until k).foreach { b =>
        val want = q.indices.map(i => q(i) * sign(b, i)).sum
        assert(gotM((id, b)) === want, s"id=$id b=$b")
      }
    }
    // float form ≡ driver fold (same index order) / sqrt(k)
    val gotF = Ann.rpProject(df, k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, v) =>
      (0 until k).foreach { b =>
        var acc = 0.0
        v.indices.foreach(i => acc += v(i).toDouble * sign(b, i))
        assert(math.abs(gotF(id)(b) - acc / math.sqrt(k.toDouble)) < 1e-9)
      }
    }
    // cluster preservation: every vector's projected nearest neighbor is
    // in its own cluster (cosine on the 6-dim projections)
    val proj = Ann.rpProject(df, k).select(col("vec_id"), col("proj").as("embedding"))
    val nn = Ann.bruteForceKnn(proj, proj, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    nn.foreach { case (q, n) =>
      assert(q % 2 === n % 2, s"projected NN of $q crossed clusters to $n") }
  }
}
