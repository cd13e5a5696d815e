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
}
