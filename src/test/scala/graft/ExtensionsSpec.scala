package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraphSetExpressions, Poly64, ShingleExpression,
  SimHashExpression, VectorExpressions}
import graft.pipeline.Dedup

/** SQL function registration (GraftExtensions): every registered function
  * must produce exactly what its Column-API twin produces — same codegen'd
  * expression underneath, just reachable from `spark.sql`. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  def docs = Seq(
    (1L, "the quick brown fox jumps over the quick brown dog"),
    (2L, "completely different content about query planning engines")
  ).toDF("doc_id", "text")

  test("vector kernels via SQL match the Column API") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val sql = spark.sql(
      """SELECT graft_dot(a, b) AS d, graft_l2norm(a) AS n,
        |       graft_sqdist(a, b) AS s, graft_hyperplane_bucket(a, 8) AS h
        |FROM vecs""".stripMargin).collect()(0)
    val api = df.select(
      VectorExpressions.dot(col("a"), col("b")),
      VectorExpressions.l2norm(col("a")),
      VectorExpressions.squaredDistance(col("a"), col("b")),
      VectorExpressions.hyperplaneBucket(col("a"), 8)).collect()(0)
    assert(sql === api)
  }

  test("set kernels via SQL match the Column API") {
    val df = Seq((Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L)))
      .toDF("a", "b")
    df.createOrReplaceTempView("sets")
    val sql = spark.sql(
      """SELECT graft_sorted_intersect_count(a, b) AS c,
        |       graft_sorted_intersect(a, b) AS i,
        |       graft_array_pairs(b) AS p,
        |       graft_array_cross_pairs(a, b) AS x
        |FROM sets""".stripMargin).collect()(0)
    val api = df.select(
      GraphSetExpressions.sortedIntersectCount(col("a"), col("b")),
      GraphSetExpressions.sortedIntersect(col("a"), col("b")),
      GraphSetExpressions.arrayPairs(col("b")),
      GraphSetExpressions.arrayCrossPairs(col("a"), col("b"))).collect()(0)
    assert(sql === api)
    assert(sql.getInt(0) === 2)
  }

  test("text/dedup kernels via SQL match the Column API") {
    docs.createOrReplaceTempView("docs")
    val sql = spark.sql(
      """SELECT doc_id,
        |  graft_poly64(text) AS p,
        |  graft_rolling_fps(text, 8, 16) AS fps,
        |  graft_word_shingles(split(text, ' '), 3) AS sh,
        |  graft_simhash64(transform(split(text, ' '), t -> graft_poly64(t))) AS sim,
        |  graft_minhash(graft_word_shingles(split(text, ' '), 3), 16, true) AS mh
        |FROM docs""".stripMargin).collect()
    val toks = split(col("text"), " ")
    val api = docs.select(col("doc_id"),
      Poly64.poly64(col("text")),
      Poly64.rollingFps(col("text"), 8, 16),
      ShingleExpression.wordShingles(toks, 3),
      SimHashExpression.simHash64(transform(toks, t => Poly64.poly64(t))),
      graft.functions.MinHashExpression.minHashSignature(
        ShingleExpression.wordShingles(toks, 3), 16, poly = true)).collect()
    assert(sql === api)
  }

  test("hash combine via SQL: graft_wrap_mul_add wraps where ANSI + throws") {
    docs.createOrReplaceTempView("docs")
    val sql = spark.sql(
      """SELECT doc_id, graft_mix64(graft_wrap_mul_add(
        |  graft_poly64(text), 3, graft_poly64(text, 2065775093, 6364136223846793005)
        |)) AS b FROM docs""".stripMargin).collect()
    val api = docs.select(col("doc_id"),
      Poly64.mix64(Poly64.wrapMulAdd(Poly64.poly64(col("text")), lit(3L),
        Poly64.poly64(col("text"), 2065775093L, 6364136223846793005L)))).collect()
    assert(sql === api)
    // the combine genuinely wraps (a plain ANSI expression would throw here)
    val wrapped = spark.sql(
      "SELECT graft_wrap_mul_add(9223372036854775807, 2, 9223372036854775807) AS v")
      .collect()(0).getLong(0)
    assert(wrapped === (Long.MaxValue + 2L * Long.MaxValue))
  }

  test("band buckets via SQL drive the same LSH pipeline stage") {
    docs.createOrReplaceTempView("docs")
    val sql = spark.sql(
      """SELECT doc_id, graft_band_buckets(
        |  graft_minhash(graft_word_shingles(split(text, ' '), 3), 16, true),
        |  4, 4) AS bk FROM docs""".stripMargin).collect()
    val api = docs.select(col("doc_id"),
      graft.functions.MinHashExpression.bandBuckets(
        graft.functions.MinHashExpression.minHashSignature(
          ShingleExpression.wordShingles(split(col("text"), " "), 3), 16,
          poly = true), 4, 4)).collect()
    assert(sql === api)
  }

  test("config arguments must be literals") {
    docs.createOrReplaceTempView("docs")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(split(text, ' '), doc_id) FROM docs")
        .collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.contains("n must"))
  }
}
