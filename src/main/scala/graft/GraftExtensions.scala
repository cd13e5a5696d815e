package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/**
 * SQL surface for the library's native expressions: registers every graft
 * codegen'd Catalyst expression as a SQL function, so `spark.sql("SELECT
 * graft_simhash64(...)")` and pure-SQL pipelines (spark-sql shell, JDBC,
 * notebooks) reach the same whole-stage-codegen kernels the Column API uses.
 *
 * Two entry points:
 *   - `spark.sql.extensions=graft.GraftExtensions` at session build (the
 *     idiomatic Spark plugin seam, SparkSessionExtensions#injectFunction);
 *   - `GraftExtensions.register(spark)` on an existing session (tests, REPL).
 *
 * Config arguments (shingle width, band counts, seeds) must be literals —
 * they parameterize codegen, mirroring the Int/Long constructor params of the
 * underlying expressions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register all graft functions into an existing session's catalog. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  // ---- literal-argument extraction (config params pin codegen constants) --

  private def intOf(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, _)   => v
    case Literal(v: Long, _)  => v.toInt
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _)  => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  private def longOf(e: Expression, fn: String, what: String): Long = e match {
    case Literal(v: Long, _)  => v
    case Literal(v: Int, _)   => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  private def stringOf(e: Expression, fn: String, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got $other")
  }

  private def boolOf(e: Expression, fn: String, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a boolean literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int*): Unit =
    require(n.contains(args.length),
      s"$fn expects ${n.mkString(" or ")} arguments, got ${args.length}")

  private def desc(name: String, usage: String)(
      builder: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      // 11-arg constructor (the 5-arg one is deprecated): usage plus the
      // catalog metadata DESCRIBE FUNCTION surfaces
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      builder)

  /** One description per registered function (name, info, builder). */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    // -- vector kernels (pipeline/Ann, embedding dedup) ----------------------
    desc("graft_dot", "_FUNC_(a, b) - dot product of two double arrays") { a =>
      arity("graft_dot", a, 2); VectorExpressions.DotProduct(a(0), a(1))
    },
    desc("graft_l2norm", "_FUNC_(a) - L2 norm of a double array") { a =>
      arity("graft_l2norm", a, 1); VectorExpressions.L2Norm(a(0))
    },
    desc("graft_sqdist", "_FUNC_(a, b) - squared euclidean distance") { a =>
      arity("graft_sqdist", a, 2); VectorExpressions.SquaredDistance(a(0), a(1))
    },
    desc("graft_hyperplane_bucket",
        "_FUNC_(v, bits) - signed-random-projection LSH bucket id") { a =>
      arity("graft_hyperplane_bucket", a, 2)
      VectorExpressions.HyperplaneBucket(a(0),
        intOf(a(1), "graft_hyperplane_bucket", "bits"))
    },

    // -- sorted-adjacency set kernels (triangles, jaccard, adamic-adar) ------
    desc("graft_sorted_intersect_count",
        "_FUNC_(a, b) - |a ∩ b| over sorted long arrays") { a =>
      arity("graft_sorted_intersect_count", a, 2)
      GraphSetExpressions.SortedIntersectCount(a(0), a(1))
    },
    desc("graft_sorted_intersect",
        "_FUNC_(a, b) - a ∩ b over sorted long arrays") { a =>
      arity("graft_sorted_intersect", a, 2)
      GraphSetExpressions.SortedIntersect(a(0), a(1))
    },
    desc("graft_sorted_intersect_weight_sum",
        "_FUNC_(nbrs, weights, other) - sum of weights at intersection positions") { a =>
      arity("graft_sorted_intersect_weight_sum", a, 3)
      GraphSetExpressions.SortedIntersectWeightSum(a(0), a(1), a(2))
    },
    desc("graft_array_pairs",
        "_FUNC_(a) - all ordered pairs (i<j) of a long array") { a =>
      arity("graft_array_pairs", a, 1); GraphSetExpressions.ArrayPairs(a(0))
    },
    desc("graft_array_cross_pairs",
        "_FUNC_(a, b) - cross product pairs of two long arrays") { a =>
      arity("graft_array_cross_pairs", a, 2)
      GraphSetExpressions.ArrayCrossPairs(a(0), a(1))
    },

    // -- text/dedup kernels --------------------------------------------------
    desc("graft_word_shingles",
        "_FUNC_(tokens, n) - distinct space-joined n-gram shingles") { a =>
      arity("graft_word_shingles", a, 2)
      ShingleExpression.WordShingles(a(0), intOf(a(1), "graft_word_shingles", "n"))
    },
    desc("graft_simhash64",
        "_FUNC_(hashes) - 64-bit SimHash of an array of 64-bit hashes") { a =>
      arity("graft_simhash64", a, 1); SimHashExpression.SimHash64(a(0))
    },
    desc("graft_poly64",
        "_FUNC_(s[, seed, mult]) - Poly64 rolling-family string hash") { a =>
      arity("graft_poly64", a, 1, 3)
      if (a.length == 1) Poly64.Poly64Hash(a(0), Poly64.Seed1, Poly64.Mult1)
      else Poly64.Poly64Hash(a(0), longOf(a(1), "graft_poly64", "seed"),
        longOf(a(2), "graft_poly64", "mult"))
    },
    desc("graft_normalize",
        "_FUNC_(s, form) - Unicode normalization (NFC/NFD/NFKC/NFKD)") { a =>
      arity("graft_normalize", a, 2)
      NormalizeExpression.UnicodeNormalize(a(0),
        stringOf(a(1), "graft_normalize", "form"))
    },
    desc("graft_mix64",
        "_FUNC_(h) - xorshift/multiply 64-bit avalanche finalizer") { a =>
      arity("graft_mix64", a, 1); Poly64.Mix64(a(0))
    },
    desc("graft_wrap_mul_add",
        "_FUNC_(a, i, b) - a + i*b with Long wraparound (Carter-Wegman " +
        "hash combine; never ANSI-throws)") { a =>
      arity("graft_wrap_mul_add", a, 3); Poly64.WrapMulAdd(a(0), a(1), a(2))
    },
    desc("graft_rolling_fps",
        "_FUNC_(s[, k, max]) - winnowing fingerprints via Poly64 rolling hash") { a =>
      arity("graft_rolling_fps", a, 1, 3)
      if (a.length == 1)
        Poly64.RollingFingerprintsExpr(a(0), 8, 16, Poly64.Seed1, Poly64.Mult1)
      else Poly64.RollingFingerprintsExpr(a(0),
        intOf(a(1), "graft_rolling_fps", "k"),
        intOf(a(2), "graft_rolling_fps", "max"), Poly64.Seed1, Poly64.Mult1)
    },
    desc("graft_minhash",
        "_FUNC_(shingles, numHashes[, poly]) - MinHash signature array") { a =>
      arity("graft_minhash", a, 2, 3)
      MinHashExpression.MinHashSignature(a(0),
        intOf(a(1), "graft_minhash", "numHashes"),
        if (a.length == 3) boolOf(a(2), "graft_minhash", "poly") else false)
    },
    desc("graft_band_buckets",
        "_FUNC_(sig, bands, rowsPerBand) - LSH band bucket hashes") { a =>
      arity("graft_band_buckets", a, 3)
      MinHashExpression.BandBuckets(a(0),
        intOf(a(1), "graft_band_buckets", "bands"),
        intOf(a(2), "graft_band_buckets", "rowsPerBand"))
    }
  )
}
