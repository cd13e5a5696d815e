package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic graph sources (reference utils/GraphGenerators.java:40-98),
 * built on `spark.range` so generation is distributed — at 1e9+ vertices
 * each generator is a narrow map over a range partition, no driver data.
 */
object GraphGenerators {

  /** All ordered pairs i != j over 0..n-1, edge value 1, vertex value 1.
    * (GraphGenerators.completeGraph, utils/GraphGenerators.java:40-53) */
  def completeGraph(spark: SparkSession, n: Int): KGraph = {
    val v = spark.range(n).select(col("id"), lit(1L).as("value"))
    val e = spark.range(n).select(col("id").as("src"))
      .crossJoin(spark.range(n).select(col("id").as("dst")))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), lit(1L).as("value"))
    KGraph(v, e)
  }

  /** Grid rows×cols, id = row*cols+col, edges right and down, value 1.
    * (utils/GraphGenerators.java:55-85) */
  def gridGraph(spark: SparkSession, rows: Int, cols: Int): KGraph = {
    val v = spark.range(rows.toLong * cols).select(col("id"), lit(1L).as("value"))
    val base = spark.range(rows.toLong * cols)
      .select(col("id"), (col("id") / cols).cast("long").as("r"), (col("id") % cols).as("c"))
    val right = base.filter(col("c") < cols - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"), lit(1L).as("value"))
    val down = base.filter(col("r") < rows - 1)
      .select(col("id").as("src"), (col("id") + cols).as("dst"), lit(1L).as("value"))
    KGraph(v, right.unionByName(down))
  }

  /** Star: edges i→0 for i in 1..n-1. (utils/GraphGenerators.java:87-98) */
  def starGraph(spark: SparkSession, n: Int): KGraph = {
    val v = spark.range(n).select(col("id"), lit(1L).as("value"))
    val e = spark.range(1, n).select(col("id").as("src"), lit(0L).as("dst"), lit(1L).as("value"))
    KGraph(v, e)
  }

  /** Chain 0→1→…→(n-1), weight 1.0 (test fixture getChain,
    * reference TestGraphUtils.java:80-91). */
  def chain(spark: SparkSession, n: Int): KGraph = {
    val v = spark.range(n).select(col("id"), col("id").as("value"))
    val e = spark.range(n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"), lit(1.0).as("value"))
    KGraph(v, e)
  }

  /** Deterministic R-MAT graph (Chakrabarti, Zhan & Faloutsos, SDM'04 —
    * the Graph500/Graphalytics generator family): 2^scale vertex-id space,
    * `numEdges` directed edges. Each edge's quadrant path derives from
    * xxhash64(edge index, level), so the graph is a PURE FUNCTION of
    * (scale, numEdges, a, b, c) — a narrow map over `spark.range` with no
    * RNG state and no driver data at any size (the generator itself scales
    * to billions of edges). Self-loops dropped; multi-edges kept (callers
    * `.distinct()` for simple graphs). Degrees follow the usual R-MAT
    * heavy tail, hubs concentrated near vertex 0 — the skewed fixture the
    * iterative algorithms' scale drills want. */
  def rmatGraph(spark: SparkSession, scale: Int, numEdges: Long,
                a: Double = 0.57, b: Double = 0.19, c: Double = 0.19): KGraph = {
    require(scale >= 1 && scale <= 40, s"scale must be in [1, 40], got $scale")
    require(a > 0 && b > 0 && c > 0 && a + b + c < 1.0,
      s"quadrant probabilities must be positive with a+b+c < 1, got ($a, $b, $c)")
    val (srcCol, dstCol) = (0 until scale).foldLeft((lit(0L), lit(0L))) {
      case ((s0, d0), level) =>
        // one uniform draw per (edge, level): top 53 bits of the
        // avalanched 64-bit hash → exact double in [0, 1)
        val u = shiftrightunsigned(xxhash64(col("id"), lit(level)), 11)
          .cast("double") / lit((1L << 53).toDouble)
        val srcBit = (u >= a + b).cast("long")                       // quadrants c, d
        val dstBit = ((u >= a && u < a + b) || u >= a + b + c)
          .cast("long")                                              // quadrants b, d
        (s0 * 2 + srcBit, d0 * 2 + dstBit)
    }
    val e = spark.range(numEdges)
      .select(srcCol.as("src"), dstCol.as("dst"), lit(1.0).as("value"))
      .filter(col("src") =!= col("dst"))
    KGraph.fromEdges(e, _ => lit(1L))
  }
}
