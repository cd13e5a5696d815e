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
}
