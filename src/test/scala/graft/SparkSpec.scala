package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + reference graph fixtures
  * (reference src/test/java/io/kgraph/TestGraphUtils.java:28-133). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.functions._

  def longLongVertices: DataFrame = {
    import spark.implicits._
    Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L)).toDF("id", "value")
  }

  /** 7 edges on 5 vertices (TestGraphUtils.getLongLongEdges). */
  def longLongEdges: DataFrame = {
    import spark.implicits._
    Seq((1L, 2L, 12L), (1L, 3L, 13L), (2L, 3L, 23L), (3L, 4L, 34L),
      (3L, 5L, 35L), (4L, 5L, 45L), (5L, 1L, 51L)).toDF("src", "dst", "value")
  }

  /** Chain 0→1→…→9, weight 1.0 (TestGraphUtils.getChain). */
  def chainEdges(n: Int = 10): DataFrame = {
    import spark.implicits._
    (0L until n - 1L).map(i => (i, i + 1, 1.0)).toDF("src", "dst", "value")
  }

  /** Two chains 0..9 and 10..20 (TestGraphUtils.getTwoChains). */
  def twoChainsEdges: DataFrame = {
    import spark.implicits._
    val c1 = (0L until 9L).map(i => (i, i + 1, 1.0))
    val c2 = (10L until 20L).map(i => (i, i + 1, 1.0))
    (c1 ++ c2).toDF("src", "dst", "value")
  }

  def collectMap(df: DataFrame): Map[Long, Any] =
    df.collect().map(r => r.getLong(0) -> r.get(1)).toMap
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
