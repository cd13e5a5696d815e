package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.StatsBarrier

/** Pins the two things StatsBarrier depends on but cannot express in
  * types: the Spark major version whose `private[sql]` class layout it
  * reaches into, and the stats-reset behavior that is its whole point.
  * If a Spark upgrade breaks either, it fails HERE with a pointed
  * message instead of as a runtime linkage error (or worse, a silent
  * planner stall) deep inside an iterative loop. */
class StatsBarrierSpec extends SparkSpec {
  import spark.implicits._

  test("Spark major version matches StatsBarrier's internals assumption") {
    assert(spark.version.startsWith("4."),
      s"Spark ${spark.version}: StatsBarrier.freshLeaf is written against " +
        "Spark 4.x internals (org.apache.spark.sql.classic.Dataset + " +
        "internalCreateDataFrame). Re-verify the class layout, the " +
        "stats-reset test below, AND that freshLeaf still discards " +
        "constraints/ordering harmlessly for the iterative loops before " +
        "bumping this assertion.")
  }

  test("pinned internal lineage: classic.Dataset cast + " +
       "internalCreateDataFrame(RDD[InternalRow], StructType, Boolean)") {
    // freshLeaf does exactly two internal things: casts sql.Dataset to
    // classic.Dataset (to reach queryExecution.toRdd's InternalRow RDD and
    // the classic SparkSession), and calls the private[sql]
    // internalCreateDataFrame. Pin both shapes so a Spark minor bump that
    // moves either fails HERE with the upgrade path spelled out.
    val upgrade = "Spark moved the internals StatsBarrier.freshLeaf links " +
      "against — port freshLeaf to the new location/signature (see the " +
      "StatsBarrier scaladoc VERSION PIN note) and re-run this suite."
    val df = Seq((1L, "a")).toDF("id", "s")
    assert(df.isInstanceOf[org.apache.spark.sql.classic.Dataset[_]],
      s"sql.Dataset is no longer classic.Dataset at runtime — $upgrade")
    assert(spark.isInstanceOf[org.apache.spark.sql.classic.SparkSession],
      s"sql.SparkSession is no longer classic.SparkSession — $upgrade")
    val m = classOf[org.apache.spark.sql.classic.SparkSession].getMethods
      .filter(_.getName == "internalCreateDataFrame")
    assert(m.nonEmpty, s"internalCreateDataFrame is gone — $upgrade")
    val sigs = m.map(_.getParameterTypes.map(_.getSimpleName).toSeq)
    assert(sigs.exists(_ == Seq("RDD", "StructType", "boolean")),
      s"internalCreateDataFrame signature changed (saw ${sigs.mkString("; ")}) — $upgrade")
    // toRdd must stay an InternalRow RDD — freshLeaf hands it straight back
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.toRdd
    assert(rdd.isInstanceOf[org.apache.spark.rdd.RDD[_]],
      s"queryExecution.toRdd no longer returns an RDD — $upgrade")
  }

  test("freshLeaf preserves rows and schema") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .localCheckpoint(true)
    val fresh = StatsBarrier.freshLeaf(df)
    assert(fresh.schema === df.schema)
    assert(fresh.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("freshLeaf resets the carried size estimate to the session default") {
    // localCheckpoint carries the origin plan's stats; a self-join's size
    // estimate multiplies, so two hops give a strictly compounded estimate
    val base = spark.range(1000).toDF("id").localCheckpoint(true)
    val joined = base.join(base.withColumnRenamed("id", "id2"),
      col("id") === col("id2")).localCheckpoint(true)
    val carried = joined.queryExecution.optimizedPlan.stats.sizeInBytes
    val reset = StatsBarrier.freshLeaf(joined)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(reset === BigInt(spark.sessionState.conf.defaultSizeInBytes),
      s"freshLeaf no longer resets stats (carried=$carried reset=$reset) — " +
        "iterative peels will re-grow BigInteger size estimates and stall " +
        "the planner")
  }
}
