package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints `explain(formatted)` for selected driver queries — the plan-audit
  * harness: verify predicate pushdown (PushedFilters), column pruning
  * (ReadSchema), broadcast joins, and partial aggregation before shipping. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q2_revenue_by_nation", "g_out_degrees",
        "d_exact_dedup", "e_knn_top1", "ev_hourly")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (names == Seq("NLJ")) {
      // audit mode: scan EVERY query's physical plan for the join shapes
      // that don't survive 100 TB (nested-loop / cartesian), one line each
      var flagged = 0
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        try {
          val plan = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.executedPlan.toString
          val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
          val cart = "CartesianProduct".r.findAllIn(plan).length
          if (nlj + cart > 0) { flagged += 1; println(s"[nlj] $name nlj=$nlj cartesian=$cart") }
        } catch { case e: Throwable => println(s"[nlj] $name ERROR ${e.getMessage}") }
      }
      println(s"[nlj] flagged $flagged of ${SparkEntry.queries.size} queries")
    } else names.foreach { name =>
      println(s"\n================ $name ================")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
