package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: per-STAGE metrics for one query or drill — the attribution
  * level ShuffleProfile's per-query rows can't give (e.g. WHICH stage of a
  * 900-stage peel is spilling). Prints one line per completed stage:
  * stage id, task count, input/shufR/shufW/spill MB, wall, and the first
  * line of the stage's callsite. Usage:
  *
  *   runMain graft.tools.StageMetricsProbe <sfDir> <queryOrDrillName>
  */
object StageMetricsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")
    def mb(v: Long): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v / 1048576.0))
    sc.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null && (m.memoryBytesSpilled > 0 || m.diskBytesSpilled > 0 ||
            m.shuffleWriteMetrics.bytesWritten > 100L * 1048576 ||
            m.shuffleReadMetrics.totalBytesRead > 100L * 1048576)) {
          val wall = (si.completionTime.getOrElse(0L) -
            si.submissionTime.getOrElse(0L)) / 1000.0
          println(f"[stage] id=${si.stageId}%-5d tasks=${si.numTasks}%-4d " +
            f"wall=$wall%7.1fs in=${mb(m.inputMetrics.bytesRead)}%8sMB " +
            s"shufR=${mb(m.shuffleReadMetrics.totalBytesRead)}MB " +
            s"shufW=${mb(m.shuffleWriteMetrics.bytesWritten)}MB " +
            s"spillM=${mb(m.memoryBytesSpilled)}MB spillD=${mb(m.diskBytesSpilled)}MB " +
            s":: ${si.name.take(120)}")
        }
      }
    })
    val drills = SparkEntry.scaleDrill.toMap
    val fn = SparkEntry.queries.get(name)
      .orElse(drills.get(name))
      .getOrElse(sys.error(s"unknown query/drill: $name"))
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"[stage] TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    spark.stop()
  }
}
