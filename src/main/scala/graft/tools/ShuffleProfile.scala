package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: measured data movement per gated query — the empirical side
  * of SCALE.md's shuffle claims. Attaches one SparkListener, runs each
  * named query cold, drains the listener bus between queries (exact
  * attribution via the BusFlush shim), and prints one line per query:
  *
  *   [shuffle] <name> wall=..s jobs=. stages=. tasks=.. input=..MB
  *             shufW=..MB shufR=..MB spillMem=..MB spillDisk=..MB
  *
  * `shufW` is the number to read against the input volume: an operator
  * whose shuffle write is a small fraction of its input scan moves keys /
  * candidates / summaries, not the corpus — the property that survives a
  * 1000× scale-up. Usage:
  *
  *   runMain graft.tools.ShuffleProfile <sfDir> [query ...]   (default: a
  *   representative heavy set)
  *
  * Queries share SparkEntry's memoized prep (same as Bench), so profile
  * prep-heavy g_* queries AFTER a warmup run of the same query list, or
  * read the first run as prep+query. */
object ShuffleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "d_exact_dedup", "d_minhash_clusters", "d_heavy_tokens",
      "d_heavy_by_source", "d_containment", "d_pack", "e_knn_ivf",
      "g_wcc_clusters", "g_ktruss")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")

    val jobs = new AtomicLong; val stages = new LongAdder
    val tasks = new LongAdder; val input = new LongAdder
    val shufW = new LongAdder; val shufR = new LongAdder
    val spillMem = new LongAdder; val spillDisk = new LongAdder
    sc.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.add(j.stageInfos.size)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          tasks.increment()
          input.add(m.inputMetrics.bytesRead)
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          spillMem.add(m.memoryBytesSpilled)
          spillDisk.add(m.diskBytesSpilled)
        }
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.reset(); tasks.reset(); input.reset()
      shufW.reset(); shufR.reset(); spillMem.reset(); spillDisk.reset()
    }
    def mb(a: LongAdder): String = f"${a.sum / 1048576.0}%.1f"

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[shuffle] $name UNKNOWN")
        case Some(fn) =>
          org.apache.spark.graft.BusFlush.waitUntilEmpty(sc)
          reset()
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          org.apache.spark.graft.BusFlush.waitUntilEmpty(sc)
          println(f"[shuffle] $name%-22s wall=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
            f"rows=$n%-8d jobs=${jobs.get}%-3d stages=${stages.sum}%-3d tasks=${tasks.sum}%-5d " +
            s"input=${mb(input)}MB shufW=${mb(shufW)}MB shufR=${mb(shufR)}MB " +
            s"spillMem=${mb(spillMem)}MB spillDisk=${mb(spillDisk)}MB")
      }
    }
    spark.stop()
  }
}
