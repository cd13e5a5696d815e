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
  *   runMain graft.tools.ShuffleProfile <sfDir> [--json out.json] [query ...]
  *
  * With no query names, profiles the FULL gate: every SparkEntry.sharedPrep
  * entry first (as prep:<name> rows, so prep cost is attributed explicitly
  * instead of landing on whichever query touches a cold memoized cache
  * first — the Bench discipline), then every query in sorted-name order.
  * `--json` additionally writes one machine-readable object per run
  * (per-query wall/rows/jobs/stages/tasks/bytes) for cross-round diffing —
  * data movement is the metric host load cannot fake. */
object ShuffleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // --json is position-independent among the trailing args: everything
    // else is a query name
    val rest = args.drop(1).toSeq
    val flagAt = rest.indexOf("--json")
    val jsonPath =
      if (flagAt >= 0 && flagAt + 1 < rest.size) Some(rest(flagAt + 1)) else None
    val explicit =
      if (flagAt >= 0) rest.patch(flagAt, Nil, 2) else rest
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
    // Locale.ROOT like Bench.fmt: a comma-decimal default locale would
    // otherwise emit syntactically invalid JSON in the --json artifact
    def fmtRoot(pattern: String, v: Double): String =
      String.format(java.util.Locale.ROOT, pattern, Double.box(v))
    def mb(a: LongAdder): String = fmtRoot("%.1f", a.sum / 1048576.0)

    // (name, run-thunk) in execution order: explicit names as given, or the
    // full gate (prep first, then sorted queries — Bench's attribution rule)
    val drills = SparkEntry.scaleDrill.toMap
    val work: Seq[(String, () => Long)] =
      if (explicit.nonEmpty) {
        explicit.filterNot(n => SparkEntry.queries.contains(n) || drills.contains(n))
          .foreach(n => println(s"[shuffle] $n UNKNOWN"))
        explicit.flatMap { name =>
          SparkEntry.queries.get(name).map(fn =>
              name -> (() => fn(spark, sfDir).count()))
            .orElse(drills.get(name).map(fn =>
              s"drill:$name" -> (() => fn(spark, sfDir).count())))
        }
      } else
        SparkEntry.sharedPrep.map { case (name, fn) =>
          s"prep:$name" -> (() => { fn(spark, sfDir); 0L })
        } ++
          SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
            name -> (() => fn(spark, sfDir).count())
          } ++
          // scale drill last (declaration order: prep builds the graph, so
          // each algorithm row is its own cost — the prep:* discipline)
          SparkEntry.scaleDrill.map { case (name, fn) =>
            s"drill:$name" -> (() => fn(spark, sfDir).count())
          }

    val records = scala.collection.mutable.ListBuffer.empty[String]
    work.foreach { case (name, run) =>
      org.apache.spark.graft.BusFlush.waitUntilEmpty(sc)
      // GC outside the measured window (Bench's attribution rule): the
      // scale-22 drills run within ~1 GB of the heap ceiling, and carrying
      // the previous drill's allocation debt into the next one flipped
      // marginal runs into GCLocker-storm OOMs (observed on the truss's
      // canonical-edge checkpoint, a stage untouched since r15)
      System.gc()
      reset()
      val t0 = System.nanoTime()
      val n =
        try run()
        catch { case scala.util.control.NonFatal(e) =>
          Console.err.println(s"[shuffle] $name FAILED: ${e.getMessage}"); -1L }
      org.apache.spark.graft.BusFlush.waitUntilEmpty(sc)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[shuffle] $name%-26s wall=$wall%6.2fs " +
        f"rows=$n%-8d jobs=${jobs.get}%-3d stages=${stages.sum}%-3d tasks=${tasks.sum}%-5d " +
        s"input=${mb(input)}MB shufW=${mb(shufW)}MB shufR=${mb(shufR)}MB " +
        s"spillMem=${mb(spillMem)}MB spillDisk=${mb(spillDisk)}MB")
      records += s"""{"name":"$name","wall":${fmtRoot("%.3f", wall)},"rows":$n,""" +
        s""""jobs":${jobs.get},"stages":${stages.sum},"tasks":${tasks.sum},""" +
        s""""inputMB":${mb(input)},"shufWMB":${mb(shufW)},"shufRMB":${mb(shufR)},""" +
        s""""spillMemMB":${mb(spillMem)},"spillDiskMB":${mb(spillDisk)}}"""
    }
    jsonPath.foreach { p =>
      val w = new java.io.PrintWriter(p)
      try w.println(records.mkString(
        s"""{"sf":"$sfDir","cpus":$cpus,"queries":[\n""", ",\n", "\n]}"))
      finally w.close()
      println(s"[shuffle] wrote $p (${records.size} entries)")
    }
    spark.stop()
  }
}
