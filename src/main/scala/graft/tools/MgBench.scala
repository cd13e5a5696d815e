package graft.tools

import graft.pipeline.Sketches

/** Driver-local micro-benchmark of the MisraGries reduce hot path: folds a
  * synthetic long-tail token stream (every tail row forces an over-capacity
  * absorption — the worst case for the shrink step) and prints tokens/sec.
  * No Spark session; this times exactly the per-row state transition that
  * runs on the 100 TB scan side of d_heavy_tokens / d_heavy_by_source.
  *
  * usage: MgBench [nTokens] [capacity]   (defaults 2e6, 60)
  */
object MgBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000000
    val cap = if (args.length > 1) args(1).toInt else 60
    val agg = new Sketches.MisraGries(cap)
    // 5 hot keys at ~4% each, rest an (effectively) all-distinct tail —
    // the tail rows are the over-capacity absorptions being measured
    def tok(i: Int): String = if (i % 5 == 0) s"hot${i % 25}" else s"t$i"
    // warmup (JIT), then 3 timed reps
    (0 until 2).foreach { _ =>
      var st = agg.zero; var i = 0
      while (i < n / 4) { st = agg.reduce(st, tok(i)); i += 1 }
    }
    (0 until 3).foreach { rep =>
      val t0 = System.nanoTime()
      var st = agg.zero
      var i = 0
      while (i < n) { st = agg.reduce(st, tok(i)); i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"rep=$rep n=$n cap=$cap time=$sec%.3fs rate=${n / sec / 1e6}%.2fM tok/s " +
        s"survivors=${st.counts.size}")
    }
  }
}
