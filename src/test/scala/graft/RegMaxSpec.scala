package graft

import org.apache.spark.sql.functions._

import graft.functions.{RegMaxFunctions, RegOps}
import graft.pipeline.Sketches

/** The SWAR pointwise byte-max (r16's hash-aggregatable HLL register
  * merge): lane-exact against a reference byte loop over the full valid
  * lane range, the DeclarativeAggregate against a groupBy reference, and
  * the long-packed register layout value-identical to the byte layout it
  * replaced in the HyperBall loop. */
class RegMaxSpec extends SparkSpec {
  import spark.implicits._

  private def pack(bytes: Seq[Int]): Long = {
    require(bytes.length == 8)
    bytes.zipWithIndex.map { case (b, i) => (b.toLong & 0xFF) << (8 * i) }
      .foldLeft(0L)(_ | _)
  }
  private def unpack(v: Long): Seq[Int] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xFFL).toInt)

  test("RegOps.bytewiseMax: lane-exact vs reference over random 7-bit lanes + boundaries") {
    val rnd = new scala.util.Random(7)
    (0 until 100000).foreach { _ =>
      val a = Seq.fill(8)(rnd.nextInt(128))
      val b = Seq.fill(8)(rnd.nextInt(128))
      val got = unpack(RegOps.bytewiseMax(pack(a), pack(b)))
      val want = a.zip(b).map { case (x, y) => math.max(x, y) }
      assert(got === want, s"a=$a b=$b")
    }
    // boundary lanes: 0 vs 127, equal lanes, all-zero
    for {
      a <- Seq(Seq.fill(8)(0), Seq.fill(8)(127), Seq(0, 127, 61, 61, 1, 0, 127, 33))
      b <- Seq(Seq.fill(8)(0), Seq.fill(8)(127), Seq(127, 0, 61, 60, 0, 1, 126, 34))
    } assert(unpack(RegOps.bytewiseMax(pack(a), pack(b))) ===
      a.zip(b).map { case (x, y) => math.max(x, y) })
  }

  test("BytewiseMaxAgg: DataFrame aggregate matches per-lane max, codegen + many groups") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 5000).map { i =>
      (i % 257L, pack(Seq.fill(8)(rnd.nextInt(128))))
    }
    val df = rows.toDF("id", "r").repartition(8)
    val got = df.groupBy($"id")
      .agg(RegMaxFunctions.bytewiseMaxAgg($"r").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (id, g) =>
      id -> pack((0 until 8).map(i => g.map(r => unpack(r._2)(i)).max))
    }
    assert(got === want)
    // plan shape: the fixed-width buffer must plan as HashAggregate, not
    // ObjectHashAggregate (the 128-key sort-fallback this change removes)
    val plan = df.groupBy($"id")
      .agg(RegMaxFunctions.bytewiseMaxAgg($"r").as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }

  test("long-packed register layout is value-identical to the byte layout") {
    val keys = (0 until 500).map(i => (i.toLong % 37, s"k$i")).toDF("id", "k")
    for (p <- Seq(4, 6, 8)) {
      val viaBytes = Sketches.hllUnpackBytes(
        Sketches.hllPackedSingletonsBytes(keys, "id", "k", p)
          .groupBy(col("id")).agg(Sketches.hllRegMaxBytes(p)(col("regs")).as("regs")),
        "id")
      // singleton init (one key per group) → pre-merge with the long agg
      val regCols = Sketches.hllLongCols(p)
      import graft.functions.RegMaxFunctions.bytewiseMaxAgg
      val merged = Sketches.hllPackedSingletonsLongs(keys, "id", "k", p)
        .groupBy(col("id"))
        .agg(bytewiseMaxAgg(col(regCols.head)).as(regCols.head),
          regCols.tail.map(c => bytewiseMaxAgg(col(c)).as(c)): _*)
      val viaLongs = Sketches.hllUnpackLongs(merged, "id", p)
      val a = viaBytes.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      val b = viaLongs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      assert(a.nonEmpty && (a.toSeq == b.toSeq), s"p=$p: layouts disagree")
    }
  }

  test("long-layout stats and estimate agree with the byte layout to the last bit") {
    val keys = (0 until 400).map(i => (i.toLong % 11, s"v$i")).toDF("id", "k")
    val p = 6
    val byteState = Sketches.hllPackedSingletonsBytes(keys, "id", "k", p)
      .groupBy(col("id")).agg(Sketches.hllRegMaxBytes(p)(col("regs")).as("regs"))
    val sB = byteState.select(Sketches.hllByteStats(col("regs")).as("st"),
        Sketches.hllEstimateBytes(p)(col("regs")).as("e"))
      .collect().map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getLong(1),
        r.getDouble(1))).sorted
    val regCols = Sketches.hllLongCols(p)
    import graft.functions.RegMaxFunctions.bytewiseMaxAgg
    val longState = Sketches.hllPackedSingletonsLongs(keys, "id", "k", p)
      .groupBy(col("id"))
      .agg(bytewiseMaxAgg(col(regCols.head)).as(regCols.head),
        regCols.tail.map(c => bytewiseMaxAgg(col(c)).as(c)): _*)
    val regs = array(regCols.map(col): _*)
    val sL = longState.select(Sketches.hllLongStats(regs).as("st"),
        Sketches.hllEstimateLongs(p)(regs).as("e"))
      .collect().map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getLong(1),
        r.getDouble(1))).sorted
    assert(sB.toSeq === sL.toSeq)
  }
}
