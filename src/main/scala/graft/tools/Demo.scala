package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.core.KGraph

/** Smoke driver: exercises the public API end-to-end on the driver-provided
  * testdata (supplier→part graph derived from lineitem). */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = li.groupBy(col("l_suppkey").as("src"), (col("l_partkey") + 1000000L).as("dst"))
      .agg(min(col("l_quantity")).as("value"))
    val g = KGraph.fromEdges(edges, id => id)

    println(s"vertices=${g.vertices.count()} edges=${g.edges.count()}")
    println("outDegrees top5:")
    g.outDegrees.orderBy(desc("value")).show(5, false)
    val wcc = GraphAlgorithms.wcc(g)
    println(s"wcc components=${wcc.select(col("value")).distinct().count()}")
    val wccLog = GraphAlgorithms.wccLogRounds(g)
    val wccAgree = wcc.toDF("id", "a").join(wccLog.toDF("id", "b"), Seq("id"))
      .filter(col("a") === col("b")).count()
    println(s"wccLogRounds agreement: $wccAgree/${wcc.count()}")
    val pr = GraphAlgorithms.pageRank(g, tolerance = 0.001)
    println("pagerank top5:")
    pr.orderBy(desc("value")).show(5, false)
    println(s"globalTriangles=${GraphAlgorithms.globalTriangleCount(g)}")

    // ---- training-data pipeline ops on the real documents/embeddings ----
    import graft.pipeline.{Ann, Dedup, TextAnalysis}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs=${docs.count()} exactDedupSurvivors=${Dedup.exact(docs).count()}")
    val mh = Dedup.minHashLSH(docs, threshold = 0.5)
    println(s"minhashClusters=${mh.select(col("rep")).distinct().count()}")
    val quality = TextAnalysis.qualityScore(TextAnalysis.langId(docs))
    quality.select(col("doc_id"), col("lang_pred"), col("n_tokens"), col("quality")).show(5, false)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val knn = Ann.bruteForceKnn(emb, emb.limit(5), 3)
    println("knn (5 queries, k=3):"); knn.show(15, false)
    val ivf = Ann.ivfKnn(emb, emb.limit(5), 3, nlist = 16, nprobe = 4)
    val agree = knn.filter(col("rank") === 1).toDF("q", "bf", "s", "r")
      .join(ivf.filter(col("rank") === 1).toDF("q", "ivf", "s2", "r2"), Seq("q"))
      .filter(col("bf") === col("ivf")).count()
    println(s"ivf top1 agreement with brute force: $agree/5")

    // ---- typed Pregel runtime on real data: SSSP + KMeans ----------------
    import graft.algos.compute.BasicAlgorithms
    import graft.algos.compute.AdvancedAlgorithms.{KMeans, KMeansValue}
    import graft.pregel.Pregel
    val sc = spark.sparkContext
    val treeEdges = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey")).filter(col("c_custkey") >= 2)
      .collect().map(_.getLong(0))
    val eRdd = sc.parallelize(treeEdges.toSeq.map(c => (c, (c / 2, (c % 7 + 1).toDouble))))
    val vRdd = sc.parallelize((treeEdges :+ 1L).distinct.toSeq.map(i => (i, Double.PositiveInfinity)))
    val sssp = Pregel.run(spark, new BasicAlgorithms.Sssp(1L),
      vRdd, eRdd.map { case (s, (d, w)) => (d, (s, w)) }, // parent→child for reachability
      maxIterations = 30)
    println(s"pregel sssp: state=${sssp.state} supersteps=${sssp.superstep} " +
      s"reached=${sssp.vertices.filter(_._2 < Double.PositiveInfinity).count()}")
    val pts = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(200)
      .collect().map(r => (r.getLong(0),
        KMeansValue(r.getSeq[Float](1).map(_.toDouble).toVector, 0)))
    val km = Pregel.run(spark,
      new KMeans(k = 4, initialCenters = Some(pts.take(4).map(_._2.coords).toSeq)),
      sc.parallelize(pts.toSeq), sc.parallelize(Seq.empty[(Long, (Long, Double))]),
      maxIterations = 50)
    val sizes = km.vertices.map(_._2.clusterId).countByValue()
    println(s"pregel kmeans: state=${km.state} clusters=$sizes")

    // ---- named-algorithm registry (GraphAlgorithmType analog) ------------
    import graft.algos.compute.AlgorithmRegistry
    // reference WCC semantics need the undirected edge set (see Wcc scaladoc)
    val regEdges = eRdd.flatMap { case (s, (d, w)) => Seq((s, d, w), (d, s, w)) }
    val regWcc = AlgorithmRegistry.run(spark, "wcc", regEdges).collect().toMap
    val regPr = AlgorithmRegistry.run(spark, "pagerank", regEdges,
      Map("tolerance" -> 0.001, "resetProbability" -> 0.15), maxIterations = 20)
    println(s"registry wcc components=${regWcc.values.toSet.size} " +
      s"pagerank rows=${regPr.count()}")

    // ---- skew-aware join on the real skewed fact table -------------------
    import graft.core.SkewUtils
    val hot = SkewUtils.keyHistogram(li, "l_suppkey", 1).head()
    val plainN = li.join(spark.read.parquet(s"$sfDir/supplier.parquet"),
      col("l_suppkey") === col("s_suppkey")).count()
    val saltedN = SkewUtils.saltedJoin(li,
      spark.read.parquet(s"$sfDir/supplier.parquet").withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey", buckets = 8).count()
    println(s"skew: hottest supplier=${hot.get(0)} cnt=${hot.getLong(1)} " +
      s"plainJoin=$plainN saltedJoin=$saltedN equal=${plainN == saltedN}")
    spark.stop()
  }
}
