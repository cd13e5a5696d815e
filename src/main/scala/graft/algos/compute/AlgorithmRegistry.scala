package graft.algos.compute

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

import graft.pregel.Pregel

/**
 * Named-algorithm registry — the reference's GraphAlgorithmType enum
 * (library/GraphAlgorithmType.java:33-117): algorithm key → compute function
 * + initial vertex value (GraphAlgorithmType.initialVertexValueMapper:95-116)
 * + initial message, runnable from a bare weighted-edge RDD. Serdes disappear
 * (Spark encoders); the REST surface's "run algorithm X with config Y" verb
 * maps to `AlgorithmRegistry.run(...)`.
 */
object AlgorithmRegistry {

  val algorithms: Set[String] =
    Set("bfs", "lcc", "lp", "mssp", "pagerank", "sssp", "svdpp", "wcc")

  /** Initial vertex values per algorithm (GraphAlgorithmType.java:95-116). */
  def initialVertexValue(algorithm: String, id: Long): Any = algorithm match {
    case "bfs"      => Long.MaxValue
    case "sssp"     => Double.PositiveInfinity
    case "pagerank" => (0.0, 0.0)
    case "wcc"      => id
    case "lp"       => id
    case "lcc"      => 1.0
    case "mssp"     => Map.empty[Long, Double]
    case "svdpp"    => Cf.SvdppValue(0f, Array.empty[Float], Array.empty[Float])
    case other      => throw new IllegalArgumentException(s"Unsupported algorithm type: $other")
  }

  /** Run outcome with the reference's GraphAlgorithmState fields
    * (GraphAlgorithmState.java:28-99): result + superstep count + running
    * time + terminal state + final aggregates (status.getAggregates — the
    * svdpp-predict tool reads the overall-rating/edge-count aggregators from
    * it) — the REST layer's state/result/predict verbs read it. */
  case class Outcome(vertices: RDD[(Long, Any)], superstep: Int,
                     runningTimeMs: Long, state: String,
                     aggregates: Map[String, Any] = Map.empty)

  /**
   * Run a named algorithm on a weighted edge RDD (src, dst, weight),
   * vertex set derived from edge endpoints (KGraph.fromEdges semantics).
   * Returns (id, value) with algorithm-specific value types stringified by
   * the caller as needed. Configs mirror the reference's config keys:
   * srcVertexId, landmarkVertexIds, tolerance, resetProbability.
   */
  def run(spark: SparkSession, algorithm: String,
          edges: RDD[(Long, Long, Double)],
          configs: Map[String, Any] = Map.empty,
          maxIterations: Int = 30): RDD[(Long, Any)] =
    runDetailed(spark, algorithm, edges, configs, maxIterations).vertices

  def runDetailed(spark: SparkSession, algorithm: String,
                  edges: RDD[(Long, Long, Double)],
                  configs: Map[String, Any] = Map.empty,
                  maxIterations: Int = 30): Outcome = {
    val e = edges.map { case (s, d, w) => (s, (d, w)) }.cache()
    val vertexIds = edges.flatMap(t => Iterator(t._1, t._2)).distinct()

    def verts[V](init: Long => V): RDD[(Long, V)] = vertexIds.map(id => (id, init(id)))
    def srcId: Long = configs("srcVertexId").asInstanceOf[Number].longValue()
    def outcome[VV, EV](r: Pregel.Result[Long, VV, EV]): Outcome =
      Outcome(r.vertices.map { case (k, v) => (k, v: Any) },
        r.superstep, r.runningTimeMs, r.state, r.aggregates)

    algorithm match {
      case "bfs" =>
        outcome(Pregel.run(spark, new BasicAlgorithms.Bfs(srcId),
          verts(_ => Long.MaxValue), e, maxIterations = maxIterations))
      case "sssp" =>
        outcome(Pregel.run(spark, new BasicAlgorithms.Sssp(srcId),
          verts(_ => Double.PositiveInfinity), e, maxIterations = maxIterations))
      case "wcc" =>
        outcome(Pregel.run(spark, new BasicAlgorithms.Wcc,
          verts(id => id), e, maxIterations = maxIterations))
      case "lp" =>
        outcome(Pregel.run(spark, new BasicAlgorithms.Lp,
          verts(id => id), e, maxIterations = maxIterations))
      case "lcc" =>
        outcome(Pregel.run(spark, new AdvancedAlgorithms.Lcc,
          verts(_ => 1.0), e, maxIterations = maxIterations))
      case "mssp" =>
        val landmarks = configs("landmarkVertexIds") match {
          case s: Set[_] => s.map(_.asInstanceOf[Number].longValue())
          case s: Seq[_] => s.map(_.asInstanceOf[Number].longValue()).toSet
        }
        outcome(Pregel.run(spark, new BasicAlgorithms.Mssp(landmarks),
          verts(_ => Map.empty[Long, Double]), e, maxIterations = maxIterations))
      case "pagerank" =>
        val tol = configs.getOrElse("tolerance", 0.0001).asInstanceOf[Number].doubleValue()
        val reset = configs.getOrElse("resetProbability", 0.15).asInstanceOf[Number].doubleValue()
        val src = configs.get("srcVertexId").map(_.asInstanceOf[Number].longValue())
        outcome(Pregel.run(spark, new BasicAlgorithms.PageRank(tol, reset, src),
          verts(_ => (0.0, 0.0)), e,
          initialMessage = Some(BasicAlgorithms.PageRank.initialMessage(reset)),
          maxIterations = maxIterations))
      case "svdpp" =>
        // bipartite ratings: input edges are (user, item, rating); CfId keys
        // collapse to a signed Long in the result (user → id, item → −id−1)
        // since the registry surface is keyed by Long like the reference's
        // parsed "(id, type)" wire format (GraphAlgorithmType.java:66-93)
        val dim = configs.getOrElse("vector.size", 8).asInstanceOf[Number].intValue()
        val iters = configs.getOrElse("iterations", 3).asInstanceOf[Number].intValue()
        val seed = configs.get("random.seed").map(_.asInstanceOf[Number].longValue())
        val ratings = edges.map { case (u, i, r) =>
          (Cf.CfId.user(u), (Cf.CfId.item(i), r.toFloat)) }
        val ids = ratings.flatMap(t => Iterator(t._1, t._2._1)).distinct()
          .map(id => (id, Cf.SvdppValue(0f, Array.empty[Float], Array.empty[Float])))
        val r = Pregel.run(spark, new Cf.Svdpp(dim = dim, iterations = iters, randomSeed = seed),
          ids, ratings, maxIterations = maxIterations)
        Outcome(r.vertices.map { case (id, v) =>
            (if (id.typ == 0) id.id else -id.id - 1, v: Any) },
          r.superstep, r.runningTimeMs, r.state, r.aggregates)
      case other =>
        throw new IllegalArgumentException(s"Unsupported algorithm type: $other")
    }
  }
}
