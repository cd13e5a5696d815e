package graft.algos.compute

import scala.collection.mutable

import graft.pregel.{Aggregators, ComputeFunction, Pregel}
import graft.pregel.Pregel.{Callback, MasterCallback, OutEdge}

/**
 * Ports of the reference's advanced vertex-centric algorithms: LCC (4-phase
 * protocol), SybilRank (phase-dispatched power iteration), max-b-matching
 * (edge-state mutation), K-means and semi-clustering (aggregator-driven).
 */
object AdvancedAlgorithms {

  // =========================================================================
  // Local clustering coefficient — 4-superstep protocol
  // (reference library/LocalClusteringCoefficient.java:34-155)
  // =========================================================================

  case class LccMessage(source: Long, edgeList: Array[Long], matchCount: Int)

  class Lcc extends ComputeFunction[Long, Double, Double, LccMessage] {
    def compute(superstep: Int, id: Long, value: Double, messages: Iterable[LccMessage],
                edges: Iterable[OutEdge[Long, Double]],
                cb: Callback[Long, Double, Double, LccMessage]): Unit = superstep match {
      case 0 =>
        val m = LccMessage(id, null, 0)
        edges.foreach(e => cb.sendMessageTo(e.target, m))
      case 1 =>
        val neighbors = mutable.Set.empty[Long]
        edges.foreach(e => neighbors += e.target)
        messages.foreach(m => if (m.source != id) neighbors += m.source)
        if (neighbors.size > 1) {
          val inquiry = LccMessage(id, neighbors.toArray, 0)
          neighbors.foreach(n => cb.sendMessageTo(n, inquiry))
        }
        cb.setNewVertexValue(neighbors.size.toDouble)
      case 2 =>
        val neighbors = edges.map(_.target).toSet
        messages.foreach { m =>
          val matches = m.edgeList.count(neighbors.contains)
          cb.sendMessageTo(m.source, LccMessage(0L, null, matches))
        }
      case _ =>
        val d = value
        if (d < 2) cb.setNewVertexValue(0.0)
        else {
          val matches = messages.map(_.matchCount.toLong).sum
          cb.setNewVertexValue(matches / d / (d - 1))
        }
        cb.voteToHalt()
    }
  }

  // =========================================================================
  // SybilRank (reference library/SybilRank.java:35-277): trust-seeded power
  // iteration, phases dispatched on superstep; degree = Σ edge weights;
  // halts after 2 + ceil(multiplier · log10(N)) supersteps.
  // =========================================================================

  case class SybilValue(rank: Double, isTrusted: Boolean)

  class SybilRank(totalTrustParameter: Option[Double] = None,
                  iterationMultiplier: Int = 1)
      extends ComputeFunction[Long, SybilValue, Double, Double] {
    import SybilRank._

    override def init(configs: Map[String, Any], cb: MasterCallback): Unit = {
      cb.registerAggregator(NumTrusted, Aggregators.LongSum, persistent = true)
      cb.registerAggregator(NumVertices, Aggregators.LongSum, persistent = true)
    }

    override def masterCompute(superstep: Int, cb: MasterCallback): Unit = {
      if (superstep > 0) {
        val n = math.max(1L, cb.getAggregatedValue[Long](NumVertices))
        val maxPowerIterations = math.ceil(iterationMultiplier * math.log10(n.toDouble)).toInt
        if (superstep >= 2 + maxPowerIterations) cb.haltComputation()
      }
    }

    private def degree(edges: Iterable[OutEdge[Long, Double]]): Double =
      edges.iterator.map(_.value).sum

    def compute(superstep: Int, id: Long, value: SybilValue, messages: Iterable[Double],
                edges: Iterable[OutEdge[Long, Double]],
                cb: Callback[Long, SybilValue, Double, Double]): Unit = {
      if (superstep == 0) {
        // TrustAggregation + VertexCount (SybilRank.java:205-213)
        if (value.isTrusted) cb.aggregate(NumTrusted, 1L)
        cb.aggregate(NumVertices, 1L)
      } else if (superstep == 1) {
        // Initializer (SybilRank.java:91-127)
        val totalTrust = totalTrustParameter
          .getOrElse(cb.getAggregatedValue[Long](NumVertices).toDouble)
        val rank =
          if (value.isTrusted) totalTrust / cb.getAggregatedValue[Long](NumTrusted)
          else 0.0
        cb.setNewVertexValue(SybilValue(rank, value.isTrusted))
        val d = degree(edges)
        edges.foreach(e => cb.sendMessageTo(e.target, rank * (e.value / d)))
      } else {
        // power iteration (SybilRank.java:131-168)
        val newRank = messages.sum
        val d = degree(edges)
        edges.foreach(e => cb.sendMessageTo(e.target, newRank * (e.value / d)))
        cb.setNewVertexValue(SybilValue(newRank / d, value.isTrusted))
      }
    }
  }
  object SybilRank {
    val NumTrusted = "agg.num.trusted"
    val NumVertices = "vertex.count.aggregator"
  }

  // =========================================================================
  // Greedy distributed max-b-matching (reference
  // library/maxbmatching/MaxBMatching.java:43-202): VV = remaining capacity,
  // EV = (weight, state ∈ DEFAULT/PROPOSED/INCLUDED/REMOVED); per round each
  // vertex proposes its top-capacity edges by weight, intersection of
  // proposals becomes INCLUDED, saturated vertices remove leftover edges.
  // The one algorithm whose primary output is mutated EDGE state.
  //
  // Deliberate divergences from the reference (both are execution artifacts
  // there, not algorithm semantics): (a) the reference's proposal heap is a
  // TreeSet ordered ONLY by weight, which silently drops same-weight edges
  // (MaxBMatching.java:79-88) — we keep them with a deterministic (weight
  // desc, target asc) order; (b) the reference's published golden violates
  // the capacity constraint (vertex 5 ends with 3 INCLUDED edges at b=2,
  // MaxBMatchingTest.java:108) under its async barrier — our synchronous
  // execution always respects capacity.
  // =========================================================================

  object MbmState extends Enumeration { val Default, Proposed, Included, Removed = Value }
  case class MbmEdge(weight: Double, state: MbmState.Value)
  case class MbmMessage(id: Long, state: MbmState.Value)

  class MaxBMatching extends ComputeFunction[Long, Int, MbmEdge, MbmMessage] {
    def compute(superstep: Int, id: Long, value: Int, messages: Iterable[MbmMessage],
                edges: Iterable[OutEdge[Long, MbmEdge]],
                cb: Callback[Long, Int, MbmEdge, MbmMessage]): Unit = {
      require(value >= 0, s"Capacity should never be negative: $id=$value")
      if (value == 0) {
        removeVertex(id, edges, cb)
        cb.voteToHalt()
      } else {
        var capacity = value
        if (superstep > 0) {
          capacity = processUpdates(id, value, messages, edges, cb)
          cb.setNewVertexValue(capacity)
        }
        if (capacity > 0) sendUpdates(id, capacity, edges, cb)
      }
    }

    private def sendUpdates(id: Long, capacity: Int,
                            edges: Iterable[OutEdge[Long, MbmEdge]],
                            cb: Callback[Long, Int, MbmEdge, MbmMessage]): Unit = {
      // top-capacity available edges by weight (desc), deterministic tie on target
      val available = edges.iterator
        .filter(e => e.value.state == MbmState.Default || e.value.state == MbmState.Proposed)
        .toSeq.sortBy(e => (-e.value.weight, e.target)).take(capacity)
      if (available.isEmpty) {
        cb.voteToHalt()
      } else {
        available.foreach { e =>
          cb.setNewEdgeValue(e.target, MbmEdge(e.value.weight, MbmState.Proposed))
          cb.sendMessageTo(e.target, MbmMessage(id, MbmState.Proposed))
        }
      }
    }

    private def processUpdates(id: Long, value: Int, messages: Iterable[MbmMessage],
                               edges: Iterable[OutEdge[Long, MbmEdge]],
                               cb: Callback[Long, Int, MbmEdge, MbmMessage]): Int = {
      val edgeValues = edges.iterator.map(e => e.target -> e.value).toMap
      var numIncluded = 0
      val toRemove = mutable.Set.empty[Long]
      messages.foreach { msg =>
        edgeValues.get(msg.id).foreach { ev =>
          if (msg.state == MbmState.Proposed && ev.state == MbmState.Proposed) {
            cb.setNewEdgeValue(msg.id, MbmEdge(ev.weight, MbmState.Included))
            numIncluded += 1
          } else if (msg.state == MbmState.Removed) {
            toRemove += msg.id
          }
        }
      }
      toRemove.foreach(cb.removeEdge)
      value - numIncluded
    }

    private def removeVertex(id: Long, edges: Iterable[OutEdge[Long, MbmEdge]],
                             cb: Callback[Long, Int, MbmEdge, MbmMessage]): Unit = {
      edges.foreach { e =>
        if (e.value.state == MbmState.Default) {
          cb.sendMessageTo(e.target, MbmMessage(id, MbmState.Removed))
          cb.removeEdge(e.target)
        }
      }
    }
  }

  // =========================================================================
  // K-means (reference library/clustering/KMeansClustering.java:42-322):
  // edge-less; centers live in aggregators, master recomputes means and halts
  // on drift ≤ 1e-3 or maxIterations. Reference's random init is
  // nondeterministic under distribution — we pin via `initialCenters`
  // (= TEST_INITIAL_CENTERS config, KMeansClusteringTest.java) or take the
  // points of the k smallest vertex ids (deterministic; documented deviation).
  // =========================================================================

  case class KMeansValue(coords: Vector[Double], clusterId: Int)

  class KMeans(k: Int, maxIterations: Int = 100,
               initialCenters: Option[Seq[Vector[Double]]] = None)
      extends ComputeFunction[Long, KMeansValue, Double, Long] {
    import KMeans._

    private var current: Array[Vector[Double]] = Array.fill(k)(Vector.empty)

    override def init(configs: Map[String, Any], cb: MasterCallback): Unit = {
      cb.registerAggregator(InitialCenters, new Aggregators.VectorConcat[(Long, Vector[Double])])
      (0 until k).foreach { i =>
        cb.registerAggregator(center(i), Aggregators.DoubleVectorSum)
        cb.registerAggregator(count(i), Aggregators.LongSum)
      }
    }

    override def masterCompute(superstep: Int, cb: MasterCallback): Unit = {
      if (superstep == 1) {
        val centers: Seq[Vector[Double]] = initialCenters.getOrElse {
          cb.getAggregatedValue[Vector[(Long, Vector[Double])]](InitialCenters)
            .sortBy(_._1).take(k).map(_._2)
        }
        (0 until k).foreach { i =>
          cb.setAggregatedValue(center(i), centers(i))
          current(i) = centers(i)
        }
      } else if (superstep > 1) {
        val newCenters = (0 until k).map { i =>
          val sums = cb.getAggregatedValue[Vector[Double]](center(i))
          val n = cb.getAggregatedValue[Long](count(i))
          if (n > 0) sums.map(_ / n) else current(i)
        }.toArray
        val drift = current.zip(newCenters).map { case (a, b) => euclidean(a, b) }.max
        if (superstep > maxIterations || drift <= 1e-3) {
          cb.haltComputation()
        } else {
          (0 until k).foreach(i => cb.setAggregatedValue(center(i), newCenters(i)))
          current = newCenters
        }
      }
    }

    // per-task center cache: resolved once per superstep per partition
    // instead of per vertex (the hook state is task-local)
    @transient private var taskCenters: Array[Vector[Double]] = _
    override def preSuperstep(superstep: Int, aggregates: Pregel.HookContext): Unit =
      taskCenters =
        if (superstep == 0) null
        else Array.tabulate(k)(i => aggregates(center(i)).asInstanceOf[Vector[Double]])

    def compute(superstep: Int, id: Long, value: KMeansValue, messages: Iterable[Long],
                edges: Iterable[OutEdge[Long, Double]],
                cb: Callback[Long, KMeansValue, Double, Long]): Unit = {
      if (superstep == 0) {
        if (initialCenters.isEmpty)
          cb.aggregate(InitialCenters, Vector((id, value.coords)))
      } else {
        val centers: IndexedSeq[Vector[Double]] =
          if (taskCenters != null) scala.collection.immutable.ArraySeq.unsafeWrapArray(taskCenters)
          else (0 until k).map(i => cb.getAggregatedValue[Vector[Double]](center(i)))
        var closest = 0; var best = Double.MaxValue; var i = 0
        while (i < k) {
          val d = euclidean(centers(i), value.coords)
          if (d < best) { best = d; closest = i }
          i += 1
        }
        cb.aggregate(center(closest), value.coords)
        cb.aggregate(count(closest), 1L)
        cb.setNewVertexValue(KMeansValue(value.coords, closest))
      }
    }
  }
  object KMeans {
    val InitialCenters = "kmeans.initial.centers"
    def center(i: Int) = s"center.aggr.prefixC_$i"
    def count(i: Int) = s"assigned.points.prefixC_$i"
    def euclidean(a: Vector[Double], b: Vector[Double]): Double = {
      val ia = a.iterator; val ib = b.iterator
      var s = 0.0
      while (ia.hasNext && ib.hasNext) { val d = ia.next() - ib.next(); s += d * d }
      math.sqrt(s)
    }
  }

  // =========================================================================
  // Semi-clustering (Pregel paper §SIGMOD'10; reference
  // library/clustering/SemiClustering.java:51-370): VV = top-maxClusters set
  // of SemiCluster(score = (I − f·B) / (V(V−1)/2)).
  // =========================================================================

  case class SemiCluster(vertices: Set[Long], score: Double,
                         innerScore: Double, boundaryScore: Double) {
    def size: Int = vertices.size
    /** reference SemiCluster.addVertex (SemiClustering.java:244-270) */
    def add(vertexId: Long, edges: Iterable[OutEdge[Long, Double]],
            scoreFactor: Double): SemiCluster = {
      if (vertices.contains(vertexId)) this
      else {
        val vs = vertices + vertexId
        if (vs.size == 1) {
          SemiCluster(vs, 0.0, innerScore, edges.iterator.map(_.value).sum)
        } else {
          var inner = innerScore
          var boundary = boundaryScore
          edges.foreach { e =>
            if (vs.contains(e.target)) { inner += e.value; boundary -= e.value }
            else boundary += e.value
          }
          val s = (inner - scoreFactor * boundary) / (vs.size * (vs.size - 1) / 2.0)
          SemiCluster(vs, s, inner, boundary)
        }
      }
    }
  }
  object SemiCluster {
    val empty: SemiCluster = SemiCluster(Set.empty, 1.0, 0.0, 0.0)
    /** ascending by score; distinct clusters never compare equal
      * (ClusterScoreComparator, SemiClustering.java:198-219) */
    implicit val ordering: Ordering[SemiCluster] = (a: SemiCluster, b: SemiCluster) => {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c
      else if (a == b) 0
      else {
        // deterministic tiebreak on vertex sets to keep TreeSet-like distinctness
        val sa = a.vertices.toSeq.sorted.mkString(",")
        val sb = b.vertices.toSeq.sorted.mkString(",")
        sa.compareTo(sb)
      }
    }
  }

  class SemiClustering(iterations: Int = 10, maxClusters: Int = 2,
                       clusterCapacity: Int = 4, scoreFactor: Double = 0.5)
      extends ComputeFunction[Long, Set[SemiCluster], Double, Set[SemiCluster]] {

    private def topK(s: collection.SortedSet[SemiCluster]): Set[SemiCluster] =
      s.drop(math.max(0, s.size - maxClusters)).toSet // keep HIGHEST scores

    def compute(superstep: Int, id: Long, value: Set[SemiCluster],
                messages: Iterable[Set[SemiCluster]],
                edges: Iterable[OutEdge[Long, Double]],
                cb: Callback[Long, Set[SemiCluster], Double, Set[SemiCluster]]): Unit = {
      if (superstep == 0) {
        val mine = SemiCluster.empty.add(id, edges, scoreFactor)
        val clusterList = Set(mine)
        cb.setNewVertexValue(clusterList)
        edges.foreach(e => cb.sendMessageTo(e.target, clusterList))
        cb.voteToHalt()
      } else if (superstep == iterations) {
        cb.voteToHalt()
      } else {
        val unioned = mutable.SortedSet.empty[SemiCluster]
        val newValue = mutable.SortedSet.empty[SemiCluster]
        messages.foreach { clusterSet =>
          unioned ++= clusterSet
          clusterSet.foreach { cluster =>
            val contains = cluster.vertices.contains(id)
            if (!contains && cluster.size < clusterCapacity) {
              val extended = cluster.add(id, edges, scoreFactor)
              unioned += extended
              newValue += extended
            } else if (contains) {
              newValue += cluster
            }
          }
        }
        val newSet = topK(newValue)
        cb.setNewVertexValue(newSet)
        val send = topK(unioned)
        edges.foreach(e => cb.sendMessageTo(e.target, send))
        cb.voteToHalt()
      }
    }
  }
}
