package graft.streaming

import scala.collection.mutable

/**
 * Mergeable graph summaries for single-pass streaming analytics — ports of
 * the reference's streaming/summaries (Gelly-Streaming lineage):
 * DisjointSet.java:29-185, Candidates.java:30-221, AdjacencyListGraph.java:35-196.
 *
 * Each is a commutative-ish monoid: fold edges in per partition/window, merge
 * partials — exactly the contract of a Spark `Aggregator[IN, BUF, OUT]`.
 */

/** Union-find with union-by-rank + path compression (DisjointSet.java). */
class DisjointSet[R] extends Serializable {
  private[streaming] val matches = mutable.HashMap.empty[R, R]
  private[streaming] val ranks = mutable.HashMap.empty[R, Int]

  def size: Int = matches.size

  private def makeSet(e: R): Unit = { matches(e) = e; ranks(e) = 0 }

  def find(e: R): Option[R] = matches.get(e) match {
    case None => None
    case Some(parent) if parent == e => Some(parent)
    case Some(parent) =>
      val root = find(parent).get
      if (root != parent) matches(e) = root // path compression
      Some(root)
  }

  def union(e1: R, e2: R): Unit = {
    if (!matches.contains(e1)) makeSet(e1)
    if (!matches.contains(e2)) makeSet(e2)
    val root1 = find(e1).get
    val root2 = find(e2).get
    if (root1 != root2) {
      val d1 = ranks(root1); val d2 = ranks(root2)
      if (d1 > d2) matches(root2) = root1
      else if (d1 < d2) matches(root1) = root2
      else { matches(root2) = root1; ranks(root1) = d1 + 1 }
    }
  }

  /** Non-destructive merge (DisjointSet.merge: bigger-set absorbs smaller
    * at the call site; here symmetric fold of the other's parent links). */
  def merge(other: DisjointSet[R]): DisjointSet[R] = {
    val result = copy()
    other.matches.foreach { case (k, v) => result.union(k, v) }
    result
  }

  def mergeInPlace(other: DisjointSet[R]): this.type = {
    other.matches.foreach { case (k, v) => union(k, v) }
    this
  }

  def copy(): DisjointSet[R] = {
    val r = new DisjointSet[R]
    r.matches ++= matches; r.ranks ++= ranks
    r
  }

  /** element → component root, fully path-compressed. */
  def components: Map[R, R] = matches.keys.map(k => k -> find(k).get).toMap
}

/** Signed vertex for two-coloring (streaming/utils/SignedVertex.java:23-62). */
case class SignedVertex(vertex: Long, sign: Boolean) {
  def reverse: SignedVertex = SignedVertex(vertex, !sign)
}

/**
 * Two-coloring candidate forest for streaming bipartiteness
 * (Candidates.java:30-221): component id → (vertex → signed vertex).
 * `success=false` is the absorbing "not bipartite" state.
 */
class Candidates(val success: Boolean) extends Serializable {
  // HashMaps (not TreeMaps): the buffer is Kryo-serialized between Spark's
  // partial and final aggregation, and Kryo does not roundtrip scala
  // mutable.TreeMap's comparator — iteration order is imposed explicitly
  // (sorted keys) wherever the reference relied on TreeMap order.
  private[streaming] val map = mutable.HashMap.empty[Long, mutable.HashMap[Long, SignedVertex]]

  // vertex → component index, maintained by add(): makes the per-edge
  // in-place fold O(α) instead of copying the whole forest per edge
  private[streaming] val vertexComp = mutable.HashMap.empty[Long, Long]

  private def add(component: Long, v: SignedVertex): Boolean = {
    val vertices = map.getOrElseUpdate(component, mutable.HashMap.empty)
    vertices.get(v.vertex) match {
      case Some(stored) if stored.sign != v.sign => false
      case _ => vertices(v.vertex) = v; vertexComp(v.vertex) = component; true
    }
  }

  /** In-place edge fold (the Aggregator.reduce fast path): two-color the
    * edge's endpoints, merging components smaller-into-larger with
    * orientation. Returns false when the edge closes an odd cycle. */
  def addEdge(src: Long, dst: Long): Boolean = {
    (vertexComp.get(src), vertexComp.get(dst)) match {
      case (None, None) =>
        add(src, SignedVertex(src, sign = true)) &&
          add(src, SignedVertex(dst, sign = false))
      case (Some(cs), None) =>
        add(cs, SignedVertex(dst, !map(cs)(src).sign))
      case (None, Some(cd)) =>
        add(cd, SignedVertex(src, !map(cd)(dst).sign))
      case (Some(cs), Some(cd)) if cs == cd =>
        map(cs)(src).sign != map(cs)(dst).sign
      case (Some(cs), Some(cd)) =>
        val (big, small) = if (map(cs).size >= map(cd).size) (cs, cd) else (cd, cs)
        val (bigV, smallV) = if (big == cs) (src, dst) else (dst, src)
        // endpoints must end with opposite signs
        val needReverse = map(big)(bigV).sign == map(small)(smallV).sign
        val moved = map(small).values.toSeq
        map.remove(small)
        moved.forall(v => add(big, if (needReverse) v.reverse else v))
    }
  }

  private def addAll(component: Long, vs: Iterable[SignedVertex]): Boolean =
    vs.forall(add(component, _))

  def copy(): Candidates = {
    val c = new Candidates(success)
    map.foreach { case (k, vs) => vs.values.foreach(c.add(k, _)) }
    c
  }

  /** Merge two candidate forests (Candidates.merge, Candidates.java:80-135). */
  def merge(input: Candidates): Candidates = {
    if (!input.success || !success) return Candidates.fail
    val result = copy()
    for ((inKey, inComp) <- input.map.toSeq.sortBy(_._1)) {
      val mergeWith = mutable.ArrayBuffer.empty[Long]
      for ((selfKey, selfComp) <- result.map.toSeq.sortBy(_._1)) {
        val sameKeys = inComp.keySet == selfComp.keySet
        if (!sameKeys && inComp.keys.exists(selfComp.contains) && !mergeWith.contains(selfKey))
          mergeWith += selfKey
      }
      if (mergeWith.isEmpty) {
        if (!result.addAll(inKey, inComp.values)) return Candidates.fail
      } else {
        val sorted = mergeWith.sorted
        var firstKey = sorted.head
        if (!result.mergeComponent(input, inKey, firstKey)) return Candidates.fail
        firstKey = math.min(inKey, firstKey)
        sorted.tail.foreach { k =>
          if (!result.mergeComponent(result, k, firstKey)) return Candidates.fail
          result.map.remove(k)
        }
      }
    }
    result
  }

  /** Candidates.merge(input, inputKey, selfKey) (Candidates.java:137-190) */
  private def mergeComponent(input: Candidates, inputKey: Long, selfKey: Long): Boolean = {
    val inputComponent = input.map(inputKey)
    val selfComponent = map(selfKey)
    val mergeBy = inputComponent.keys.toSeq.sorted.filter(selfComponent.contains)
    if (mergeBy.isEmpty) {
      // disjoint components chained through a third: keep vertices (the
      // reference would NPE here; unreachable in its single merge path)
      val commonKey = math.min(inputKey, selfKey)
      return inputComponent.values.toSeq.forall(add(commonKey, _))
    }
    val reversed = inputComponent(mergeBy.head).sign != selfComponent(mergeBy.head).sign
    for (v <- mergeBy) {
      val ok =
        if (reversed) inputComponent(v).sign != selfComponent(v).sign
        else inputComponent(v).sign == selfComponent(v).sign
      if (!ok) return false
    }
    val commonKey = math.min(inputKey, selfKey)
    inputComponent.values.toSeq.forall { v =>
      add(commonKey, if (reversed) v.reverse else v)
    }
  }

  /** (isBipartite, componentId → vertex-sign groups). */
  def groups: Map[Long, Map[Long, Boolean]] =
    map.map { case (k, vs) => k -> vs.map { case (id, sv) => id -> sv.sign }.toMap }.toMap

  override def toString: String = s"($success,$map)"
}
object Candidates {
  def fail: Candidates = new Candidates(false)
  def of(src: Long, dst: Long): Candidates = {
    val c = new Candidates(true)
    c.add(src, SignedVertex(src, sign = true))
    c.add(src, SignedVertex(dst, sign = false))
    c
  }
}

/**
 * Adjacency summary with bounded-BFS for k-spanner construction
 * (AdjacencyListGraph.java:35-196): an edge is added only if its endpoints
 * are not already within k hops.
 */
class AdjacencyListGraph(val factorK: Int) extends Serializable {
  private[streaming] val adjacency = mutable.HashMap.empty[Long, mutable.HashSet[Long]]

  def size: Int = adjacency.size

  def addEdge(src: Long, dst: Long): Unit = {
    adjacency.getOrElseUpdate(src, mutable.HashSet.empty) += dst
    adjacency.getOrElseUpdate(dst, mutable.HashSet.empty) += src
  }

  /** true iff trg is reachable from src within factorK hops
    * (AdjacencyListGraph.boundedBFS, :91-126). */
  def boundedBFS(src: Long, trg: Long): Boolean = {
    if (!adjacency.contains(src)) return false
    val visited = mutable.HashSet(src)
    val queue = mutable.Queue.empty[(Long, Int)]
    adjacency(src).foreach(n => queue.enqueue((n, 1)))
    while (queue.nonEmpty) {
      val (id, level) = queue.head
      if (id == trg) return true
      queue.dequeue()
      visited += id
      if (level < factorK)
        adjacency(id).foreach(n => if (!visited.contains(n)) queue.enqueue((n, level + 1)))
    }
    false
  }

  /** Add edge only if not already k-spanned. */
  def offer(src: Long, dst: Long): Unit =
    if (!boundedBFS(src, dst)) addEdge(src, dst)

  def copy(): AdjacencyListGraph = {
    val g = new AdjacencyListGraph(factorK)
    adjacency.foreach { case (k, vs) => g.adjacency(k) = vs.clone() }
    g
  }

  /** merge (AdjacencyListGraph.merge, :128-138) */
  def merge(other: AdjacencyListGraph): AdjacencyListGraph = {
    val result = copy()
    for ((src, ns) <- other.adjacency; trg <- ns)
      if (!result.boundedBFS(src, trg)) result.addEdge(src, trg)
    result
  }

  def edges: Set[(Long, Long)] =
    adjacency.iterator.flatMap { case (s, ns) =>
      ns.iterator.filter(s < _).map(d => (s, d))
    }.toSet
}
