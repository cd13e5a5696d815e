package graft.pregel

import scala.collection.mutable
import scala.reflect.ClassTag

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/**
 * Pregel (BSP vertex-centric) runtime — the Spark replacement for the
 * reference's Kafka/ZooKeeper machinery (pregel/PregelComputation.java,
 * pregel/PregelGraphAlgorithm.java:44-226).
 *
 * The reference needs ~2,000 LoC of topics, RocksDB stores, ZK leader latches
 * and offset-sync barriers because Kafka Streams has no synchronous stages.
 * Spark's stage boundary IS the superstep barrier, so the whole runtime is a
 * driver loop:
 *
 *   per superstep: inbox ⋈ state ⋈ adjacency → compute per vertex →
 *   (new state, outgoing messages, edge mutations, aggregator contributions)
 *
 * Scale design:
 *  - state / adjacency / inbox are all hash-partitioned on the vertex key with
 *    the SAME partitioner, so the per-superstep 3-way cogroup is narrow (zero
 *    shuffle); the only shuffle per superstep is grouping outgoing messages by
 *    destination — the unavoidable one (it replaces the reference's workSet
 *    topic round-trip through Kafka brokers, PregelComputation.java:797-801).
 *  - message lists per destination are combined map-side (reduceByKey-style
 *    append) — the reference ships full lists with no combiner
 *    (PregelComputation.java:751-753).
 *  - lineage is cut with localCheckpoint every `checkpointInterval` supersteps
 *    (the RocksDB solution-set store analog).
 *
 * This layer keeps the reference's exact user contract — ComputeFunction with
 * voteToHalt, registered (persistent) aggregators, masterCompute, and in-flight
 * edge mutation (ComputeFunction.java:183-268) — which GraphX's Pregel cannot
 * express. Built-in analytics with fixed schemas use the DataFrame-native loops
 * in graft.algos instead (Catalyst/Tungsten path).
 *
 * It is implemented on pair-RDDs rather than Dataset[T] deliberately: K/VV/EV/M
 * are arbitrary user types (the reference serializes them with Kryo too,
 * utils/KryoSerde.java:56), per-vertex compute is imperative, and partitioner
 * reuse across supersteps — the key to zero-shuffle cogroups — is only
 * contractual at the RDD layer.
 */
object Pregel {

  /** Per-vertex outgoing edge (reference EdgeWithValue.java:23-74). */
  case class OutEdge[K, EV](target: K, value: EV)

  /** Mirror of GraphAlgorithmState (GraphAlgorithmState.java:28-99).
    * `edges` is the final adjacency — observable because several algorithms'
    * primary output is mutated edge values (AdamicAdar/Jaccard/MaxBMatching). */
  case class Result[K, VV, EV](
      vertices: RDD[(K, VV)],
      edges: RDD[(K, OutEdge[K, EV])],
      superstep: Int,
      runningTimeMs: Long,
      aggregates: Map[String, Any],
      state: String)

  /** Registered aggregator slot (PregelComputation.java:921-939). */
  private[pregel] case class AggSlot(agg: Aggregator[Any], persistent: Boolean)

  /** Driver-side registration/halt callback (ComputeFunction init/masterCompute). */
  final class MasterCallback private[pregel] (
      private[pregel] val slots: mutable.LinkedHashMap[String, AggSlot],
      private[pregel] var current: Map[String, Any]) {
    private[pregel] var halted = false
    def registerAggregator[T](name: String, agg: Aggregator[T], persistent: Boolean = false): Unit =
      slots(name) = AggSlot(agg.asInstanceOf[Aggregator[Any]], persistent)
    def getAggregatedValue[T](name: String): T =
      current.getOrElse(name, slots(name).agg.zero).asInstanceOf[T]
    def setAggregatedValue[T](name: String, value: T): Unit =
      current = current.updated(name, value)
    def haltComputation(): Unit = halted = true
  }

  /** Per-vertex callback handed to compute()
    * (reference ComputeFunction.Callback, ComputeFunction.java:183-268).
    *
    * Edge mutations are READ-YOUR-WRITES within the same compute() call: the
    * reference's callback writes the adjacency store in place and the edges
    * iterable re-reads the store on every iteration (PregelComputation.java
    * :756-764) — algorithms like MaxBMatching rely on seeing processUpdates'
    * INCLUDED states during the same superstep's sendUpdates. */
  final class Callback[K, VV, EV, M] private[pregel] (
      private[pregel] val adj: mutable.LinkedHashMap[K, EV],
      private[pregel] val aggValues: Map[String, Any],
      private[pregel] val zeros: Map[String, Any],
      private[pregel] val merges: Map[String, (Any, Any) => Any]) {
    private[pregel] var newValue: Option[VV] = None
    private[pregel] var halt = false
    private[pregel] var mutated = false
    private[pregel] val msgs = mutable.ArrayBuffer.empty[(K, M)]
    private[pregel] val aggContribs = mutable.HashMap.empty[String, Any]

    def sendMessageTo(target: K, message: M): Unit = msgs += ((target, message))
    def setNewVertexValue(value: VV): Unit = newValue = Some(value)
    def voteToHalt(): Unit = halt = true
    /** Graph mutation (ComputeFunction.java:222-247): in place, visible to
      * subsequent edge iteration within this compute() call. */
    def addEdge(target: K, value: EV): Unit = { adj(target) = value; mutated = true }
    def removeEdge(target: K): Unit = { adj.remove(target); mutated = true }
    def setNewEdgeValue(target: K, value: EV): Unit =
      if (adj.contains(target)) { adj(target) = value; mutated = true }
    /** Merged value from the PREVIOUS superstep (ComputeFunction.java:252-256). */
    def getAggregatedValue[T](name: String): T =
      aggValues.getOrElse(name, zeros(name)).asInstanceOf[T]
    /** Contribute to an aggregator for THIS superstep. */
    def aggregate[T](name: String, value: T): Unit = {
      val merged = aggContribs.get(name) match {
        case Some(prev) => merges(name)(prev, value)
        case None       => merges(name)(zeros(name), value)
      }
      aggContribs(name) = merged
    }
  }

  private case class VertexOut[K, VV, EV, M](
      id: K,
      value: VV,
      halted: Boolean,
      msgs: Seq[(K, M)],
      newAdj: Option[Array[OutEdge[K, EV]]],
      aggContribs: Map[String, Any])

  /**
   * Run `cf` until convergence (no active vertices), master halt, or
   * maxIterations (termination semantics of PregelComputation.java:448-460,
   * 564-579).
   *
   * @param initialMessage seeded to every vertex at superstep 0 (the
   *   PregelGraphAlgorithm constructor arg; e.g. PageRank's
   *   resetProb/(1-resetProb)). None → every vertex starts active with an
   *   empty inbox (PregelComputation.java:253-273).
   */
  def run[K: ClassTag, VV: ClassTag, EV: ClassTag, M: ClassTag](
      spark: SparkSession,
      cf: ComputeFunction[K, VV, EV, M],
      vertices: RDD[(K, VV)],
      edges: RDD[(K, (K, EV))],
      configs: Map[String, Any] = Map.empty,
      initialMessage: Option[M] = None,
      maxIterations: Int = 30,
      numPartitions: Int = 0,
      checkpointInterval: Int = 10): Result[K, VV, EV] = {

    val t0 = System.currentTimeMillis()
    val n = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val part = new HashPartitioner(n)

    val slots = mutable.LinkedHashMap.empty[String, AggSlot]
    val master = new MasterCallback(slots, Map.empty)
    cf.init(configs, master)

    // state: (value, halted); adjacency: out-edges per vertex. Co-partitioned.
    var state: RDD[(K, (VV, Boolean))] =
      vertices.partitionBy(part).mapValues(v => (v, false)).persist()
    var adj: RDD[(K, Array[OutEdge[K, EV]])] = edges
      .mapValues { case (dst, ev) => OutEdge(dst, ev) }
      .groupByKey(part).mapValues(_.toArray).persist()

    // Superstep-0 inbox: every vertex active, with the initial message if any
    // (PregelComputation.java:253-273).
    val initMsgs: Seq[M] = initialMessage.toSeq
    var work: RDD[(K, Seq[M])] = state.mapValues(_ => initMsgs).persist()

    var superstep = 0
    var done = false
    var finalState = "CONVERGED"

    while (!done && superstep < maxIterations) {
      // Snapshot driver-side aggregator state for the executors.
      val zeros: Map[String, Any] = slots.map { case (k, s) => k -> s.agg.zero }.toMap
      val merges: Map[String, (Any, Any) => Any] =
        slots.map { case (k, s) => k -> ((a: Any, b: Any) => s.agg.merge(a, b)) }.toMap
      val prevAggs = master.current
      val step = superstep
      val fn = cf

      // 3-way cogroup is narrow: all three RDDs share `part`.
      val out: RDD[VertexOut[K, VV, EV, M]] = state.cogroup(work, adj, part)
        .flatMap { case (id, (sIt, wIt, aIt)) =>
          if (wIt.isEmpty || sIt.isEmpty) Iterator.empty
          else {
            val (value, _) = sIt.head
            val inbox = wIt.head
            // live adjacency map: callback mutations are visible to every
            // fresh iteration of `edgesView` (reference store semantics)
            val adjMap = mutable.LinkedHashMap.empty[K, EV]
            if (aIt.nonEmpty) aIt.head.foreach(e => adjMap(e.target) = e.value)
            val edgesView: Iterable[OutEdge[K, EV]] = new Iterable[OutEdge[K, EV]] {
              // snapshot per iterator() call, like the reference's per-call
              // store read — in-flight iteration is stable under mutation
              def iterator: Iterator[OutEdge[K, EV]] =
                adjMap.toSeq.iterator.map { case (t, v) => OutEdge(t, v) }
            }
            val cb = new Callback[K, VV, EV, M](adjMap, prevAggs, zeros, merges)
            fn.compute(step, id, value, inbox, edgesView, cb)
            Iterator.single(VertexOut(
              id, cb.newValue.getOrElse(value), cb.halt,
              cb.msgs.toSeq,
              if (cb.mutated) Some(adjMap.iterator.map { case (t, v) => OutEdge(t, v) }.toArray)
              else None,
              cb.aggContribs.toMap))
          }
        }.persist()

      // ---- aggregators + mutation flag: one partition-local pass, tiny
      // per-partition results to the driver (replaces the reference's ZK
      // aggregator persistence, PregelComputation.java:860-905) -------------
      val perPartition = out.mapPartitions { it =>
        val acc = mutable.HashMap.empty[String, Any]
        var mut = false
        it.foreach { o =>
          if (o.newAdj.isDefined) mut = true
          o.aggContribs.foreach { case (k, v) =>
            acc(k) = acc.get(k).map(merges(k)(_, v)).getOrElse(v)
          }
        }
        Iterator.single((acc.toMap, mut))
      }.collect()
      val anyMutation = perPartition.exists(_._2)
      val mergedAggs: Map[String, Any] =
        perPartition.map(_._1).foldLeft(Map.empty[String, Any]) { (m, pm) =>
          pm.foldLeft(m) { case (acc, (k, v)) =>
            acc.updated(k, acc.get(k).map(merges(k)(_, v)).getOrElse(v))
          }
        }

      // Persistent aggregators fold the previous value in
      // (PregelComputation.java:345-355,921-939).
      master.current = slots.iterator.map { case (name, slot) =>
        val stepVal = mergedAggs.getOrElse(name, slot.agg.zero)
        val v =
          if (slot.persistent) slot.agg.merge(
            prevAggs.getOrElse(name, slot.agg.zero), stepVal)
          else stepVal
        name -> v
      }.toMap

      // ---- apply vertex updates (solution-set delta) ----------------------
      val updates = out.map(o => (o.id, (o.value, o.halted))).partitionBy(part)
      val newState = state.cogroup(updates, part).mapValues { case (oldIt, updIt) =>
        if (updIt.nonEmpty) updIt.head else oldIt.head
      }.persist()

      // ---- edge mutations (rebuild adjacency only when present) -----------
      val newAdj =
        if (!anyMutation) adj
        else {
          // mutated vertices ship their full post-compute adjacency; others keep theirs
          val muts = out.filter(_.newAdj.isDefined)
            .map(o => (o.id, o.newAdj.get))
            .partitionBy(part)
          adj.fullOuterJoin(muts, part).mapValues {
            case (_, Some(updated)) => updated
            case (oldOpt, None)     => oldOpt.getOrElse(Array.empty[OutEdge[K, EV]])
          }.persist()
        }

      // ---- next superstep's inbox ----------------------------------------
      // outgoing messages grouped by destination ∪ empty self-message for
      // vertices that did not vote to halt (PregelComputation.java:764-770).
      val sent: RDD[(K, Seq[M])] = out
        .flatMap(_.msgs)
        .aggregateByKey(mutable.ArrayBuffer.empty[M], part)(
          (buf, m) => { buf += m; buf }, (a, b) => { a ++= b; a })
        .mapValues(_.toSeq)
      val selfActive: RDD[(K, Seq[M])] =
        out.filter(!_.halted).map(o => (o.id, Seq.empty[M])).partitionBy(part)
      val newWork: RDD[(K, Seq[M])] =
        sent.cogroup(selfActive, part).mapValues { case (ms, _) =>
          if (ms.isEmpty) Seq.empty[M] else ms.flatten.toSeq
        }.persist()

      if (superstep > 0 && superstep % checkpointInterval == 0) {
        newState.localCheckpoint(); newWork.localCheckpoint()
        if (newAdj ne adj) newAdj.localCheckpoint()
      }

      // MATERIALIZE every new RDD before unpersisting its parents: once a
      // localCheckpoint truncates lineage, unpersisted parent blocks are
      // unrecoverable (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND otherwise).
      // All three share `part`, so ONE zipPartitions job materializes them
      // together and returns the active count — not three separate actions
      // (matters at low superstep cost: scheduling overhead is the floor).
      val active: Long =
        (if (newAdj ne adj)
          newState.zipPartitions(newWork, newAdj) { (sIt, wIt, aIt) =>
            sIt.foreach(_ => ()); aIt.foreach(_ => ())
            var n = 0L; wIt.foreach(_ => n += 1); Iterator.single(n)
          }
        else
          newState.zipPartitions(newWork) { (sIt, wIt) =>
            sIt.foreach(_ => ())
            var n = 0L; wIt.foreach(_ => n += 1); Iterator.single(n)
          }).collect().sum

      // masterCompute between supersteps (PregelComputation.java:564-607).
      cf.masterCompute(superstep + 1, master)

      state.unpersist(false); work.unpersist(false); out.unpersist(false)
      if (newAdj ne adj) adj.unpersist(false)
      state = newState; adj = newAdj; work = newWork
      superstep += 1

      if (master.halted) { done = true; finalState = "HALTED" }
      else if (active == 0) { done = true; finalState = "CONVERGED" }
    }
    if (!done) finalState = "MAX_ITERATIONS"

    Result(state.mapValues(_._1),
      adj.flatMap { case (src, out) => out.iterator.map(e => (src, e)) },
      superstep, System.currentTimeMillis() - t0,
      master.current, finalState)
  }
}

/**
 * User contract for vertex-centric algorithms — 1:1 with the reference's
 * ComputeFunction (pregel/ComputeFunction.java:45-98): all 16 shipped
 * algorithms implement exactly this.
 */
trait ComputeFunction[K, VV, EV, M] extends Serializable {
  /** Register aggregators / read configs (ComputeFunction.java:52-58). */
  def init(configs: Map[String, Any], cb: Pregel.MasterCallback): Unit = {}
  /** Driver hook between supersteps; may halt (ComputeFunction.java:66-75). */
  def masterCompute(superstep: Int, cb: Pregel.MasterCallback): Unit = {}
  /** The vertex program (ComputeFunction.java:85-98). */
  def compute(
      superstep: Int,
      id: K,
      value: VV,
      messages: Iterable[M],
      edges: Iterable[Pregel.OutEdge[K, EV]],
      cb: Pregel.Callback[K, VV, EV, M]): Unit
}
