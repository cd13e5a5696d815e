package graft.algos.compute

import scala.collection.immutable.TreeMap

import graft.pregel.{Aggregators, ComputeFunction, Pregel}
import graft.pregel.Pregel.{Callback, MasterCallback, OutEdge}

/**
 * Collaborative filtering on the bipartite user–item ratings graph — ports of
 * the reference's SGD / ALS / SVD++ (library/cf/Sgd.java:34-360,
 * Als.java:36-302, Svdpp.java:35-631). jblas FloatMatrix ops are reproduced
 * on Array[Float] in the SAME operation order (float semantics preserved);
 * ALS's normal-equation solve uses Breeze (`A \ V` over doubles — the analog
 * of jblas Solve.solve).
 *
 * All three share the schedule: superstep 0 EdgeCount; 1 InitUsers (users
 * random-init + send ratings to items); 2 InitItems (items CREATE REVERSE
 * EDGES via cb.addEdge, random-init, send factors); then alternation. Master
 * halts on rmse < target or superstep > iterations.
 *
 * Reference determinism caveat preserved: with a fixed `randomSeed` every
 * vertex seeds an identical Random (Sgd.java:160-166), so all users start
 * with the same vector — we reproduce exactly that.
 */
object Cf {

  /** Bipartite vertex id (reference CfLongId.java:29-109): ordered by
    * (type, id); type 0 = user, 1 = item. */
  case class CfId(typ: Byte, id: Long)
  object CfId {
    implicit val ordering: Ordering[CfId] = Ordering.by(c => (c.typ, c.id))
    def user(id: Long): CfId = CfId(0, id)
    def item(id: Long): CfId = CfId(1, id)
  }

  /** (senderId, factors, score) — reference FloatMatrixMessage.java:29-77.
    * `factors` is row-major (rows × dim/rows). */
  case class FMsg(senderId: CfId, factors: Array[Float], score: Float)

  // ---- float vector helpers in jblas op order ----------------------------
  private[compute] object F {
    def zeros(n: Int): Array[Float] = new Array[Float](n)
    def dot(a: Array[Float], b: Array[Float]): Float = {
      var s = 0.0f; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def addi(a: Array[Float], b: Array[Float]): Unit = {
      var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }
    }
    def mul(a: Array[Float], s: Float): Array[Float] = a.map(_ * s)
    def add(a: Array[Float], b: Array[Float]): Array[Float] = {
      val r = a.clone(); addi(r, b); r
    }
    def distance2(a: Array[Float], b: Array[Float]): Float = {
      var s = 0.0f; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.sqrt(s).toFloat
    }
    /** identically-seeded per-vertex init (Sgd.java:160-166) */
    def randomVector(n: Int, seed: Option[Long], rand: java.util.Random): Array[Float] = {
      val r = new Array[Float](n)
      var i = 0; while (i < n) { r(i) = 0.01f * rand.nextFloat(); i += 1 }
      r
    }
    def newRandom(seed: Option[Long]): java.util.Random =
      seed.map(new java.util.Random(_)).getOrElse(new java.util.Random())
  }

  val RmseAggregator = "sgd.rmse.aggregator"
  val EdgeCountAggregator = "edge.count.aggregator"
  val OverallRatingAggregator = "svd.overall.rating.aggregator"

  // =========================================================================
  // SGD matrix factorization (reference library/cf/Sgd.java:34-360)
  // =========================================================================

  class Sgd(dim: Int = 50, iterations: Int = 10, rmseTarget: Float = -1f,
            tolerance: Float = -1f, lambda: Float = 0.01f, gamma: Float = 0.005f,
            minRating: Float = 0.0f, maxRating: Float = 5.0f,
            randomSeed: Option[Long] = None)
      extends ComputeFunction[CfId, Array[Float], Float, FMsg] {

    override def init(configs: Map[String, Any], cb: MasterCallback): Unit = {
      cb.registerAggregator(RmseAggregator, Aggregators.DoubleSum)
      cb.registerAggregator(EdgeCountAggregator, Aggregators.LongSum, persistent = true)
    }

    override def masterCompute(superstep: Int, cb: MasterCallback): Unit = {
      val numRatings = math.max(1L, cb.getAggregatedValue[Long](EdgeCountAggregator))
      val rmse = math.sqrt(cb.getAggregatedValue[Double](RmseAggregator) / numRatings)
      if (rmseTarget > 0f && rmse < rmseTarget) cb.haltComputation()
      else if (superstep > iterations) cb.haltComputation()
    }

    /** reference Sgd.updateValue (Sgd.java:221-238): in-place
      * v += -gamma·(lambda·v + err·u), with clipped prediction error. */
    private def updateValue(value: Array[Float], update: Array[Float], rating: Float): Unit = {
      var predicted = F.dot(value, update)
      predicted = math.min(predicted, maxRating)
      predicted = math.max(predicted, minRating)
      val err = predicted - rating
      val part3 = F.mul(F.add(F.mul(value, lambda), F.mul(update, err)), -gamma)
      F.addi(value, part3)
    }

    def compute(superstep: Int, id: CfId, value: Array[Float], messages: Iterable[FMsg],
                edges: Iterable[OutEdge[CfId, Float]],
                cb: Callback[CfId, Array[Float], Float, FMsg]): Unit = superstep match {
      case 0 => // EdgeCount does NOT halt (basic/EdgeCount.java:38-52)
        cb.aggregate(EdgeCountAggregator, edges.size.toLong)
      case 1 => // InitUsersComputation (Sgd.java:154-181)
        if (id.typ == 0) {
          val v = F.randomVector(dim, randomSeed, F.newRandom(randomSeed))
          cb.setNewVertexValue(v)
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, v, e.value)))
        }
        cb.voteToHalt()
      case 2 => // InitItemsComputation (Sgd.java:183-214): reverse edges
        if (id.typ == 1) {
          val v = F.randomVector(dim, randomSeed, F.newRandom(randomSeed))
          cb.setNewVertexValue(v)
          messages.foreach(m => cb.addEdge(m.senderId, m.score))
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, v, 0.0f)))
        }
        cb.voteToHalt()
      case _ => // superstepCompute (Sgd.java:143-204)
        val current = value.clone()
        val oldValue = if (tolerance > 0) value.clone() else null
        val edgeValues = edges.iterator.map(e => e.target -> e.value).toMap
        // the reference applies updates in Kafka arrival order
        // (nondeterministic); we fix sender-id order so runs are reproducible
        val ordered = messages.toSeq.sortBy(_.senderId)
        ordered.foreach { m =>
          updateValue(current, m.factors, edgeValues(m.senderId))
        }
        var rmsePartial = 0.0
        ordered.foreach { m =>
          var predicted = F.dot(current, m.factors)
          predicted = math.min(predicted, maxRating)
          predicted = math.max(predicted, minRating)
          val err = predicted - edgeValues(m.senderId)
          rmsePartial += err.toDouble * err
        }
        cb.aggregate(RmseAggregator, rmsePartial)
        val l2norm = if (tolerance > 0) F.distance2(current, oldValue) else 0f
        if (tolerance < 0 || l2norm > tolerance)
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, current, 0.0f)))
        cb.setNewVertexValue(current)
        cb.voteToHalt()
    }
  }

  // =========================================================================
  // ALS (reference library/cf/Als.java:36-302): per-vertex least squares
  // A·U = V with A = M·Mᵀ + λ·N·I, V = M·R.
  // =========================================================================

  class Als(dim: Int = 50, iterations: Int = 10, rmseTarget: Float = -1f,
            lambda: Float = 0.01f, randomSeed: Option[Long] = None)
      extends ComputeFunction[CfId, Array[Float], Float, FMsg] {

    override def init(configs: Map[String, Any], cb: MasterCallback): Unit = {
      cb.registerAggregator(RmseAggregator, Aggregators.DoubleSum)
      cb.registerAggregator(EdgeCountAggregator, Aggregators.LongSum, persistent = true)
    }

    override def masterCompute(superstep: Int, cb: MasterCallback): Unit = {
      val numRatings = math.max(1L, cb.getAggregatedValue[Long](EdgeCountAggregator))
      val rmse = math.sqrt(cb.getAggregatedValue[Double](RmseAggregator) / numRatings)
      if (rmseTarget > 0f && rmse < rmseTarget) cb.haltComputation()
      else if (superstep > iterations) cb.haltComputation()
    }

    /** A = M·Mᵀ + λ·N·I; V = M·R; solve A·U = V (Als.java:166-178,
      * jblas Solve.solve → Breeze `\`). */
    private def solveLeastSquares(msgs: Seq[FMsg], ratings: Seq[Float]): Array[Float] = {
      import breeze.linalg.{DenseMatrix, DenseVector}
      val n = msgs.size
      val m = DenseMatrix.zeros[Double](dim, n)
      msgs.zipWithIndex.foreach { case (msg, j) =>
        var i = 0; while (i < dim) { m(i, j) = msg.factors(i); i += 1 }
      }
      val r = DenseVector(ratings.map(_.toDouble).toArray)
      val v = m * r
      val a = m * m.t
      var i = 0
      while (i < dim) { a(i, i) += lambda.toDouble * n; i += 1 }
      val u = a \ v
      u.toArray.map(_.toFloat)
    }

    def compute(superstep: Int, id: CfId, value: Array[Float], messages: Iterable[FMsg],
                edges: Iterable[OutEdge[CfId, Float]],
                cb: Callback[CfId, Array[Float], Float, FMsg]): Unit = superstep match {
      case 0 => // EdgeCount does NOT halt (basic/EdgeCount.java:38-52)
        cb.aggregate(EdgeCountAggregator, edges.size.toLong)
      case 1 =>
        if (id.typ == 0) {
          val v = F.randomVector(dim, randomSeed, F.newRandom(randomSeed))
          cb.setNewVertexValue(v)
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, v, e.value)))
        }
        cb.voteToHalt()
      case 2 =>
        if (id.typ == 1) {
          val v = F.randomVector(dim, randomSeed, F.newRandom(randomSeed))
          cb.setNewVertexValue(v)
          messages.foreach(m => cb.addEdge(m.senderId, m.score))
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, v, 0.0f)))
        }
        cb.voteToHalt()
      case _ => // Als.superstepCompute (Als.java:118-162)
        val edgeValues = edges.iterator.map(e => e.target -> e.value).toMap
        // sender-id order fixes the normal-equation column order → float
        // solve is reproducible (reference uses arrival order)
        val msgs = messages.toSeq.sortBy(_.senderId)
        if (msgs.nonEmpty) {
          val ratings = msgs.map(m => edgeValues(m.senderId))
          val u = solveLeastSquares(msgs, ratings)
          var rmsePartial = 0.0
          msgs.zip(ratings).foreach { case (m, r) =>
            val err = F.dot(u, m.factors).toDouble - r
            rmsePartial += err * err
          }
          cb.aggregate(RmseAggregator, rmsePartial)
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, u, 0.0f)))
          cb.setNewVertexValue(u)
        }
        cb.voteToHalt()
    }
  }

  // =========================================================================
  // SVD++ (reference library/cf/Svdpp.java:35-631): users at odd supersteps,
  // items at even; r̂ = μ + bu + bi + qᵀ(p + Σy/√N).
  // =========================================================================

  /** (baseline, factors, weight) — reference SvdppValue (Svdpp.java:234-276);
    * weight empty for users. */
  case class SvdppValue(baseline: Float, factors: Array[Float], weight: Array[Float])

  class Svdpp(dim: Int = 50, iterations: Int = 10, rmseTarget: Float = -1f,
              factorLambda: Float = 0.01f, factorGamma: Float = 0.005f,
              biasLambda: Float = 0.01f, biasGamma: Float = 0.005f,
              minRating: Float = 0.0f, maxRating: Float = 5.0f,
              randomSeed: Option[Long] = None)
      extends ComputeFunction[CfId, SvdppValue, Float, FMsg] {

    override def init(configs: Map[String, Any], cb: MasterCallback): Unit = {
      cb.registerAggregator(EdgeCountAggregator, Aggregators.LongSum, persistent = true)
      cb.registerAggregator(RmseAggregator, Aggregators.DoubleSum)
      cb.registerAggregator(OverallRatingAggregator, Aggregators.DoubleSum, persistent = true)
    }

    override def masterCompute(superstep: Int, cb: MasterCallback): Unit = {
      val numRatings = math.max(1L, cb.getAggregatedValue[Long](EdgeCountAggregator))
      val rmse = math.sqrt(cb.getAggregatedValue[Double](RmseAggregator) / numRatings)
      if (rmseTarget > 0f && rmse < rmseTarget) cb.haltComputation()
      else if (superstep > iterations) cb.haltComputation()
    }

    /** Svdpp.computePredictedRating (Svdpp.java:150-164) */
    private def predict(meanRating: Float, userBaseline: Float, itemBaseline: Float,
                        user: Array[Float], item: Array[Float],
                        numRatings: Int, sumWeights: Array[Float]): Float = {
      val p = meanRating + userBaseline + itemBaseline +
        F.dot(item, F.add(user, F.mul(sumWeights, 1.0f / math.sqrt(numRatings).toFloat)))
      math.max(math.min(p, maxRating), minRating)
    }

    def compute(superstep: Int, id: CfId, value: SvdppValue, messages: Iterable[FMsg],
                edges: Iterable[OutEdge[CfId, Float]],
                cb: Callback[CfId, SvdppValue, Float, FMsg]): Unit = {
      if (superstep == 0) {
        // EdgeCount does NOT halt (basic/EdgeCount.java:38-52)
        cb.aggregate(EdgeCountAggregator, edges.size.toLong)
      } else if (superstep == 1) { // InitUsers (Svdpp.java:280-322)
        if (id.typ == 0) {
          var sum = 0.0
          edges.foreach(e => sum += e.value)
          cb.aggregate(OverallRatingAggregator, sum)
          val rand = F.newRandom(randomSeed)
          val factors = F.randomVector(dim, randomSeed, rand)
          val baseline = rand.nextFloat()
          cb.setNewVertexValue(SvdppValue(baseline, factors, F.zeros(0)))
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, F.zeros(0), e.value)))
        }
        cb.voteToHalt()
      } else if (superstep == 2) { // InitItems (Svdpp.java:324-367)
        if (id.typ == 1) {
          messages.foreach(m => cb.addEdge(m.senderId, m.score))
          val rand = F.newRandom(randomSeed)
          val factors = new Array[Float](dim)
          val weight = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            factors(i) = 0.01f * rand.nextFloat()
            weight(i) = 0.01f * rand.nextFloat()
            i += 1
          }
          val baseline = rand.nextFloat()
          cb.setNewVertexValue(SvdppValue(baseline, factors, weight))
          val packed = factors ++ weight // 2×dim packed rows
          edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, packed, baseline)))
        }
        cb.voteToHalt()
      } else if (superstep % 2 == 1) { // UserComputation (Svdpp.java:371-498)
        if (id.typ == 0) userCompute(id, value, messages, edges, cb)
        cb.voteToHalt()
      } else { // ItemComputation (Svdpp.java:500-553)
        if (id.typ == 1) itemCompute(id, value, messages, edges, cb)
        cb.voteToHalt()
      }
    }

    private def userCompute(id: CfId, value: SvdppValue, messages: Iterable[FMsg],
                            edges: Iterable[OutEdge[CfId, Float]],
                            cb: Callback[CfId, SvdppValue, Float, FMsg]): Unit = {
      val numRatings2 = cb.getAggregatedValue[Long](EdgeCountAggregator) * 2
      val meanRating =
        (cb.getAggregatedValue[Double](OverallRatingAggregator) / numRatings2).toFloat
      var userBaseline = value.baseline
      val edgeValues = edges.iterator.map(e => e.target -> e.value).toMap
      val numRatings = edgeValues.size
      val userFactors = value.factors.clone()
      // deterministic message order (TreeMap on CfLongId, Svdpp.java:427)
      val sorted = TreeMap.from(messages.map(m => m.senderId -> m))
      val sumWeights = F.zeros(dim)
      sorted.values.foreach(m => F.addi(sumWeights, m.factors.slice(dim, 2 * dim)))
      val itemWeightStep = F.zeros(dim)
      var rmsePartial = 0.0
      sorted.values.foreach { m =>
        val itemFactors = m.factors.slice(0, dim)
        val itemBaseline = m.score
        val observed = edgeValues(m.senderId)
        val predicted = predict(meanRating, userBaseline, itemBaseline,
          userFactors, itemFactors, numRatings, sumWeights)
        val error = predicted - observed
        userBaseline = userBaseline +
          biasGamma * ((predicted - observed) - biasLambda * userBaseline)
        // updateValue (Svdpp.java:390-394): u += -λγ·u + γ·err·q
        F.addi(userFactors, F.add(F.mul(userFactors, -factorLambda * factorGamma),
          F.mul(itemFactors, error * factorGamma)))
        F.addi(itemWeightStep, F.mul(itemFactors, error))
      }
      cb.setNewVertexValue(SvdppValue(userBaseline, userFactors, value.weight))
      val scaledWeightStep =
        F.mul(itemWeightStep, factorGamma / math.sqrt(numRatings.toDouble).toFloat)
      sorted.values.foreach { m =>
        val itemFactors = m.factors.slice(0, dim)
        val itemBaseline = m.score
        val observed = edgeValues(m.senderId)
        val predicted = predict(meanRating, userBaseline, itemBaseline,
          userFactors, itemFactors, numRatings, sumWeights)
        val error = predicted - observed
        val itemBiasStep = biasGamma * error
        val itemFactorStep = F.mul(
          F.add(F.mul(sumWeights, 1f / math.sqrt(numRatings.toDouble).toFloat), userFactors),
          factorGamma * error)
        rmsePartial += error.toDouble * error
        cb.sendMessageTo(m.senderId, FMsg(id, itemFactorStep ++ scaledWeightStep, itemBiasStep))
      }
      cb.aggregate(RmseAggregator, rmsePartial)
    }

    private def itemCompute(id: CfId, value: SvdppValue, messages: Iterable[FMsg],
                            edges: Iterable[OutEdge[CfId, Float]],
                            cb: Callback[CfId, SvdppValue, Float, FMsg]): Unit = {
      var itemBaseline = value.baseline
      val itemFactors = value.factors.clone()
      val itemWeights = value.weight.clone()
      messages.foreach { m =>
        val itemBiasStep = m.score
        val itemFactorStep = m.factors.slice(0, dim)
        val itemWeightStep = m.factors.slice(dim, 2 * dim)
        // incrementValue (Svdpp.java:180-186): x += step − γλ·x
        itemBaseline = itemBaseline + itemBiasStep - biasGamma * biasLambda * itemBaseline
        F.addi(itemFactors, F.add(F.mul(itemFactors, -factorGamma * factorLambda), itemFactorStep))
        F.addi(itemWeights, F.add(F.mul(itemWeights, -factorGamma * factorLambda), itemWeightStep))
      }
      val packed = itemFactors ++ itemWeights
      edges.foreach(e => cb.sendMessageTo(e.target, FMsg(id, packed, itemBaseline)))
      cb.setNewVertexValue(SvdppValue(itemBaseline, itemFactors, itemWeights))
    }
  }

  /** Offline rating prediction over a TRAINED SVD++ result — port of the
    * reference's `svdpp-predict` tool (kafka-graphs-rest-app
    * tools/library/SvdppPredictor.java:107-137):
    *
    *   predicted = clamp(meanRating + b_u + b_i + q_i · p_u, min, max)
    *   meanRating = overallRating / (2 · numEdges)    (from the aggregators)
    *
    * The tool uses the raw user·item factor dot product WITHOUT the
    * implicit-feedback weight term of the training-time predictor
    * (Svdpp.java:150-164) — that asymmetry is preserved, as is the clamp
    * order (min(·, max) then max(·, min)) and float accumulation.
    *
    * Distributed: two hash joins over the factor tables (user side first) —
    * the reference tool fetches one pair per HTTP round-trip; here any
    * number of (user, item) pairs batch through the same two joins. */
  def svdppPredict(res: Pregel.Result[CfId, SvdppValue, Float],
                   pairs: org.apache.spark.rdd.RDD[(Long, Long)],
                   minRating: Float = 0.0f,
                   maxRating: Float = 5.0f): org.apache.spark.rdd.RDD[(Long, Long, Float)] = {
    val meanRating = svdppMeanRating(res.aggregates)
    val users = res.vertices.flatMap { case (id, v) =>
      if (id.typ == 0) Iterator((id.id, (v.baseline, v.factors))) else Iterator.empty
    }
    val items = res.vertices.flatMap { case (id, v) =>
      if (id.typ == 1) Iterator((id.id, (v.baseline, v.factors))) else Iterator.empty
    }
    pairs.join(users)
      .map { case (u, (i, uv)) => (i, (u, uv)) }
      .join(items)
      .map { case (i, ((u, (ub, uf)), (ib, ifa))) =>
        (u, i, svdppPredictOne(meanRating, ub, uf, ib, ifa, minRating, maxRating))
      }
  }

  /** Global mean rating from a finished run's aggregates
    * (SvdppPredictor.java:107-110): overallRating / (2 · numEdges). */
  def svdppMeanRating(aggregates: Map[String, Any]): Float = {
    val overall = aggregates.getOrElse(OverallRatingAggregator, 0.0).asInstanceOf[Double]
    val numEdges = math.max(1L, aggregates.getOrElse(EdgeCountAggregator, 0L).asInstanceOf[Long])
    (overall / (numEdges * 2)).toFloat
  }

  /** Single-pair predictor core (SvdppPredictor.java:122-128), float
    * arithmetic and clamp order preserved. */
  def svdppPredictOne(meanRating: Float, userBaseline: Float, userFactors: Array[Float],
                      itemBaseline: Float, itemFactors: Array[Float],
                      minRating: Float, maxRating: Float): Float = {
    val raw = meanRating + userBaseline + itemBaseline + F.dot(itemFactors, userFactors)
    math.max(math.min(raw, maxRating), minRating)
  }
}
