package graft.pregel

/**
 * Commutative aggregators shared between vertices within a superstep and read
 * (merged) by all vertices at the next superstep — the reference's
 * pregel/aggregators/Aggregator.java:21-31 plus the ten shipped impls
 * (Long/Double × Sum/Min/Max/Product, BooleanAnd/Or) and the clustering list
 * aggregators (library/clustering/DoubleListAggregator.java:23-62,
 * ListOfDoubleListAggregator.java:27-80).
 *
 * `persistent` aggregators carry their merged value into the next superstep as
 * the new zero (PregelComputation.java:921-939); reset aggregators start from
 * `zero` each step.
 */
trait Aggregator[T] extends Serializable {
  def zero: T
  def merge(a: T, b: T): T
}

object Aggregators {
  case object LongSum extends Aggregator[Long] { val zero = 0L; def merge(a: Long, b: Long) = a + b }
  case object LongMin extends Aggregator[Long] { val zero = Long.MaxValue; def merge(a: Long, b: Long) = math.min(a, b) }
  case object LongMax extends Aggregator[Long] { val zero = Long.MinValue; def merge(a: Long, b: Long) = math.max(a, b) }
  case object LongProduct extends Aggregator[Long] { val zero = 1L; def merge(a: Long, b: Long) = a * b }
  case object DoubleSum extends Aggregator[Double] { val zero = 0.0; def merge(a: Double, b: Double) = a + b }
  case object DoubleMin extends Aggregator[Double] { val zero = Double.MaxValue; def merge(a: Double, b: Double) = math.min(a, b) }
  case object DoubleMax extends Aggregator[Double] { val zero = Double.MinValue; def merge(a: Double, b: Double) = math.max(a, b) }
  case object DoubleProduct extends Aggregator[Double] { val zero = 1.0; def merge(a: Double, b: Double) = a * b }
  case object BooleanAnd extends Aggregator[Boolean] { val zero = true; def merge(a: Boolean, b: Boolean) = a && b }
  case object BooleanOr extends Aggregator[Boolean] { val zero = false; def merge(a: Boolean, b: Boolean) = a || b }

  /** Element-wise vector sum (K-means coordinate accumulation,
    * DoubleListAggregator.java:23-62). Empty = identity. */
  case object DoubleVectorSum extends Aggregator[Vector[Double]] {
    val zero: Vector[Double] = Vector.empty
    def merge(a: Vector[Double], b: Vector[Double]): Vector[Double] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else {
        // iterator loop instead of zip/map: no per-element tuples and no
        // intermediate collection (hot in the per-vertex K-means fold)
        val n = math.min(a.length, b.length)
        val out = new Array[Double](n)
        val ia = a.iterator; val ib = b.iterator
        var i = 0
        while (i < n) { out(i) = ia.next() + ib.next(); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out).toVector
      }
  }

  /** Concatenating list aggregator (K-means initial-centers collection,
    * ListOfDoubleListAggregator.java:27-80). */
  case class VectorConcat[T]() extends Aggregator[Vector[T]] {
    val zero: Vector[T] = Vector.empty
    def merge(a: Vector[T], b: Vector[T]): Vector[T] = a ++ b
  }
}
