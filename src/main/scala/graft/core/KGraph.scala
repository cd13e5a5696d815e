package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Property graph as a pair of DataFrames — the Spark-native analogue of the
 * reference's table-duality graph (`KGraph<K,VV,EV>` = vertex KTable + edge
 * KTable, reference kafka-graphs-core/src/main/java/io/kgraph/KGraph.java:52-65).
 *
 * Schema convention (fixed column names, arbitrary Spark SQL types):
 *   vertices: (id, value)
 *   edges:    (src, dst, value)
 *
 * Every transform below is a declarative DataFrame expression — Catalyst gets
 * full visibility (predicate pushdown, column pruning, join planning), and at
 * cluster scale each groupBy/join hash-partitions on the vertex key exactly the
 * way the reference's co-partitioned Kafka topics did, but without a broker
 * round-trip per operator.
 *
 * KTable upsert semantics ("last write wins" after re-keying, KGraph.java:148-155)
 * collapse in batch to `dropDuplicates` on the key — noted per method.
 */
case class KGraph(vertices: DataFrame, edges: DataFrame) {
  import KGraph._

  def spark: SparkSession = vertices.sparkSession

  // ---- accessors (KGraph.java:67-103) -------------------------------------

  /** Edges keyed by source — in Spark just a projection. (KGraph.java:91-97) */
  def edgesBySource: DataFrame = edges.select(col("src").as("key"), col("src"), col("dst"), col("value"))

  /** Edges keyed by target. (KGraph.java:99-103) */
  def edgesByTarget: DataFrame = edges.select(col("dst").as("key"), col("src"), col("dst"), col("value"))

  /** Adjacency list grouped by source: (id, edges: array<struct<dst,value>>).
    * (KGraph.java:105-124 — the KTable HashSet aggregate is a batch collect_list.) */
  def edgesGroupedBySource: DataFrame =
    edges.groupBy(col("src").as("id"))
      .agg(sort_array(collect_list(struct(col("dst"), col("value")))).as("edges"))

  /** Adjacency list grouped by target. (KGraph.java:126-141) */
  def edgesGroupedByTarget: DataFrame =
    edges.groupBy(col("dst").as("id"))
      .agg(sort_array(collect_list(struct(col("src"), col("value")))).as("edges"))

  // ---- maps (KGraph.java:176-188) -----------------------------------------

  /** Map vertex values with a Column expression over (id, value). */
  def mapVertices(f: (Column, Column) => Column): KGraph =
    copy(vertices = vertices.select(col("id"), f(col("id"), col("value")).as("value")))

  /** Map edge values with a Column expression over (src, dst, value). */
  def mapEdges(f: (Column, Column, Column) => Column): KGraph =
    copy(edges = edges.select(col("src"), col("dst"),
      f(col("src"), col("dst"), col("value")).as("value")))

  // ---- joins (KGraph.java:190-323) ----------------------------------------

  /** Left-outer join vertices with an input table (id, value); combiner applied
    * only when the input side matched, else the old value is kept.
    * (KGraph.java:190-219 — KTable leftJoin + null-guarded VertexJoinFunction.) */
  def joinWithVertices(input: DataFrame, f: (Column, Column) => Column): KGraph = {
    val in = input.toDF("id", "in_value")
    copy(vertices = vertices.join(in, Seq("id"), "left_outer")
      .select(col("id"),
        when(col("in_value").isNotNull, f(col("value"), col("in_value")))
          .otherwise(col("value")).as("value")))
  }

  /** Left-outer join edges with input keyed by (src,dst). (KGraph.java:221-250) */
  def joinWithEdges(input: DataFrame, f: (Column, Column) => Column): KGraph = {
    val in = input.toDF("src", "dst", "in_value")
    copy(edges = edges.join(in, Seq("src", "dst"), "left_outer")
      .select(col("src"), col("dst"),
        when(col("in_value").isNotNull, f(col("value"), col("in_value")))
          .otherwise(col("value")).as("value")))
  }

  /** Join each edge with per-source input and rewrite the edge value.
    * The reference groups edges into adjacency, joins, re-flattens and
    * last-wins-reduces (KGraph.java:252-272); in Spark a plain left join on src
    * is equivalent and shuffle-cheaper (no regroup needed). */
  def joinWithEdgesOnSource(input: DataFrame, f: (Column, Column) => Column): KGraph = {
    val in = input.toDF("src", "in_value")
    copy(edges = edges.join(in, Seq("src"), "left_outer")
      .select(col("src"), col("dst"),
        when(col("in_value").isNotNull, f(col("value"), col("in_value")))
          .otherwise(col("value")).as("value")))
  }

  /** Same keyed by target. (KGraph.java:274-294) */
  def joinWithEdgesOnTarget(input: DataFrame, f: (Column, Column) => Column): KGraph = {
    val in = input.toDF("dst", "in_value")
    copy(edges = edges.join(in, Seq("dst"), "left_outer")
      .select(col("src"), col("dst"),
        when(col("in_value").isNotNull, f(col("value"), col("in_value")))
          .otherwise(col("value")).as("value")))
  }

  // ---- filters / subgraph (KGraph.java:325-361) ---------------------------

  /** Keep vertices passing vertexFilter; keep edges whose BOTH endpoints
    * survive AND pass edgeFilter. Semi-joins keep the build side small —
    * at scale Catalyst broadcasts the filtered vertex set when it fits.
    * (KGraph.java:325-340: filter + two stream-table joins.) */
  def subgraph(vertexFilter: Column, edgeFilter: Column): KGraph = {
    val vf = vertices.filter(vertexFilter)
    val vKeys = vf.select(col("id"))
    val ef = edges.filter(edgeFilter)
      .join(vKeys.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(vKeys.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"), col("value"))
    KGraph(vf, ef)
  }

  /** Subgraph with edge predicate = true. (KGraph.java:342-354) */
  def filterOnVertices(vertexFilter: Column): KGraph = subgraph(vertexFilter, lit(true))

  /** Plain edge filter. (KGraph.java:356-361) */
  def filterOnEdges(edgeFilter: Column): KGraph = copy(edges = edges.filter(edgeFilter))

  // ---- degrees (KGraph.java:363-386) --------------------------------------

  /** (id, value=outDegree) for every vertex, 0 when no out-edges. */
  def outDegrees: DataFrame = degreesBy("src")

  /** (id, value=inDegree) for every vertex, 0 when no in-edges. */
  def inDegrees: DataFrame = degreesBy("dst")

  private def degreesBy(key: String): DataFrame = {
    val cnt = edges.groupBy(col(key).as("id")).agg(count(lit(1)).as("cnt"))
    vertices.select(col("id")).join(cnt, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("cnt"), lit(0L)).as("value"))
  }

  // ---- structure (KGraph.java:388-410) ------------------------------------

  /** Add the reverse of every edge. The reference collapses duplicate
    * (src,dst) keys last-write-wins, which is arrival-order-dependent
    * (KGraph.java:388-410); we pick a DETERMINISTIC winner instead: the
    * original edge's value beats the reversed copy, ties break on min value —
    * stable across runs, partitionings, and task retries. */
  def undirected: KGraph = {
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"), col("value"))
    val tagged = edges.withColumn("_pri", lit(0)).unionByName(rev.withColumn("_pri", lit(1)))
    val merged = tagged.groupBy(col("src"), col("dst"))
      .agg(min_by(col("value"), struct(col("_pri"), col("value"))).as("value"))
    copy(edges = merged)
  }

  /** Reverse all edges. */
  def reverse: KGraph =
    copy(edges = edges.select(col("dst").as("src"), col("src").as("dst"), col("value")))

  // ---- neighborhood aggregates (KGraph.java:412-608) ----------------------

  private def dirKey(direction: EdgeDirection): String = direction match {
    case EdgeDirection.In  => "dst"
    case EdgeDirection.Out => "src"
    case EdgeDirection.Both =>
      // Matches the reference: KGraph BOTH → UnsupportedOperationException
      // (KGraph.java:424-425,468-469,498-499,546-547).
      throw new UnsupportedOperationException("EdgeDirection.Both is not supported on KGraph ops")
  }

  /** Group adjacent edges per vertex (with the vertex value) and apply an
    * arbitrary aggregation expression over the collected edge structs.
    * `agg` sees columns: id, value (vertex), edges array<struct<src,dst,value>>.
    * (KGraph.java:412-429 groupReduceOnEdges.) */
  def groupReduceOnEdges(direction: EdgeDirection)(agg: DataFrame => DataFrame): DataFrame = {
    val key = dirKey(direction)
    val grouped = edges.groupBy(col(key).as("id"))
      .agg(collect_list(struct(col("src"), col("dst"), col("value"))).as("edges"))
    // Left join from the vertex table: a vertex with no adjacent edges in the
    // chosen direction still reaches the user aggregation, with an EMPTY edge
    // list — matching the reference's vertices().leftJoin +
    // ApplyEdgeLeftJoinFunction emptyList substitution
    // (KGraph.java:415-423,553-571).
    val edgesType = grouped.schema("edges").dataType
    val joined = vertices.join(grouped, Seq("id"), "left_outer")
      .withColumn("edges", coalesce(col("edges"), array().cast(edgesType)))
    agg(joined)
  }

  /** Per-vertex fold of adjacent edge VALUES with a builtin-reducible semantic.
    * The reference takes a binary Reducer<EV> (KGraph.java:475-503); callers
    * pass the equivalent Spark aggregate (min/max/sum/...) which map-side
    * combines — strictly better than the reference's per-record KTable reduce. */
  def reduceOnEdges(reducer: Column => Column, direction: EdgeDirection): DataFrame =
    edges.groupBy(col(dirKey(direction)).as("id"))
      .agg(reducer(col("value")).as("value"))

  /** Per-vertex fold of NEIGHBOR vertex values (reference reduceOnNeighbors,
    * KGraph.java:505-551): join edges with the neighbor's vertex value, group
    * by the owning side, aggregate. IN: neighbors = sources, owner = target. */
  def reduceOnNeighbors(reducer: Column => Column, direction: EdgeDirection): DataFrame = {
    val (neighborKey, ownerKey) = direction match {
      case EdgeDirection.In  => ("src", "dst")
      case EdgeDirection.Out => ("dst", "src")
      case EdgeDirection.Both => throw new UnsupportedOperationException("BOTH not supported")
    }
    val nv = vertices.select(col("id").as(neighborKey), col("value").as("nval"))
    edges.join(nv, Seq(neighborKey), "inner")
      .groupBy(col(ownerKey).as("id"))
      .agg(reducer(col("nval")).as("value"))
  }

  /** Neighborhood with both edge and neighbor vertex values collected per
    * vertex: (id, value, neighbors array<struct<src,dst,evalue,nvalue>>).
    * (KGraph.java:431-473 groupReduceOnNeighbors.) */
  def groupReduceOnNeighbors(direction: EdgeDirection)(agg: DataFrame => DataFrame): DataFrame = {
    val (neighborKey, ownerKey) = direction match {
      case EdgeDirection.In  => ("src", "dst")
      case EdgeDirection.Out => ("dst", "src")
      case EdgeDirection.Both => throw new UnsupportedOperationException("BOTH not supported")
    }
    val nv = vertices.select(col("id").as(neighborKey), col("value").as("nvalue"))
    val grouped = edges.join(nv, Seq(neighborKey), "inner")
      .groupBy(col(ownerKey).as("id"))
      .agg(collect_list(struct(col("src"), col("dst"),
        col("value").as("evalue"), col("nvalue"))).as("neighbors"))
    // Left join, as in groupReduceOnEdges: edge-less vertices get an empty
    // neighbor list (reference leftJoin parity, KGraph.java:431-473,553-571).
    val neighborsType = grouped.schema("neighbors").dataType
    val joined = vertices.join(grouped, Seq("id"), "left_outer")
      .withColumn("neighbors", coalesce(col("neighbors"), array().cast(neighborsType)))
    agg(joined)
  }
}

object KGraph {
  /** Edge direction for neighborhood ops (reference EdgeDirection.java:21-25). */
  sealed trait EdgeDirection
  object EdgeDirection {
    case object In extends EdgeDirection
    case object Out extends EdgeDirection
    case object Both extends EdgeDirection
    def apply(s: String): EdgeDirection = s.toUpperCase match {
      case "IN" => In; case "OUT" => Out; case "BOTH" => Both
    }
  }

  /** Derive the vertex table from the edge table: every endpoint becomes a
    * vertex with `init(id)` as value. (KGraph.fromEdges, KGraph.java:143-174 —
    * the flatMap + groupByKey + last-wins reduce is a batch distinct.) */
  def fromEdges(edges: DataFrame, init: Column => Column): KGraph = {
    val verts = edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct()
      .select(col("id"), init(col("id")).as("value"))
    KGraph(verts, edges.select(col("src"), col("dst"), col("value")))
  }

  /** Build from explicit collections of rows. */
  def fromData(vertices: DataFrame, edges: DataFrame): KGraph =
    KGraph(
      vertices.toDF("id", "value").dropDuplicates("id"),
      edges.toDF("src", "dst", "value").dropDuplicates("src", "dst"))
}
