package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text/parquet loaders mirroring the reference parsers
 * (utils/Parsers.java:27-95, utils/GraphUtils.java:62-149): whitespace-split
 * "id value" vertex files and "src dst value" edge files. The split + cast is
 * pure Catalyst — pushdown-friendly and codegen'd; no per-record parser objects.
 */
object GraphIO {

  /** Read "id value" lines (value optional → null). (Parsers.VertexParser) */
  def readVertices(spark: SparkSession, path: String): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        toks.getItem(0).cast("long").as("id"),
        toks.getItem(1).cast("long").as("value"))
  }

  /** Read "src dst value" lines (value optional → null). (Parsers.EdgeParser) */
  def readEdges(spark: SparkSession, path: String): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        toks.getItem(0).cast("long").as("src"),
        toks.getItem(1).cast("long").as("dst"),
        toks.getItem(2).cast("double").as("value"))
  }

  /** Read "user item rating" CF bipartite ratings (reference
    * EdgeCfLongIdFloatValueParser / CfLongId.java:29-48). Users get typ=0,
    * items typ=1 — encoded as struct<id,typ> columns. */
  def readRatings(spark: SparkSession, path: String): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        struct(toks.getItem(0).cast("long").as("id"), lit(0: Byte).as("typ")).as("src"),
        struct(toks.getItem(1).cast("long").as("id"), lit(1: Byte).as("typ")).as("dst"),
        toks.getItem(2).cast("float").as("value"))
  }

  /** Dump vertices as "id value" text (GraphUtils.verticesToFile,
    * utils/GraphUtils.java:145-149). */
  def writeVertices(df: DataFrame, path: String): Unit =
    df.select(concat_ws(" ", col("id"), col("value")).as("value")).write.mode("overwrite").text(path)

  /** Source-agnostic STREAMING edge reader — the seam where the reference's
    * Kafka IO surface plugs in (GraphUtils.verticesToTopic/edgesToTopic,
    * utils/GraphUtils.java:62-143, and EdgeStream's topic-backed ctor,
    * streaming/EdgeStream.java:54-68): `format` is a config choice —
    * "kafka" (with kafka.bootstrap.servers + subscribe options, when the
    * spark-sql-kafka connector is on the classpath), "text", "socket", … .
    * Every EdgeStreamOps operator runs unchanged on the result. */
  def edgesFromStream(spark: SparkSession, format: String,
                      options: Map[String, String] = Map.empty): DataFrame =
    edgesFromRaw(spark.readStream.format(format).options(options).load())

  /** Parse any raw source frame into the (src, dst, value, ts) edge-stream
    * schema: records are "src dst value" text lines in a `value` column
    * (exactly the reference's edgesToTopic wire format). Kafka-shaped frames
    * (binary value + `timestamp`) keep the broker record time as event time;
    * plain text/socket frames get processing time — the reference's
    * processing-time-window semantics. */
  def edgesFromRaw(raw: DataFrame): DataFrame = {
    val base =
      if (raw.columns.contains("timestamp"))
        raw.select(col("value").cast("string").as("line"),
          col("timestamp").cast("timestamp").as("ts"))
      else raw.select(col("value").cast("string").as("line"),
        current_timestamp().as("ts"))
    val toks = split(trim(col("line")), "\\s+")
    base.filter(length(trim(col("line"))) > 0)
      .select(
        toks.getItem(0).cast("long").as("src"),
        toks.getItem(1).cast("long").as("dst"),
        toks.getItem(2).cast("double").as("value"),
        col("ts"))
  }

  /** The reference "prepare" step (GraphUtils.groupEdgesBySourceAndRepartition,
    * utils/GraphUtils.java:152-253): materialize co-partitioned vertices and
    * per-source adjacency. In Spark: hash-repartition both on the vertex key so
    * downstream per-superstep joins are co-partitioned without extra shuffles.
    * Offset-quiescence tracking is unnecessary — batch writes are atomic. */
  def prepare(g: KGraph, numPartitions: Int): KGraph =
    KGraph(
      g.vertices.repartition(numPartitions, col("id")),
      g.edges.repartition(numPartitions, col("src")))

  /** PERSISTENT co-location — the durable analog of `prepare` and the Spark
    * equivalent of the reference's identically-partitioned vertex/adjacency
    * topics: save vertices bucketed by id and edges bucketed by src into the
    * session catalog. Joins between the two tables on the bucket key then
    * plan WITHOUT a shuffle on either side (SortMergeJoin over bucket-local
    * sorts) — at 100 TB this removes the dominant exchange from every
    * vertex⋈edge operator that runs after load. */
  def saveBucketed(g: KGraph, name: String, buckets: Int): Unit = {
    g.vertices.write.mode("overwrite")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${name}_vertices")
    g.edges.write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(s"${name}_edges")
  }

  /** Load a graph previously saved with `saveBucketed`. */
  def loadBucketed(spark: SparkSession, name: String): KGraph =
    KGraph(spark.table(s"${name}_vertices"), spark.table(s"${name}_edges"))

  // --- Generic row-frame sources/sinks (JSONL / CSV) -----------------------
  // Interchange formats for corpus frames (documents, events, …). Reads take
  // an EXPLICIT schema: inference is a corpus-scale anti-pattern — it costs a
  // full extra scan and can silently widen types between runs.

  /** Write any frame as JSON-lines (one object per row, splittable). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON-lines with an explicit schema (no inference pass). */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write any frame as ORC (columnar interchange with Hive-side readers;
    * schema travels with the file — reads need no explicit schema). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read ORC (self-describing schema). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned parquet write: one directory per distinct value
    * combination of `cols`. At 100 TB this is the coarsest and cheapest
    * pruning layer — a filter on a partition column never opens the other
    * directories at all (PartitionFilters in the scan, before row-group
    * stats even apply) — so low-cardinality dimensions every query filters
    * on (language, source, date) belong here, and high-cardinality ones do
    * not (a million directories of one file each is a listing bottleneck,
    * not a layout). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Read a partitioned parquet tree (partition columns recovered from
    * directory names). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write any frame as headered CSV; quote/escape set for lossless text
    * columns (embedded commas/quotes survive the roundtrip). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      // the writer TRIMS cell whitespace by default — losslessness first
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Read headered CSV with an explicit schema. `emptyValue`/`nullValue` are
    * left at Spark defaults — an empty text field reads back as null, which
    * callers normalize with coalesce (the roundtrip gate does). */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
}
