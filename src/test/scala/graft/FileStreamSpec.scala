package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SkewUtils

/** Structured Streaming against the real driver-generated events parquet
  * (file source + event-time watermark), checked for parity with the batch
  * aggregation; plus the skew-join utility. */
class FileStreamSpec extends SparkSpec {

  test("file-source streaming hourly aggregation matches batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream needs a directory; stage the events file into one
    val dir = Files.createTempDirectory("graft-events").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // the file source needs an explicit schema — take whatever the current
    // generation of the driver's parquet actually has (ts has shipped both
    // as TIMESTAMP(NANOS)→Long and as plain TIMESTAMP), and normalize the
    // same way SparkEntry.events does
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def normTs(df: org.apache.spark.sql.DataFrame) =
      schema("ts").dataType match {
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _        => df.withColumn("ts", col("ts").cast("timestamp"))
      }

    val stream = normTs(spark.readStream.schema(schema).parquet(dir))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ev_stream").start()
    q.processAllAvailable()
    val streamed = spark.table("ev_stream")
      .select(col("window.start").as("h"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()

    val batch = normTs(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed === batch)
    assert(streamed.values.sum === 1000L)
  }

  test("edgesFromStream is source-agnostic: text file and kafka-shaped frames " +
       "feed the same EdgeStreamOps pipeline") {
    import graft.core.GraphIO
    import graft.streaming.EdgeStreamOps._
    import spark.implicits._
    val lines = Seq("1 2 12.0", "1 3 13.0", "2 3 23.0", "", "3 1 31.0")
    val expectedOut = Map(1L -> 2L, 2L -> 1L, 3L -> 1L)

    // text file source through the public seam (format is a config choice)
    val dir = Files.createTempDirectory("graft-edges").toString
    Files.write(Paths.get(s"$dir/edges.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val q = GraphIO.edgesFromStream(spark, "text", Map("path" -> dir))
      .outDegrees
      .writeStream.outputMode("complete").format("memory").queryName("eds").start()
    q.processAllAvailable()
    val streamed = spark.table("eds").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(streamed === expectedOut)

    // kafka-shaped frame (binary value + broker timestamp) through the same
    // parser: identical edges, record time becomes the event-time column
    val t0 = new java.sql.Timestamp(1700000000000L)
    val kafkaShaped = lines.zipWithIndex.map { case (l, i) =>
      (l.getBytes("UTF-8"), new java.sql.Timestamp(t0.getTime + i * 1000L)) }
      .toDF("value", "timestamp")
    val parsed = GraphIO.edgesFromRaw(kafkaShaped)
    assert(parsed.columns.toSeq === Seq("src", "dst", "value", "ts"))
    val got = parsed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 12.0), (1L, 3L, 13.0), (2L, 3L, 23.0), (3L, 1L, 31.0)))
    assert(parsed.select(min(col("ts"))).head().getTimestamp(0) === t0)
    assert(parsed.outDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === expectedOut)
  }

  test("salted join equals plain join and spreads hot keys") {
    import spark.implicits._
    // heavily skewed left: 10k rows of key 1, few others
    val left = spark.range(10000).select(lit(1L).as("k"), col("id").as("payload"))
      .unionByName(spark.range(10).select((col("id") + 2).as("k"), col("id").as("payload")))
    val right = Seq((1L, "hot"), (2L, "a"), (5L, "b")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).groupBy(col("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewUtils.saltedJoin(left, right, "k", buckets = 8)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted(1L) === 10000L)
    val hist = SkewUtils.keyHistogram(left, "k", 1).head()
    assert(hist.getLong(0) === 1L && hist.getLong(1) === 10000L)
  }
}
