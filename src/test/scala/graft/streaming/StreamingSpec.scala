package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming surface (SURVEY §2.7): the same window
  * expressions that drive the batch event-time queries run as a
  * streaming aggregation with a watermark, and produce identical
  * results once the (finite) file stream is drained — streaming is a
  * different scheduler for the same plan, not different code. */
class StreamingSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming tumbling-window counts == batch counts over events") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")

    def windowed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", "2 hours")
      .groupBy(window($"ets", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"event_type", $"n")

    // the file stream source wants a directory; stage the single file
    val streamDir = java.nio.file.Files.createTempDirectory("evt-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
    val query = windowed(stream).writeStream
      .format("memory").queryName("evt_stream").outputMode("complete")
      .start()
    try query.processAllAvailable() finally query.stop()

    val got = spark.table("evt_stream").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = windowed(spark.read.schema(schema)
      .parquet(s"$sfDir/events.parquet")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }
}
