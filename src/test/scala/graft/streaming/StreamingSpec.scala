package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming parity (SURVEY §2.7): EventStream.windowedCounts
  * is ONE transform shared by batch and streaming; draining the finite
  * file stream must produce exactly the batch result. */
class StreamingSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming tumbling-window counts == batch counts over events") {
    // the file stream source wants a directory; stage the single file
    val streamDir = java.nio.file.Files.createTempDirectory("evt-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))

    val query = EventStream
      .windowedCounts(EventStream.readStream(spark, streamDir.toString))
      .writeStream.format("memory").queryName("evt_stream")
      .outputMode("complete").start()
    try query.processAllAvailable() finally query.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val got = spark.table("evt_stream").collect().map(key).toSet
    val want = EventStream
      .windowedCounts(EventStream.readBatch(spark, s"$sfDir/events.parquet"))
      .collect().map(key).toSet
    assert(got == want && got.nonEmpty)
  }
}
