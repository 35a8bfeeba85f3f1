package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface over the `events` table (SURVEY §2.7):
  * the batch and streaming paths share ONE transform — streaming is a
  * different scheduler for the same Catalyst plan, which is the whole
  * point of building on DataFrames. StreamingSpec proves the drained
  * stream equals the batch result.
  *
  * At scale this is the ingest topology: `readStream` over an
  * append-only file/queue source, watermarked event-time windows,
  * partial-state aggregation per trigger — no driver-side state.
  */
object EventStream {

  /** events.parquet physical schema (ts is INT64 nanos — see
    * graft.queries.EventOps for the lossless µs rebuild). */
  val RawSchema: StructType = StructType.fromDDL(
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** The shared transform: nanos→timestamp, watermark, tumbling-window
    * counts + sums per event type. Works on batch AND streaming frames. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming source over a directory of event parquet files. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(RawSchema).parquet(dir)
  }

  /** Batch source with the identical schema (parity testing + backfill). */
  def readBatch(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.schema(RawSchema).parquet(dir)
  }
}
