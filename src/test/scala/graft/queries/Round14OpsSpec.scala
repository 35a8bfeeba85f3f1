package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 hardening: edge cases flagged by the r13 review (empty
  * state serves, driver-comparator shape rules, cross-engine
  * normalization). */
class Round14OpsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q9w rangeEstimates on an EMPTY events source returns an empty " +
    "frame of the serve shape, not an NPE") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("r14-empty-ev")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Relational.rangeEstimates(spark, dir.toString)
    assert(out.columns.toSeq ==
      Seq("range_id", "d_lo", "d_hi", "n_days_merged", "est_users"))
    assert(out.isEmpty, "empty per-day HLL state must serve zero ranges")
  }

  test("q9z fuzzy join: non-ASCII titles are ASCII-projected so the " +
    "Spark distance equals DuckDB's byte-based distance") {
    import spark.implicits._
    // 'café…' vs 'cafe…': raw Spark lev = 1 (codepoints) but DuckDB
    // lev = 2 (bytes). Projected both become 'caf…' vs 'cafe…' → 1 on
    // BOTH engines. The pair shares an 8-char block prefix after the
    // divergence point... careful: block is the RAW prefix, so keep
    // the edit beyond char 8.
    val docs = Seq(
      (1L, "shared-bk café title x"),
      (2L, "shared-bk cafe title x")).toDF("doc_id", "text")
    val out = Dedup.fuzzyJoin(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    // projected: "shared-bk caf title x" vs "shared-bk cafe title x"
    // → one insertion = distance 1, the byte distance DuckDB computes
    // on the same projected strings
    assert(r.getLong(2) == 1L, s"expected projected distance 1, got $r")
  }
}
