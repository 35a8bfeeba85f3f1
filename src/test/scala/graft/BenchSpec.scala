package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's honesty contract: a failing query must surface
  * as `err` — never as a flattering ~0.06s fail-fast time — and any err
  * poisons vs_baseline to JSON null so a partially-broken suite can't
  * read as fast (r11's event family silently fail-fasted and made
  * BENCH_r11 look better than the suite deserved). */
class BenchSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ok(s: SparkSession, dir: String): DataFrame =
    s.range(10).toDF("id")

  private def boom(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/no_such_table_ever.parquet")

  test("a throwing query records err=true with no recorded passes") {
    val results = Bench.runSuite(spark, sfDir,
      Seq("q_ok_fast" -> (ok _), "q_bad_boom" -> (boom _)))
    val byName = results.map(q => q.name -> q).toMap
    assert(!byName("q_ok_fast").err)
    assert(byName("q_ok_fast").passes.nonEmpty)
    assert(byName("q_bad_boom").err)
    assert(byName("q_bad_boom").passes.isEmpty,
      "an erred query must not contribute a timed pass")
    assert(byName("q_bad_boom").min == 0.0)
  }

  test("metric line: err_count populated, vs_baseline null, total excludes errs") {
    val results = Bench.runSuite(spark, sfDir,
      Seq("q_ok_fast" -> (ok _), "q_bad_boom" -> (boom _)))
    val line = Bench.metricLine(results, baselinePin = 66.0, loadAvg = 1.0,
      gcTotalSec = 0.1, rssMb = 100, sfDir = sfDir)
    assert(line.contains(""""err_count":1"""), line)
    assert(line.contains(""""vs_baseline":null"""), line)
    // the err NAMES live on the diag line, not the bounded metric line
    assert(Bench.diagLine(results).contains(""""err":["q_bad_boom"]"""))
    // total = the ok query's time only — strictly less than a second
    // here, and definitely not a 66s-scale number
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line)
      .get.group(1).toDouble
    assert(total < 5.0, s"total should only include the ok query: $line")
    // the driver json-loads this line verbatim — it must stay valid JSON
    assert(line.startsWith("{") && line.endsWith("}"))
  }

  test("clean suite: no errs, vs_baseline numeric, per-query map on diag") {
    val results = Bench.runSuite(spark, sfDir, Seq("q_ok_fast" -> (ok _)))
    assert(results.forall(!_.err))
    val line = Bench.metricLine(results, 66.0, 1.0, 0.0, 100, sfDir)
    assert(line.contains(""""err_count":0"""), line)
    assert(!line.contains(""""vs_baseline":null"""), line)
    val diag = Bench.diagLine(results)
    assert(diag.contains("bench_diag") && diag.contains(""""queries":{"""))
  }

  test("metric line stays constant-size: <400 bytes for a 200-query suite") {
    // r13's line grew with the suite (2.5 KB of per-query entries) and
    // scrolled its own head out of the driver's ~2.3 KB stdout tail —
    // parsed:null. The line must not scale with the registry.
    val results = (1 to 200).map(i =>
      Bench.QTime(f"q$i%03d_synthetic_name_of_typical_length", Seq(1.234, 1.456),
        0.05, err = false))
    val line = Bench.metricLine(results, 91.0, 1.0, 12.3, 4096,
      "/root/testdata/sf0.1")
    assert(line.length < 400,
      s"metric line must stay truncation-proof: ${line.length} bytes: $line")
    assert(line.contains(""""n_queries":200"""))
  }
}
