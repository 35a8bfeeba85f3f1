package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** SCALING.md's plan claims as enforced invariants, not prose: pushdown
  * reaches the scan, dimensions broadcast, windows don't re-sort, dead
  * columns don't ride exchanges. A Spark upgrade or refactor that
  * silently degrades a plan shape fails here before it costs anything
  * at scale. (PLANS.md is the committed human-readable artifact; this
  * spec is the regression gate.)
  */
class PlanShapeSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_topn")
    assert(p.contains("PushedFilters: ["), "no filter pushdown at the scan")
    // projection pruning: the lineitem scan must not read all 16 columns
    // count top-level fields by ':' — splitting on ',' would miscount
    // parameterized types like decimal(12,2)
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty &&
      readSchemas.forall(_.count(_ == ':') <= 8),
      s"scan reads an unpruned schema: $readSchemas")
  }

  test("q06: star dimensions broadcast — no shuffle join anywhere") {
    val p = plan("q06_star_broadcast")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"),
      "a dimension fell back to a shuffle join")
  }

  test("q39: decontamination filters the corpus with a broadcast semi-join") {
    val p = plan("q39_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "benchmark n-gram set is not a broadcast left-semi filter")
  }

  test("q65: bounded-key filter is pushed to the events scan") {
    val p = plan("q65_scd2_intervals")
    assert(p.contains("LessThan(user_id,20)"),
      "user_id bound did not reach PushedFilters")
  }

  test("q66: both stage windows share ONE sort on one user_id exchange") {
    val p = plan("q66_funnel")
    val sorts = "\\(\\d+\\) Sort".r.findAllIn(p).size
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userExchanges == 1,
      s"expected exactly 1 user_id exchange, found $userExchanges")
    assert(sorts == 1,
      s"expected the stacked windows to share 1 sort, found $sorts")
  }

  test("q90: packing windows per shard — no global single-partition window") {
    val p = plan("q90_sequence_packing")
    assert(p.contains("hashpartitioning(shard"),
      "running-sum window is not partitioned by shard")
    assert(!p.contains("SinglePartition, ENSURE_REQUIREMENTS"),
      "a global single-partition exchange crept into the packing plan")
  }

  test("q52: dead embedding column does not ride the argmax exchange") {
    val p = plan("q52_ivf_assign")
    val exchangeInputs = "\\(\\d+\\) Exchange\\nInput \\[\\d+\\]: \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty)
    // boundary-aware: " v#" alone would miss v# as the FIRST list entry
    val vCol = "(^|[\\[, ])v#".r
    assert(!exchangeInputs.exists(in => vCol.findFirstIn(in).isDefined),
      s"the 64-float vector column is shuffled where only (cell, cosine) " +
        s"are needed: $exchangeInputs")
  }
}
