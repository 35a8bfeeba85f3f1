package graft

import org.apache.spark.sql.SparkSession

/** r21 diagnostic: enumerate every registry query whose ANALYZED plan
  * (or any plan materialized during construction) contains a Window
  * operator with an empty partition spec — the sources of the
  * entry-run "No Partition Defined" warnings. Reporting only. */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // windowspecdefinition whose first argument is already the ORDER
    // column (no partition columns in front)
    val bare = """windowspecdefinition\([^,)]+ (ASC|DESC)""".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val (df, captured) = PlanAudit.buildCapturing(spark,
          () => fn(spark, sfDir))
        val inResult = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.size
        val inCaptured = captured.count(p => bare.findFirstIn(p).isDefined)
        if (inResult > 0 || inCaptured > 0)
          println(s"[windowscan] $name result=$inResult captured=$inCaptured")
      } catch {
        case e: Throwable =>
          println(s"[windowscan] $name ERROR ${e.getClass.getSimpleName}")
      }
    }
    println("[windowscan] done")
    spark.stop()
  }
}
