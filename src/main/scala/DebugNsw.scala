import org.apache.spark.sql.SparkSession
object DebugNsw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val t0 = System.nanoTime
      val rows = graft.queries.Similarity.nswRecall(spark, s"/root/testdata/$sf").collect()
      println(f"$sf mean_recall=${rows.head.getDouble(4)} in ${(System.nanoTime-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
