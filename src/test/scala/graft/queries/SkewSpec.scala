package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness-under-skew for the salted two-phase top-k
  * (Similarity.topKPerQuery — the REAL helper, not a replica): when one
  * key owns ~95% of all rows, the salted local stage must (a) split the
  * hot key across all salt groups so no single task sorts the whole
  * key, and (b) still produce exactly the unsalted answer. This is the
  * mechanism SCALING.md's "salting for skew" claim rests on.
  */
class SkewSpec extends AnyFunSuite {
  private val K = Similarity.K

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 95%-skewed scored rows in topKPerQuery's input shape: q_id 0 holds
    * 9500 of 10000 candidates; cold keys start at 1 so hot and cold
    * never overlap. */
  private lazy val skewed = {
    import spark.implicits._
    spark.range(10000)
      .select(
        when($"id" < 9500, 0L).otherwise(lit(1L) + $"id" % 49).as("q_id"),
        $"id".as("neighbor_id"),
        (xxhash64($"id") % 1000000).cast("double").as("cosine"))
  }

  test("topKPerQuery equals the unsalted window answer under 95% skew") {
    import spark.implicits._
    val unsalted = skewed
      .withColumn("rn", row_number().over(
        Window.partitionBy($"q_id")
          .orderBy($"cosine".desc, $"neighbor_id".asc)))
      .filter($"rn" <= K).select($"q_id", $"neighbor_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val salted = Similarity.topKPerQuery(skewed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(salted == unsalted && salted.nonEmpty)
  }

  test("the hot key fans out across every salt group") {
    import spark.implicits._
    val salts = 32 // TopKSalts — pinned; drift caught by the equality test
    val groups = skewed
      .withColumn("salt", pmod(xxhash64($"neighbor_id"), lit(salts)))
      .filter($"q_id" === 0)
      .groupBy($"salt").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("n"))
    assert(groups.length == salts, "hot key concentrated in few salt groups")
    // largest local group carries a small multiple of the mean, not the
    // whole key — the property that bounds the local sort
    val mean = groups.sum.toDouble / groups.length
    assert(groups.max < mean * 2,
      s"salt distribution badly unbalanced: max=${groups.max}, mean=$mean")
  }
}
