package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness-under-skew for the salted two-phase top-k pattern
  * (Similarity.topKPerQuery, q07's bounded Aggregator): when one key
  * owns ~95% of all rows, the salted local stage must (a) split the hot
  * key across all salt groups so no single task sorts the whole key,
  * and (b) still produce exactly the unsalted answer. This is the
  * mechanism SCALING.md's "salting for skew" claim rests on.
  */
class SkewSpec extends AnyFunSuite {
  private val Salts = 32
  private val K = 5

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 95%-skewed (key, score, id) rows: key 0 holds 9500 of 10000. */
  private lazy val skewed = {
    import spark.implicits._
    spark.range(10000)
      .select(
        when($"id" < 9500, 0L).otherwise($"id" % 50).as("key"),
        (xxhash64($"id") % 1000000).as("score"),
        $"id")
  }

  test("salted two-phase top-k equals the unsalted answer under 95% skew") {
    import spark.implicits._
    val ord = Seq($"score".desc, $"id".asc)
    val unsalted = skewed
      .withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy(ord: _*)))
      .filter($"rn" <= K).select($"key", $"score", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val salted = skewed
      .withColumn("salt", pmod(xxhash64($"id"), lit(Salts)))
      .withColumn("lrn", row_number().over(
        Window.partitionBy($"key", $"salt").orderBy(ord: _*)))
      .filter($"lrn" <= K)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy(ord: _*)))
      .filter($"rn" <= K).select($"key", $"score", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(salted == unsalted && salted.nonEmpty)
  }

  test("the hot key fans out across every salt group") {
    import spark.implicits._
    val groups = skewed
      .withColumn("salt", pmod(xxhash64($"id"), lit(Salts)))
      .filter($"key" === 0)
      .groupBy($"salt").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("n"))
    assert(groups.length == Salts, "hot key concentrated in few salt groups")
    // largest local group carries a small multiple of the mean, not the
    // whole key — the property that bounds the local sort
    val mean = groups.sum.toDouble / groups.length
    assert(groups.max < mean * 2,
      s"salt distribution badly unbalanced: max=${groups.max}, mean=$mean")
  }
}
