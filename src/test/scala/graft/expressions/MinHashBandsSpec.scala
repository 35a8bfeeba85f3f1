package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom codegen expression must be bit-identical to the built-in
  * chain it replaced (same xxhash64 fold semantics), on real corpus
  * text and on edge cases. */
class MinHashBandsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The legacy pipeline expressed with built-in functions only. */
  private def legacyBands(k: Int, numHashes: Int, numBands: Int) = {
    val rows = numHashes / numBands
    val w = split(col("text"), " ")
    val sh = when(size(w) < k, array(col("text"))).otherwise(
      array_distinct(transform(sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", slice(w, i, lit(k))))))
    val hs = transform(sh, x => xxhash64(x))
    val mins = (0 until numHashes).map(s =>
      array_min(transform(hs, h => xxhash64(lit(s), h))))
    array((0 until numBands).map(b =>
      xxhash64((0 until rows).map(r => mins(b * rows + r)): _*)): _*)
  }

  test("bit-identical to the built-in chain on sf0.001 documents") {
    graft.GraftExtensions.ensureRegistered(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      expr("minhash_bands(text, 3, 12, 4)").as("fast"),
      legacyBands(3, 12, 4).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    assert(both.count() > 0)
  }

  test("edge cases: short text, trailing spaces, single word") {
    graft.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val edge = Seq("one two", "a", "x y z w", "padded  inner", "t z q ")
      .toDF("text")
    val both = edge.select(
      expr("minhash_bands(text, 3, 12, 4)").as("fast"),
      legacyBands(3, 12, 4).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("stays inside whole-stage codegen (no fallback for the projection)") {
    graft.GraftExtensions.ensureRegistered(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(expr("minhash_bands(text)"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("minhash_bands")), plan)
  }
}
