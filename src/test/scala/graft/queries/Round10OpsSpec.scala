package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Result-level contracts for the round-10 operators, each pinned
  * against an independent in-JVM recompute (never against the engine's
  * own expressions). */
class Round10OpsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------------------------------------------------------
  // q9a: batch perceptron training loop
  // ---------------------------------------------------------------

  /** Pure-Scala replay of the q9a training loop over raw (text, lang)
    * rows — counts computed with string scans, no Spark expressions. */
  private def bruteForcePerceptron(docs: Seq[(String, String)],
      rounds: Int): Seq[(Int, Long, Seq[Long])] = {
    val feats = docs.map { case (text, lang) =>
      val y = if (lang == "en") 1L else -1L
      val toks = text.split(" ", -1).count(_.nonEmpty).toLong
      val vowels = text.count("aeiou".contains(_)).toLong
      val st = text.count(c => c == 's' || c == 't').toLong
      (y, Seq(1L, text.length.toLong, toks, vowels, st))
    }
    val w = Array.fill(5)(0L)
    (1 to rounds).map { r =>
      val mis = feats.filter { case (y, x) =>
        y * x.zip(w.toSeq).map { case (a, b) => a * b }.sum <= 0
      }
      val g = (0 until 5).map(i => mis.map { case (y, x) => y * x(i) }.sum)
      for (i <- 0 until 5) w(i) += g(i)
      (r, mis.size.toLong, w.toSeq)
    }
  }

  test("q9a: engine training trajectory equals the pure-Scala replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val expected = bruteForcePerceptron(docs, TextOps.PerceptronRounds)
    val got = TextOps.perceptronTrain(spark, sfDir)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
      .toSeq
    assert(got == expected,
      s"trajectory mismatch:\n engine: $got\n replay: $expected")
  }

  test("q9a: a zero-error round freezes the weights for all later rounds") {
    // single-class corpus: round 1 misclassifies everything (margin 0
    // under w=0), the update then classifies every row correctly, and
    // rounds 2..n must emit n_err=0 with UNCHANGED weights
    val dir = java.nio.file.Files.createTempDirectory("q9a_fix").toString
    import spark.implicits._
    Seq((1L, "spark table scan", "en"), (2L, "merge sort join", "en"),
      (3L, "hash agg window", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.perceptronTrain(spark, dir).orderBy("round").collect()
    assert(rows.head.getLong(1) == 3L, "round 1 must misclassify all rows")
    val w1 = (2 to 6).map(rows.head.getLong(_))
    for (r <- rows.tail) {
      assert(r.getLong(1) == 0L, s"round ${r.getInt(0)} should be error-free")
      assert((2 to 6).map(r.getLong(_)) == w1,
        "weights must freeze once the gradient is zero")
    }
  }
}
