package graft.sinks

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** K1/K3 sink semantics: single-file NDJSON write, and create_or_extend
  * upsert parity with `fhir_etl/utils.py:101-135` — append-new,
  * keep-or-update existing, last-wins within a batch, idempotence. */
class NdjsonSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: (String, Int)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  private def readLines(dir: String, t: String): Seq[String] = {
    val p = Paths.get(dir, s"$t.ndjson")
    scala.io.Source.fromFile(p.toFile).getLines().toSeq
  }

  private def tmpDir(): String =
    Files.createTempDirectory("ndjson-spec").toString

  test("K1 write: one line per row, nulls dropped") {
    import spark.implicits._
    val dir = tmpDir()
    val d = Seq(("a", Some(1)), ("b", None)).toDF("id", "v")
    Ndjson.write(d, dir, "Thing")
    val lines = readLines(dir, "Thing")
    assert(lines == Seq("""{"id":"a","v":1}""", """{"id":"b"}"""))
  }

  test("K3 create: new file from new items") {
    val dir = tmpDir()
    Ndjson.createOrExtend(spark, df("a" -> 1, "b" -> 2), dir, "Observation")
    assert(readLines(dir, "Observation") ==
      Seq("""{"id":"a","v":1}""", """{"id":"b","v":2}"""))
  }

  test("K3 extend without update: existing ids keep old values, new append") {
    val dir = tmpDir()
    Ndjson.createOrExtend(spark, df("a" -> 1, "b" -> 2), dir, "Observation")
    Ndjson.createOrExtend(spark, df("b" -> 99, "c" -> 3), dir, "Observation")
    assert(readLines(dir, "Observation") == Seq(
      """{"id":"a","v":1}""", """{"id":"b","v":2}""", """{"id":"c","v":3}"""))
  }

  test("K3 with updateExisting: new values win, position preserved") {
    val dir = tmpDir()
    Ndjson.createOrExtend(spark, df("a" -> 1, "b" -> 2), dir, "Observation")
    Ndjson.createOrExtend(spark, df("b" -> 99, "c" -> 3), dir, "Observation",
      updateExisting = true)
    assert(readLines(dir, "Observation") == Seq(
      """{"id":"a","v":1}""", """{"id":"b","v":99}""", """{"id":"c","v":3}"""))
  }

  test("K3 idempotence: applying the same batch twice ≡ once") {
    val dir1 = tmpDir(); val dir2 = tmpDir()
    val batch = df("a" -> 1, "b" -> 2, "c" -> 3)
    Ndjson.createOrExtend(spark, batch, dir1, "Observation")
    Ndjson.createOrExtend(spark, batch, dir2, "Observation")
    Ndjson.createOrExtend(spark, batch, dir2, "Observation")
    assert(readLines(dir1, "Observation") == readLines(dir2, "Observation"))
  }

  test("K3 duplicate ids within a batch: last occurrence wins") {
    val dir = tmpDir()
    Ndjson.createOrExtend(spark, df("a" -> 1, "a" -> 2), dir, "Observation")
    assert(readLines(dir, "Observation") == Seq("""{"id":"a","v":2}"""))
  }

  test("K3 skips blank and malformed existing lines") {
    val dir = tmpDir()
    Files.write(Paths.get(dir, "Observation.ndjson"),
      "{\"id\":\"a\",\"v\":1}\n\nnot json at all\n{\"v\":5}\n".getBytes)
    Ndjson.createOrExtend(spark, df("b" -> 2), dir, "Observation")
    assert(readLines(dir, "Observation") ==
      Seq("""{"id":"a","v":1}""", """{"id":"b","v":2}"""))
  }
}
