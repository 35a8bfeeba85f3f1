package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CLI entry-point parity with the reference's command surface
  * (`fhir_etl/cli.py:12-65`): `transform -p {1kgenomes,gtex}` runs the
  * full ETL into the out dir; `validate --path` prints counts + error
  * rows and exits 1 on any invalid line, 2 on a bad path — driven
  * end-to-end on fixtures through [[Main.run]]. */
class MainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("transform -p 1kgenomes writes the full META dir; validate exits 0 on it") {
    val out = Files.createTempDirectory("cli-1kg").toString
    assert(Main.run(spark, Array("transform", "-p", "1kgenomes",
      "--fixtures", "/root/repo/fixtures", "--out", out)) == 0)
    val written = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.endsWith(".ndjson")).sorted.toSeq
    assert(written == Seq("DocumentReference.ndjson", "Group.ndjson",
      "Patient.ndjson", "ResearchStudy.ndjson", "ResearchSubject.ndjson",
      "Specimen.ndjson"))
    assert(Main.run(spark, Array("validate", "--path", out)) == 0)
  }

  test("transform -p gtex end-to-end; validate exits 0 on it") {
    val out = Files.createTempDirectory("cli-gtex").toString
    assert(Main.run(spark, Array("transform", "-p", "gtex",
      "--fixtures", "/root/repo/fixtures", "--out", out)) == 0)
    assert(Main.run(spark, Array("validate", "--path", out)) == 0)
  }

  test("validate exits 1 when any line is invalid — cli.py:44") {
    val dir = Files.createTempDirectory("cli-bad").toString
    Files.write(Paths.get(dir, "Patient.ndjson"),
      ("""{"resourceType":"Patient","id":"fb96f2a9-8ec2-5784-ba62-16f168155434","identifier":[{"value":"ok"}]}""" + "\n" +
        "not json\n").getBytes)
    assert(Main.run(spark, Array("validate", "--path", dir)) == 1)
  }

  test("validate on a non-directory path is an error (ValueError analogue)") {
    assert(Main.run(spark, Array("validate", "--path", "/no/such/dir")) == 2)
  }

  test("bad invocations exit 2 with usage") {
    assert(Main.run(spark, Array.empty[String]) == 2)
    assert(Main.run(spark, Array("frobnicate")) == 2)
    assert(Main.run(spark, Array("transform")) == 2)
    assert(Main.run(spark, Array("transform", "-p", "nope")) == 2)
    assert(Main.run(spark, Array("validate")) == 2)
  }
}
