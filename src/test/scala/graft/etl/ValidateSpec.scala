package graft.etl

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** V3 parity with the reference CLI (`README.md:35,38`) plus the full
  * end-to-end jobs: transform fixtures → NDJSON sinks → validate the
  * written directory → reference count tables. */
class ValidateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def summaryMap(dir: String): Map[String, Long] =
    Validate.summary(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("V3 on the golden 1KG META dir reproduces README.md:35") {
    assert(summaryMap("/root/reference/fhir_etl/oneKgenomes/META") == Map(
      "DocumentReference" -> 48L, "Specimen" -> 3500L,
      "ResearchStudy" -> 1L, "ResearchSubject" -> 3500L,
      "Group" -> 1L, "Patient" -> 3500L))
  }

  test("V3 on the golden GTEx META dir reproduces README.md:38 (minus elided Specimen)") {
    assert(summaryMap("/root/reference/fhir_etl/GTEx/META") == Map(
      "DocumentReference" -> 49L, "ResearchStudy" -> 1L,
      "ResearchSubject" -> 980L, "Group" -> 1L, "Patient" -> 980L))
  }

  test("end-to-end 1KG job: sinks + validate + golden-file equality") {
    val out = Files.createTempDirectory("onekg-e2e").toString
    OneKg.runAll(spark, "/root/repo/fixtures", out)
    assert(summaryMap(out) == Map(
      "DocumentReference" -> 48L, "Specimen" -> 3500L,
      "ResearchStudy" -> 1L, "ResearchSubject" -> 3500L,
      "Group" -> 1L, "Patient" -> 3500L))
    assert(Validate.errors(spark, out).count() == 0)
    // the written Patient file equals the golden per-id (sink path check)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.configure(com.fasterxml.jackson.databind.SerializationFeature
      .ORDER_MAP_ENTRIES_BY_KEYS, true)
    def canonFile(p: String) = scala.io.Source.fromFile(p).getLines()
      .filter(_.trim.nonEmpty)
      .map(l => mapper.writeValueAsString(
        mapper.treeToValue(mapper.readTree(l), classOf[Object])))
      .toSeq.sorted
    assert(canonFile(s"$out/Patient.ndjson") ==
      canonFile("/root/reference/fhir_etl/oneKgenomes/META/Patient.ndjson"))
  }

  test("end-to-end GTEx job: sinks + validate counts") {
    val out = Files.createTempDirectory("gtex-e2e").toString
    Gtex.runAll(spark, "/root/repo/fixtures", out)
    assert(summaryMap(out) == Map(
      "DocumentReference" -> 49L, "Specimen" -> 5L,
      "ResearchStudy" -> 1L, "ResearchSubject" -> 980L,
      "Group" -> 1L, "Patient" -> 980L))
    assert(Validate.errors(spark, out).count() == 0)
  }

  test("V1 quarantine: malformed lines and rule violations reported") {
    val dir = Files.createTempDirectory("validate-bad").toString
    Files.write(Paths.get(dir, "Patient.ndjson"),
      ("""{"resourceType":"Patient","id":"fb96f2a9-8ec2-5784-ba62-16f168155434","identifier":[{"value":"ok"}]}""" + "\n" +
        "not json\n" +
        """{"resourceType":"Specimen","id":"fb96f2a9-8ec2-5784-ba62-16f168155434","identifier":[{"value":"x"}]}""" + "\n" +
        """{"resourceType":"Patient","id":"not-a-uuid","identifier":[{"value":"x"}]}""" + "\n").getBytes)
    Files.write(Paths.get(dir, "ResearchSubject.ndjson"),
      ("""{"resourceType":"ResearchSubject","id":"fb96f2a9-8ec2-5784-ba62-16f168155434","identifier":[{"value":"x"}],"status":"bogus"}""" + "\n").getBytes)
    assert(summaryMap(dir) == Map("Patient" -> 1L))
    val errs = Validate.errors(spark, dir).collect()
      .map(r => r.getString(1)).toSeq
    assert(errs.exists(_.contains("malformed")))
    assert(errs.exists(_.contains("resourceType mismatch")))
    assert(errs.exists(_.contains("not a valid uuid")))
    assert(errs.exists(_.contains("status out of domain")))
  }
}
