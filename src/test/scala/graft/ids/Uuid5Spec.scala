package graft.ids

import org.scalatest.funsuite.AnyFunSuite

class Uuid5Spec extends AnyFunSuite {

  // Diverse name corpus incl. unicode (multi-byte UTF-8), empties,
  // pipes/slashes as used by the minting convention.
  private val samples: Seq[String] = Seq(
    "", "a", "HG00096", "Patient/x|y", "1KG/ResearchStudy//|",
    "ünïcode-ß-試験-🧬", "  spaces  ", "line\nbreak", "\t", "0",
    "https://https://doubled.example/", "very" * 100)

  // RFC-4122 / Python-uuid reference vectors.
  test("uuid3 matches Python uuid3(NAMESPACE_DNS, 'python.org')") {
    assert(Uuid5.uuid3(Uuid5.NamespaceDns, "python.org").toString ==
      "6fa459ea-ee8a-3ca4-894e-db77e160355e")
  }

  test("uuid5 matches Python uuid5(NAMESPACE_DNS, 'python.org')") {
    assert(Uuid5.uuid5(Uuid5.NamespaceDns, "python.org").toString ==
      "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  // Golden pins from the reference's committed outputs
  // (/root/reference/fhir_etl/oneKgenomes/META/*.ndjson). The identifier
  // system carries the reference's own doubled-scheme quirk
  // ("https://" + site-that-already-has-https) — frozen on purpose
  // (SURVEY.md §7.5 risk 1).
  private val oneKgSystem =
    "https://https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/technical/working/20130606_sample_info/"

  test("1KG Patient HG00096 golden id") {
    assert(IdMinter.oneKg.mintIdentifier("Patient", oneKgSystem, "HG00096") ==
      "fb96f2a9-8ec2-5784-ba62-16f168155434")
  }

  test("1KG ResearchStudy golden id") {
    assert(IdMinter.oneKg.mintIdentifier("ResearchStudy", oneKgSystem, "1KG") ==
      "4502d1f5-5275-5be7-9942-21f7fb8a6f70")
  }

  test("isValidUuid accepts minted ids, rejects junk and null") {
    assert(Uuid5.isValidUuid("fb96f2a9-8ec2-5784-ba62-16f168155434"))
    assert(!Uuid5.isValidUuid("not-a-uuid"))
    assert(!Uuid5.isValidUuid(null))
  }

  test("version and variant bits are set per RFC-4122") {
    samples.foreach { s =>
      val u3 = Uuid5.uuid3(Uuid5.NamespaceDns, s)
      val u5 = Uuid5.uuid5(Uuid5.NamespaceDns, s)
      assert(u3.version == 3 && u3.variant == 2, s"v3 bits for '$s'")
      assert(u5.version == 5 && u5.variant == 2, s"v5 bits for '$s'")
    }
  }

  test("minting is deterministic, project-scoped, and valid") {
    samples.foreach { s =>
      assert(IdMinter.oneKg.mint(s) == IdMinter.oneKg.mint(s))
      assert(IdMinter.oneKg.mint(s) != IdMinter.gtex.mint(s))
      assert(Uuid5.isValidUuid(IdMinter.oneKg.mint(s)))
    }
  }

  test("namespace equals uuid3 of site") {
    assert(IdMinter.oneKg.namespace ==
      Uuid5.uuid3(Uuid5.NamespaceDns, IdMinter.ThousandGenomesSite))
  }
}
