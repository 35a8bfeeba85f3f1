package graft.fhir

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression builders for the FHIR resource trees the reference
  * constructs row-at-a-time with pydantic models (SURVEY §1.1). All
  * output is nested struct/array columns; optional fields are `when`-
  * guarded nulls, which the JSON sink drops — that reproduces the
  * reference's remove-empty pruning (`fhir_etl/utils.py:138-161`)
  * by construction (SURVEY §7.5 item 3).
  *
  * Extension elements carry either a valueString or a valueReference
  * (e.g. `fhir_etl/oneKgenomes/oneKg_fhirizer.py:80-103`); Spark arrays
  * are homogeneous, so both shapes share one struct type with the unused
  * branch null (dropped on serialization).
  */
object FhirBuild {

  val PartOfStudyUrl = "http://fhir-aggregator.org/fhir/StructureDefinition/part-of-study"
  val UsCoreSexUrl = "https://hl7.org/fhir/us/core/STU3.1.1/StructureDefinition-us-core-sex.html"
  val UsCoreRaceUrl = "https://hl7.org/fhir/us/core/STU3.1.1/StructureDefinition-us-core-race.html"
  val ResearchPopulationUrl = "https://nih-ncpi.github.io/ncpi-fhir-ig-2/StructureDefinition-research-population.html"

  private val nullRef = lit(null).cast("struct<reference:string>")
  private val nullStr = lit(null).cast("string")

  /** Extension with a valueString; null (absent) when the value is null
    * — the reference's `pd.notna` guard (P15). */
  def extString(url: String, value: Column): Column =
    when(value.isNotNull, struct(lit(url).as("url"), value.as("valueString"),
      nullRef.as("valueReference")))

  /** Extension with a valueReference (always present). */
  def extReference(url: String, reference: Column): Column =
    struct(lit(url).as("url"), nullStr.as("valueString"),
      struct(reference.as("reference")).as("valueReference"))

  /** Extension array keeping only present entries, in declaration order. */
  def extensions(exts: Column*): Column =
    filter(array(exts: _*), e => e.isNotNull)

  /** `{"use": "official", "system": …, "value": …}` identifier array. */
  def officialIdentifier(system: String, value: Column): Column =
    array(struct(lit("official").as("use"), lit(system).as("system"),
      value.as("value")))

  /** Identifier without `use` (ResearchStudy/Group shape). */
  def bareIdentifier(system: String, value: Column): Column =
    array(struct(lit(system).as("system"), value.as("value")))

  /** meta.profile envelope. */
  def metaProfile(profileUrl: String): Column =
    struct(array(lit(profileUrl)).as("profile"))

  /** Single-coding CodeableConcept. */
  def codeableConcept(system: String, code: Column, display: Column): Column =
    struct(array(struct(lit(system).as("system"), code.as("code"),
      display.as("display"))).as("coding"))

  /** `{"reference": "<Type>/<id>"}`. */
  def reference(ref: Column): Column = struct(ref.as("reference"))
}
