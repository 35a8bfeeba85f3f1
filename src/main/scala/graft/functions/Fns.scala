package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library — the reference's pure helpers re-expressed as
  * Catalyst column expressions (no UDFs: everything stays inside
  * whole-stage codegen, which matters when these run per-row over 100 TB).
  *
  * Reference semantics (cited per function):
  *  F1 `get_data_format`  fhir_etl/utils.py:58-68
  *  F2 `get_chromosome`   fhir_etl/utils.py:71-77
  *  F3 `parse_mdtm`       fhir_etl/utils.py:80-88
  *  F4 `get_mime_type`    fhir_etl/utils.py:90-92 (+ text/vcf at :24-25)
  *  F7 SAMPID strip       fhir_etl/GTEx/gtex_fhirizer.py:92-95
  *  F8 age-bracket range  fhir_etl/GTEx/gtex_fhirizer.py:148
  *  F14 tz suffix         fhir_etl/oneKgenomes/document_references.py:98
  */
object Fns {

  /** F1: strip trailing compression/index extensions (gz/tbi/csi, case-
    * insensitive), then uppercase the remaining last extension; "UNKNOWN"
    * when no extension remains. The regex strip of the trailing run is
    * equivalent to the reference's pop-while loop incl. its keep-at-least-
    * one-part rule (a name reduced to a single part has no extension). */
  def dataFormat(name: Column): Column = {
    val stripped = regexp_replace(name, "(?i)(\\.(gz|tbi|csi))+$", "")
    val parts = split(stripped, "\\.")
    when(size(parts) > 1, upper(element_at(parts, -1))).otherwise(lit("UNKNOWN"))
  }

  /** F2: chromosome token (chr1 … chrX/chrY/chrMT) uppercased, else null. */
  def chromosome(name: Column): Column = {
    val m = regexp_extract(name, "(?i)\\bchr([0-9XYMT]+)\\b", 1)
    when(m =!= "", upper(m))
  }

  /** F3: FTP MDTM response "213 yyyyMMddHHmmss" → bare ISO-8601 string.
    * The reference's now()-fallback is injectable here (determinism —
    * SURVEY §7.5): pass the clock value the caller wants, or null to
    * propagate parse failure as null. */
  def parseMdtm(mdtm: Column, fallbackIso: Column = lit(null)): Column =
    coalesce(
      date_format(
        try_to_timestamp(substring(mdtm, 5, 14), lit("yyyyMMddHHmmss")),
        "yyyy-MM-dd'T'HH:mm:ss"),
      fallbackIso)

  /** F4: static extension→mime table mirroring Python `mimetypes` for the
    * extensions present in the corpus, incl. the reference's custom
    * `text/vcf` registration and the strip-encoding-suffix loop
    * (.gz/.bz2/.xz/.z/.br). Unknown/absent extension →
    * application/octet-stream (the reference's `or` default). */
  private val mimeTable: Map[String, String] = Map(
    "vcf" -> "text/vcf",
    "txt" -> "text/plain", "csv" -> "text/csv",
    "tsv" -> "text/tab-separated-values",
    "json" -> "application/json", "xml" -> "text/xml",
    "html" -> "text/html", "htm" -> "text/html",
    "pdf" -> "application/pdf",
    // x-zip-compressed / x-tar / xlsx pinned by the reference's golden
    // GTEx DocumentReference contentTypes (its mimetypes environment)
    "zip" -> "application/x-zip-compressed", "tar" -> "application/x-tar",
    "xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "png" -> "image/png", "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg",
    "gif" -> "image/gif")

  /** `default` differs per pipeline: "application/octet-stream" for 1KG
    * (utils.py:92), "Unknown" for GTEx (gtex_fhirizer.py:281). */
  def mimeType(name: Column,
      default: String = "application/octet-stream"): Column = {
    val stripped = regexp_replace(name, "(?i)(\\.(gz|bz2|xz|z|br))+$", "")
    val parts = split(stripped, "\\.")
    when(size(parts) > 1,
      coalesce(element_at(typedLit(mimeTable), lower(element_at(parts, -1))),
        lit(default)))
      .otherwise(lit(default))
  }

  /** F7: GTEx SAMPID → last two dash segments ("GTEX-1117F-0003-SM-4JBJ3"
    * → "SM-4JBJ3"); identity when fewer than two segments. */
  def sampidKey(sampid: Column): Column = {
    val parts = split(sampid, "-")
    when(size(parts) >= 2,
      concat_ws("-", element_at(parts, -2), element_at(parts, -1)))
      .otherwise(sampid)
  }

  /** F8: age bracket "lo-hi" → birth-year-range string
    * "{year-hi} - {year-lo}" (hard-coded year 2025 in the reference,
    * exposed as a parameter here). */
  def birthYearRange(bracket: Column, year: Int = 2025): Column = {
    val parts = split(bracket, "-")
    val lo = element_at(parts, 1).cast("int")
    val hi = element_at(parts, 2).cast("int")
    concat((lit(year) - hi).cast("string"), lit(" - "),
      (lit(year) - lo).cast("string"))
  }

  /** F14: explicit-UTC suffix on a bare ISO timestamp string. */
  def withUtcOffset(iso: Column): Column = concat(iso, lit("+00:00"))
}
