package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validation layer (V1–V3) — the reference's `fhir_etl validate` CLI
  * (`fhir_etl/cli.py:17-45`): per-type counts over a META directory of
  * NDJSON files plus a per-line error report, re-expressed as one
  * distributed scan per file.
  *
  * V1 structural rules are a declarative column rule-set (required
  * fields, enum domains, uuid shape) instead of pydantic model
  * validation; invalid rows land in an error DataFrame (quarantine)
  * rather than stdout. V2 is the supported-type set. V3 is the
  * directory job whose summary must reproduce `README.md:35,38`
  * (ValidateSpec pins that).
  */
object Validate {

  /** V2: resource types the engine knows how to validate. */
  val SupportedTypes: Set[String] = Set(
    "Patient", "Specimen", "ResearchSubject", "ResearchStudy",
    "DocumentReference", "Group", "Observation")

  private val UuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"

  /** Enum domains per type (V1 semantic rules; FHIR R5 value sets as
    * exercised by the reference outputs). */
  private val StatusDomain: Map[String, Seq[String]] = Map(
    "ResearchSubject" -> Seq("candidate", "eligible", "on-study",
      "off-study", "withdrawn", "screening", "potential-candidate"),
    "ResearchStudy" -> Seq("active", "administratively-completed",
      "approved", "closed-to-accrual", "completed", "in-review",
      "withdrawn"),
    "DocumentReference" -> Seq("current", "superseded", "entered-in-error"))

  /** Partial schema for the fields the rules inspect — `from_json`
    * parses each line ONCE against it (extra fields are ignored, a
    * malformed line yields an all-null struct in PERMISSIVE mode).
    * Replaces four `get_json_object` calls that each re-parsed the full
    * line (4× the parse work — was 11s of the sf0.1 bench). */
  private val RuleSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "resourceType STRING, id STRING, status STRING, " +
      "identifier ARRAY<STRUCT<value STRING>>")

  /** Validate one NDJSON file: returns rows
    * (file, resource_type, ok BOOLEAN, reason, line). Line-based and
    * schema-free, so a malformed line can never poison the scan. */
  def validateFile(spark: SparkSession, path: String,
      expectedType: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.read.text(path)
      .filter(length(trim($"value")) > 0)
      .select($"value".as("line"), from_json($"value", RuleSchema).as("j"))
      .select($"line",
        $"j.resourceType".as("rt"),
        $"j.id".as("id"),
        $"j.status".as("status"),
        // `get` (0-based), not element_at/getItem: ANSI mode throws OOB
        get($"j.identifier", lit(0)).getField("value").as("ident0"))
    val statusRule = StatusDomain.get(expectedType) match {
      case Some(domain) => $"status".isin(domain: _*)
      case None => lit(true)
    }
    val reason = when($"rt".isNull, "malformed JSON or missing resourceType")
      .when($"rt" =!= expectedType,
        concat(lit(s"resourceType mismatch: expected $expectedType, got "), $"rt"))
      .when(!lit(SupportedTypes.contains(expectedType)),
        lit(s"unsupported resource type $expectedType"))
      .when($"id".isNull || !$"id".rlike(UuidRe), "id is not a valid uuid")
      .when($"ident0".isNull, "missing identifier[0].value")
      .when(!statusRule, concat(lit("status out of domain: "), $"status"))
    parsed.select(
      lit(new java.io.File(path).getName).as("file"),
      lit(expectedType).as("resource_type"),
      $"id",
      reason.isNull.as("ok"),
      reason.as("reason"),
      substring($"line", 1, 80).as("line"))
  }

  /** V3: validate every `<Type>.ndjson` in a directory. */
  def validateDir(spark: SparkSession, dir: String): DataFrame = {
    val files = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".ndjson")).sortBy(_.getName)
    files.map { f =>
      validateFile(spark, f.getPath, f.getName.stripSuffix(".ndjson"))
    }.reduce(_ unionByName _)
  }

  /** The summary the reference CLI prints: `{type: count}` of valid
    * resources (README.md:35,38). */
  def summary(spark: SparkSession, dir: String): DataFrame =
    validateDir(spark, dir).filter(col("ok"))
      .groupBy(col("resource_type"))
      .agg(count(lit(1)).as("n_valid"))
      .orderBy(col("resource_type"))

  /** Like [[summary]] but with id extremes per type — the e2e-pipeline
    * gate shape (counts alone can't catch a minting regression; min/max
    * id pin the uuid5 chain of the engine's own written output). */
  def profile(spark: SparkSession, dir: String): DataFrame =
    validateDir(spark, dir).filter(col("ok"))
      .groupBy(col("resource_type"))
      .agg(count(lit(1)).as("n_valid"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("resource_type"))

  /** Per-line quarantine report (path:line-snippet exception analogue). */
  def errors(spark: SparkSession, dir: String): DataFrame =
    validateDir(spark, dir).filter(!col("ok"))
      .select(col("file"), col("reason"), col("line"))
}
