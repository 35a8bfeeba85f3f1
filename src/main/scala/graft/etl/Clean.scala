package graft.etl

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Cleaning pass (F11–F13) — the reference's `clean_resources`
  * (`fhir_etl/utils.py:177-231`), split into the three concerns:
  *
  *  - F11 `convert_decimal_to_float`: in a typed engine this is a
  *    schema-level cast — every DecimalType at any nesting depth
  *    becomes DoubleType ([[decimalsToDouble]]);
  *  - F12 `convert_value_to_float`: numeric strings under a `"value"`
  *    key become JSON numbers. Row-dependent int-vs-float typing has no
  *    single Spark column type, so this runs where the reference runs
  *    it — on the serialized JSON ([[coerceValueStrings]]), as a
  *    codegen'd regexp over the line;
  *  - F13 `remove_empty_dicts`: our builders never construct empty
  *    structs (guarantee-by-construction, SURVEY §7.5), so the pruner
  *    exists as a sink-side JSON-tree normalizer for foreign input
  *    ([[pruneEmptyJson]], exact reference semantics incl. keep-zero).
  */
object Clean {

  // ------------------------------------------------------------------
  // F11: DecimalType → DoubleType, recursively through structs/arrays
  // ------------------------------------------------------------------
  private def castDecimals(dt: DataType): Option[DataType] = dt match {
    case _: DecimalType => Some(DoubleType)
    case s: StructType =>
      val fields = s.fields.map(f => f -> castDecimals(f.dataType))
      if (fields.exists(_._2.isDefined))
        Some(StructType(fields.map { case (f, nd) =>
          f.copy(dataType = nd.getOrElse(f.dataType)) }))
      else None
    case a: ArrayType =>
      castDecimals(a.elementType).map(e => a.copy(elementType = e))
    case m: MapType =>
      val k = castDecimals(m.keyType); val v = castDecimals(m.valueType)
      if (k.isDefined || v.isDefined)
        Some(m.copy(keyType = k.getOrElse(m.keyType),
          valueType = v.getOrElse(m.valueType)))
      else None
    case _ => None
  }

  /** Cast every (possibly nested) decimal column to double. */
  def decimalsToDouble(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      castDecimals(f.dataType) match {
        case Some(nd) => col(f.name).cast(nd).as(f.name)
        case None => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  // ------------------------------------------------------------------
  // F12: {"value": "<numeric str>"} → {"value": <number>} on the
  // serialized JSON line (utils.py:189-206: int when no '.', float
  // with '.'; one optional leading '-')
  // ------------------------------------------------------------------
  def coerceValueStrings(jsonLine: Column): Column =
    regexp_replace(jsonLine,
      "\"value\":\\s*\"(-?(?:\\d+(?:\\.\\d+)?|\\.\\d+))\"",
      "\"value\": $1")

  // ------------------------------------------------------------------
  // F13: recursive empty-dict/list pruning (utils.py:138-161) — keeps
  // zeros and false? The reference keeps `v or v == 0` (so false and ""
  // are DROPPED, 0 kept) — reproduced exactly.
  // ------------------------------------------------------------------
  private def prune(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = o.objectNode()
      o.properties().asScala.foreach { e =>
        val v = e.getValue
        if (v.isContainerNode) {
          val cleaned = prune(v)
          if (cleaned != null && cleaned.size() > 0)
            out.set[JsonNode](e.getKey, cleaned)
        } else if (keepScalar(v)) out.set[JsonNode](e.getKey, v)
      }
      out
    case a: ArrayNode =>
      val out = a.arrayNode()
      a.elements().asScala.foreach { v =>
        if (v.isContainerNode) {
          val cleaned = prune(v)
          if (cleaned != null && cleaned.size() > 0) out.add(cleaned)
        } else if (keepScalar(v)) out.add(v)
      }
      if (out.size() > 0) out else null
    case other => other
  }

  /** Python truthiness `v or v == 0`: keep non-empty strings, true,
    * all numbers (0 explicitly kept); drop "", false, null. */
  private def keepScalar(v: JsonNode): Boolean =
    v.isNumber || (v.isTextual && v.asText().nonEmpty) ||
      (v.isBoolean && v.asBoolean())

  def pruneEmptyJson(json: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val cleaned = prune(mapper.readTree(json))
    mapper.writeValueAsString(cleaned)
  }

  /** Sink-side pruner over a Dataset of NDJSON lines (JSON-tree work is
    * the documented mapPartitions-last-resort case, SURVEY §7.3). */
  def pruneEmptyLines(lines: Dataset[String]): Dataset[String] =
    lines.map(pruneEmptyJson _)(Encoders.STRING)
}
