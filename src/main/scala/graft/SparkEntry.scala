package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{QueryDef, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capabilities live in `graft.queries.*` registries; this object just
  * concatenates them into the Map shape the driver harness expects.
  */
object SparkEntry {

  /** Every registered capability module. (Artifacts key by query name;
    * `queries` below is a Map, so iteration order is incidental.) */
  def registries: Seq[Registry] = Seq(
    graft.queries.Relational,
    graft.queries.TextOps,
    graft.queries.Sampling,
    graft.queries.Dedup,
    graft.queries.Similarity,
    graft.queries.EventOps,
    graft.queries.GraphOps,
    graft.queries.Multimodal,
    graft.queries.Privacy,
    graft.queries.FhirEtl
  )

  def allDefs: Seq[QueryDef] = registries.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
