package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver harness.
  *
  * @param name   stable key — shows up in CORRECTNESS/BENCH artifacts
  * @param fn     (session, sfDir) => result; sfDir holds the parquet tables
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               tables (views named after the parquet files). None ⇒ the
  *               operator is not SQL-expressible (e.g. MinHash-LSH) and the
  *               driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

trait Registry {
  def defs: Seq[QueryDef]
}

/** Parquet table access for the driver testdata layout
  * (sf dir holding one parquet file per table — TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
