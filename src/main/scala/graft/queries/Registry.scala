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

  /** The events table in its RAW long-nanos layout, whatever ts type
    * the files on disk carry (the driver's r12 testdata regeneration
    * switched INT64 TIMESTAMP(NANOS) to TIMESTAMP(µs)) — one adaptive
    * reader so every event query keeps a single input contract. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.readBatch(spark, s"$dir/events.parquet")

  /** ONE recursive delete for every scratch/store wipe (scratchDir,
    * contentAddressed) — does NOT descend into directory symlinks
    * (the link itself is removed, its target untouched), and fails
    * LOUDLY when an entry survives deletion: a silently half-wiped
    * content-addressed stateDir would rebuild next to stale files,
    * which is exactly the orphan hazard the wipe exists to prevent.
    * The survival check is NOFOLLOW — a dangling symlink that
    * delete() failed on would read exists()=false through the broken
    * link and slip past a follow-links check. */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).toSeq.flatten.foreach(deleteRecursively)
    if (!f.delete() && java.nio.file.Files.exists(f.toPath,
        java.nio.file.LinkOption.NOFOLLOW_LINKS))
      throw new java.io.IOException(s"scratch wipe: failed to delete $f")
  }

  /** Fixed per-name scratch directory, deleted and recreated on every
    * call — queries that write real output (e2e pipelines, layout ops)
    * use this instead of fresh createTempDirectory calls so repeated
    * Verify/Bench runs are bounded to ONE resident copy per query
    * rather than leaking corpus-sized temp dirs. */
  def scratchDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scratch", name)
    deleteRecursively(p.toFile)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Like [[scratchDir]] but NEVER deletes — for content-addressed
    * cross-run state (e.g. q4b's signature index, q99's postings)
    * whose validity is decided by the caller's own key, not by run
    * boundaries. Bounded: one small directory per distinct content
    * key. */
  def persistentScratchDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scratch", name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** The content-addressed build-once parquet store idiom shared by
    * the stored-state families (NSW/HNSW graphs, MG base sketch, …):
    * state lives under a scratch dir named by the md5 tag of `key`,
    * is valid only when the recorded key matches AND the parquet
    * `_SUCCESS` marker exists (a crash between the parquet write and
    * the key write leaves the key absent → rebuild), and is rebuilt
    * by `build` otherwise. Callers that also need to KNOW whether
    * this invocation built (build-run-only contracts) keep their own
    * copies of the idiom with the extra return — everything else
    * goes through here so the validity/ordering rules live once. */
  def contentAddressed(spark: SparkSession, prefix: String, key: String)(
      build: => DataFrame): DataFrame = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val stateDir = persistentScratchDir(s"${prefix}_$tag")
    val outDir = java.nio.file.Paths.get(stateDir, "data")
    val keyFile = java.nio.file.Paths.get(stateDir, "_graft_index_key")
    val valid = java.nio.file.Files.exists(keyFile) &&
      java.nio.file.Files.readString(keyFile) == key &&
      java.nio.file.Files.exists(outDir.resolve("_SUCCESS"))
    if (!valid) {
      // wipe the WHOLE stateDir before rebuilding, not just outDir:
      // a layout migration (e.g. the r17 'sketch'/'topk' → 'data'
      // subdir rename) would otherwise leave the old subdirs orphaned
      // next to the new one forever (r17-review ask)
      Option(new java.io.File(stateDir).listFiles).toSeq.flatten
        .foreach(deleteRecursively)
      build.write.mode("overwrite").parquet(outDir.toString)
      java.nio.file.Files.writeString(keyFile, key)
      ()
    }
    spark.read.parquet(outDir.toString)
  }

  /** `size|maxMtime` identity stamp of a parquet source, covering both
    * single-file and directory layouts — the input half of a
    * content-addressed index key (q4b signatures, q99 postings). */
  def sourceStamp(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    val (size, mtime) =
      if (java.nio.file.Files.isDirectory(p)) {
        val stream = java.nio.file.Files.list(p)
        val parts =
          try stream.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          finally stream.close()
        (parts.map(java.nio.file.Files.size).sum,
          parts.map(java.nio.file.Files.getLastModifiedTime(_).toMillis)
            .foldLeft(0L)(math.max))
      } else (java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
    s"$size|$mtime"
  }
}
