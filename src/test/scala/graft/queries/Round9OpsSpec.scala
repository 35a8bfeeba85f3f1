package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Result-level contracts for the round-9 operators: cross-run reuse of
  * q4b's stored signature index (the serve path must do zero
  * corpus-side sketch work while the corpus is unchanged), proven from
  * the reuse flag, the reused scan's executed plan, and run-to-run
  * result identity. */
class Round9OpsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def delTree(p: java.nio.file.Path): Unit = {
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).toSeq.flatten.foreach(del)
      f.delete(); ()
    }
    del(p.toFile)
  }

  test("q4b signature index: second run reuses the stored index " +
    "with zero corpus-side sketch work") {
    // start from a clean slate — the content-addressed dir may hold an
    // index from an earlier session against the same (unchanged) corpus
    val (_, _, indexDir) = Dedup.loadOrBuildSigIndex(spark, sfDir)
    delTree(java.nio.file.Paths.get(indexDir))

    val (_, builtFirst, _) = Dedup.loadOrBuildSigIndex(spark, sfDir)
    assert(builtFirst, "fresh dir must trigger an index build")
    val (reused, builtSecond, dir2) = Dedup.loadOrBuildSigIndex(spark, sfDir)
    assert(!builtSecond, "unchanged corpus must reuse the stored index")
    assert(dir2 == indexDir, "content key drifted between identical calls")

    // the reused frame's EXECUTED plan is a bare parquet scan over the
    // stored triples: exactly one file scan, rooted in the index dir,
    // with no sketch kernel anywhere in the tree — the corpus is not
    // re-sketched, not even lazily
    val plan = reused.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
    val roots = scans.head.relation.location.rootPaths.map(_.toString)
    assert(roots.forall(_.contains(indexDir)),
      s"reused scan reads $roots, not the stored index at $indexDir")
    val tree = plan.toString
    assert(!tree.contains("minhash_bands") && !tree.contains("shingle"),
      "reuse path still contains a sketch kernel")

    // different corpus ⇒ different content address (no cross-corpus
    // contamination is possible — they live in different directories)
    val (_, _, otherDir) =
      Dedup.loadOrBuildSigIndex(spark, "/root/testdata/sf0.001")
    assert(otherDir != indexDir, "distinct corpora share an index dir")

    // and the registered query is bit-identical across build/reuse runs
    def rows() = graft.SparkEntry.queries("q4b_incremental_neardup")(
      spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = rows()
    val b = rows()
    assert(a == b && a.nonEmpty, "reuse run diverged from build run")
  }
}
