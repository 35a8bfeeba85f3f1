package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables.table

/** Link-analysis operators over a deterministic document link graph —
  * the web-graph half of corpus curation: quality signals derived from
  * structure (PageRank) rather than content (q32/q9d). At 100 TB the
  * crawl graph is edges-on-disk and rank is the canonical iterative
  * join+aggregate workload, so the plan shape here IS the scale story:
  * every iteration is one shuffle on dst (partial-agg combined) plus a
  * rank join on src; nothing driver-side grows with the graph.
  *
  * The graph is SYNTHESIZED map-side from the documents table (each doc
  * links to OutDegree md5-derived targets), because the driver testdata
  * has no link column — the derivation is replayed verbatim by the
  * DuckDB oracle, so the whole computation stays hash-gated.
  */
object GraphOps extends Registry {

  /** Out-degree of every node (constant ⇒ no dangling mass, and the
    * per-edge contribution divides by a literal). */
  val OutDegree = 3

  /** Unrolled power iterations — bounded like q97's BPE rounds; each
    * round's lineage is one join + one agg deeper, no driver state. */
  val Iterations = 3

  /** All-integer PageRank in micro-units: rank₀ = 1_000_000 per node;
    * contribution = rank div 3 (integer); update = 150_000 +
    * (85 · Σcontrib) div 100 — the damping-0.85 update with every
    * division integral, so Spark and DuckDB agree bit-for-bit (the q9a
    * zero-float-residual standard, stronger than the ln-based scores).
    *
    * Edge derivation: dst = md5(src ">" j) first-8-hex mod N for
    * j ∈ 1..3. N (the node count) is collected once as a scalar — the
    * one bounded driver value, same contract as q5a's centroid
    * literals. Self-loops are kept: a node may hash to itself and the
    * update handles it like any other edge.
    */
  /** @param releaseCaches eagerly materialize the (20-row) result and
    *   release the edge cache — the default for real runs; pass false
    *   to audit the un-truncated lazy plan (PlanShapeSpec). */
  def pagerank(s: SparkSession, dir: String,
      releaseCaches: Boolean = true): DataFrame = {
    import s.implicits._
    val nodes = table(s, dir, "documents").select($"doc_id".as("id"))
    val n = nodes.count() // bounded scalar: ONE long on the driver
    val edges = nodes
      .select($"id".as("src"),
        explode(array((1 to OutDegree).map(lit): _*)).as("j"))
      .select($"src",
        (conv(substring(md5(concat($"src".cast("string"), lit(">"),
          $"j".cast("string"))), 1, 8), 16, 10).cast("long") % lit(n))
          .as("dst"))
      // referenced by all three iterations in one plan — persist so
      // execution scans the derived edges once per iteration instead
      // of re-deriving md5s; released below after the (20-row) result
      // materializes (the minhashPairs cache-hygiene rule)
      .persist()
    var ranks = nodes.select($"id", lit(1000000L).as("r"))
    for (_ <- 1 to Iterations) {
      // join conditions by COLUMN NAME (src/id, id/dst are disjoint
      // name sets) — edges, ranks and nodes all share the documents
      // scan in their lineage, so df("col") disambiguation would hit
      // self-join attribute ambiguity on later iterations
      val contrib = edges
        .join(ranks, $"src" === $"id")
        .groupBy($"dst")
        .agg(sum(expr(s"r div $OutDegree")).as("s"))
      ranks = nodes
        .join(contrib, $"id" === $"dst", "left")
        .select($"id",
          (lit(150000L) +
            expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
    }
    val lazyOut = ranks
      .orderBy($"r".desc, $"id")
      .limit(20)
      .select($"id".as("doc_id"), $"r".as("rank_micro"))
    if (!releaseCaches) lazyOut
    else {
      // eagerly materialize the bounded result so the edge cache can
      // be released NOW instead of living for the rest of the session
      val out = lazyOut.localCheckpoint(true)
      edges.unpersist()
      out
    }
  }

  private def pagerankOracle: String = {
    val iter = (1 to Iterations).map { i =>
      s"""s$i AS (SELECT dst, CAST(sum(r // $OutDegree) AS BIGINT) AS s
         |  FROM edges JOIN r${i - 1} ON r${i - 1}.id = edges.src
         |  GROUP BY dst),
         |r$i AS (SELECT nodes.id,
         |    150000 + (85 * COALESCE(s, 0)) // 100 AS r
         |  FROM nodes LEFT JOIN s$i ON s$i.dst = nodes.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |edges AS (
       |  SELECT id AS src,
       |    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || '>' ||
       |        CAST(j AS VARCHAR)), 1, 8) AS BIGINT)
       |      % (SELECT n FROM nn) AS dst
       |  FROM nodes, (SELECT unnest([${(1 to OutDegree).mkString(",")}]) AS j)),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$iter
       |SELECT id AS doc_id, CAST(r AS BIGINT) AS rank_micro
       |FROM r$Iterations
       |ORDER BY rank_micro DESC, doc_id LIMIT 20""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q9j: PAGERANK — the iterative graph workload (join on src →
    // shuffle-agg on dst → rank update) every crawl-curation pipeline
    // runs. All-integer micro-rank arithmetic ⇒ zero float residual;
    // the oracle unrolls the identical three iterations as CTE chains.
    // Scale: per-iteration cost is one partial-agg'd shuffle of the
    // edge contributions + one rank join; driver state is ONE scalar
    // (the node count). Constant out-degree ⇒ no dangling-mass term.
    // ------------------------------------------------------------------
    QueryDef(
      "q9j_pagerank",
      (s, dir) => pagerank(s, dir),
      Some(pagerankOracle),
      doc = "Integer PageRank over the md5-derived link graph: 3 unrolled " +
        "iterations, per-round shuffle-agg on dst + rank join on src, " +
        "oracle replays every round bit-for-bit")
  )
}
