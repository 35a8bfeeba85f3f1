package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, via the
  * alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * standard way to turn near-duplicate *pairs* into duplicate *clusters*
  * at corpus scale.
  *
  * Why not label propagation: plain min-label flooding needs O(diameter)
  * rounds — a 1M-node chain (pathological but real in fuzzy-dedup graphs
  * chained through transitive near-dups) needs 1M rounds. The
  * alternating algorithm contracts the graph toward a star forest in
  * O(log² n) rounds (O(log n) in practice), each round being two
  * self-join-free aggregations over the current edge set.
  *
  * Per-round shuffle discipline:
  *  - large-star groups the bidirected edge list once on the node id
  *    (one shuffle with map-side partial min) and emits one edge per
  *    (node, larger-neighbor) — the edge set never more than doubles;
  *  - small-star groups the (larger→smaller) directed edges once;
  *  - every round ends in `localCheckpoint` so lineage stays O(1) deep
  *    instead of O(rounds) — without it the analyzer re-walks a plan
  *    tree that doubles per round. Checkpoint RDDs from superseded
  *    rounds are dropped by Spark's ContextCleaner once unreferenced.
  *
  * Convergence is detected with an order-insensitive edge-set signature
  * (count + bit-XOR of per-edge hashes) — two scalar aggregates, no
  * driver-side edge collection.
  */
object ConnectedComponents {

  /** Component label for every node that appears in `edges`.
    *
    * @param edges two long-typed columns `src`,`dst`; direction and
    *              duplicates irrelevant; self-loops ignored
    * @return (`id`, `component`) where `component` is the minimum node
    *         id of the node's connected component
    */
  def run(edges: DataFrame, maxIter: Int = 30): DataFrame =
    runWithStats(edges, maxIter)._1

  /** As [[run]], also returning the number of alternation rounds taken —
    * exposed so tests can pin the O(log n) behavior, not just the labels. */
  private[graft] def runWithStats(edges: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    var e = normalize(edges).localCheckpoint(true)
    var sig = signature(e)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSig = signature(next)
      // signature equality is a fast probabilistic screen; confirm with
      // an exact set compare so a (count, XOR-hash) collision between
      // two different edge sets can never terminate early with wrong
      // labels. The confirm only ever runs at the candidate fixpoint
      // (edge sets are tiny, both sides checkpointed), so it costs one
      // extra comparison total, not one per round.
      converged = nextSig == sig &&
        next.exceptAll(e).unionAll(e.exceptAll(next)).isEmpty
      e = next
      sig = nextSig
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "raise maxIter (bound is O(log^2 n) rounds)")
    // at the fixpoint the edge set is exactly the star forest
    // {(u, min-of-component) | u not the min}; roots label themselves
    val labels = e.select(col("src").as("id"), col("dst").as("component"))
    val roots = e.select(col("dst").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
    (labels.unionAll(roots).distinct(), rounds)
  }

  /** Undirected canonical form: (src > dst), no self-loops, distinct. */
  private def normalize(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()

  /** Large-star: every node connects its strictly-larger neighbors to
    * the minimum of its closed neighborhood. Output keeps src > dst. */
  private def largeStar(e: DataFrame): DataFrame = {
    val bidir = e.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = bidir.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    bidir.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: every node connects its smaller neighbors (and itself)
    * to the minimum of its closed neighborhood, over the (larger →
    * smaller) directed edges. Input/output keep src > dst. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val reparented = e.join(mins, "src")
      .select(col("dst").as("a"), col("m").as("b"))
    val self = mins.select(col("src").as("a"), col("m").as("b"))
    reparented.unionAll(self)
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()
  }

  /** Order-insensitive set signature: (|E|, XOR of per-edge hashes). */
  private def signature(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("x"))
      .head()
    (row.getLong(0), row.getLong(1))
  }
}
