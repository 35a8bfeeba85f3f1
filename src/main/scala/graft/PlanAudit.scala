package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes `PLANS.md`: the formatted physical plan of each headline
  * query, so SCALING.md's claims (pushdown, broadcast, partial agg,
  * codegen spans, no stray Exchanges) are auditable from a committed
  * artifact instead of trust. Re-run after plan-shaping changes:
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01 PLANS.md"
  */
object PlanAudit {

  /** One representative per plan family — the queries whose shape the
    * scale story depends on. */
  val Headline: Seq[String] = Seq(
    "q9j_pagerank",           // iterative join+shuffle-agg graph rounds
    "q9i_hybrid_rrf",         // two bounded retrieval arms + constant fusion
    "q6c_stream_dedup",       // id-keyed dedup over the doubled delivery
    "q9m_bloom_ingest",       // 16 KB broadcast bitmap ahead of the anti-join
    "q9n_ivf_incremental",    // delta-only assign + additive cell merge
    "q8e_image_phash",        // signature-only retrieval over real decode
    "q5e_filtered_ann",       // label predicate rides the broadcast join
    "q6d_running_totals",     // transformWithState typed-state fold
    "q9p_feature_moments",    // dims-sized partial agg + additive merge
    "q9q_negative_sampling",  // anti-join exclusion + salted hash draw
    "q01_pricing_summary",    // partial+final agg, filter/column pushdown
    "q03_shipping_priority",  // fact⋈fact shuffle join + top-n
    "q06_star_broadcast",     // broadcast dims
    "q07_window_topk",        // bounded map-side top-k aggregator
    "q1d_grouping_sets",      // single multi-grouping expand pass
    "q36_stratified_sample",  // narrow hash filter + tiny agg
    "q38_hash_sample_k",      // TakeOrderedAndProject
    "q77_partitioned_scan",   // PartitionFilters directory pruning
    "q39_decontaminate",      // broadcast left-semi n-gram join
    "q40_dedup_exact",        // digest shuffle with map-side combine
    "q42_minhash_lsh",        // codegen sketch + bucket self-join
    "q50_knn_exact",          // broadcast queries + salted two-phase top-k
    "q60_tumbling_window",    // single-shuffle windowed agg
    "q63_asof_join",          // tagged union + carry-forward window
    "q64_asof_stateful",      // flatMapGroupsWithState
    "q20_onekg_patient",      // narrow FHIR transform, codegen uuid5
    "q90_sequence_packing",   // per-shard running-sum window (no global sort)
    "q54_kmeans_iter",        // broadcast assign + k×dim partial-agg recompute
    "q93_approx_sketch",      // mergeable HLL/quantile sketch states
    "q65_scd2_intervals",     // lead() interval build, one keyed shuffle
    "q3f_boilerplate",        // DF shuffle + TakeOrdered + broadcast-back
    "q56_pq_adc",             // broadcast LUT, integer adds over codes
    "q57_ivfpq_search",       // nprobe cell routing + candidate-only ADC
    "q58_ivfpq_partitioned",  // probe as PartitionFilters on the cell layout
    "q59_semantic_dedup",     // windowless top-2-cell blocking, one shuffle
    "q7a_bucketed_join",      // co-located SMJ, zero exchanges below the join
    "q68_interval_join",      // equi+range-residual join, no cartesian
    "q69_stream_interval_join", // stream-stream joinable form, batch plan
    "q7b_bucketed_compaction",  // post-compaction SMJ, still exchange-free
    "q84_wav_pcm16",          // real codec decode as narrow codegen projection
    "q5a_kmeans_converge",    // one Lloyd assignment: map-side literal argmin
    "q4c_verbatim_spans",     // content-anchor windows + capped exact-key join
    "q98_bm25_topk",          // map-side term filter, broadcast df, TakeOrdered
    "q6b_scd2_cdc",           // stateful CDC fold + one compaction shuffle
    "q99_bm25_indexed",       // stored postings: bucket-pruned serve, no corpus scan
    "q89_png_palette",        // palette decode: narrow codegen projection + agg
    "q9a_perceptron_train",   // one training round: margin filter + 6-scalar agg
    "q9b_bm25_incremental",   // serve over the incrementally appended layout
    "q9c_hll_incremental",    // stored registers ∪ delta sketch, no base rescan
    "q5d_int8_ann",           // map-side quantization + integer-dot top-k
    "q9d_perplexity_filter",  // vocab-bounded LM broadcast back over pairs
    "q9e_cms_incremental",    // stored grid + delta counters, additive merge
    "q9f_perceptron_apply",   // literal-weight inference: scan+project only
    "q9g_bpe_encode",         // fitted-vocab join-back, token counts additive
    "q8a_image_resize",       // decode+NN-resize fused in one narrow pass
    "q8b_video_thumbnails",   // array-native frame folds, no explode (r14)
    "q9h_lm_incremental",     // stored LM tables + delta counts, additive merge
    "q8d_png_adam7",          // seven-pass interlaced decode, one narrow pass
    "q8f_jpeg_gray8",         // baseline JPEG entropy+IDCT decode, narrow pass
    "q2c_gtex_group_scale",   // 43,559-member collect-to-array + semi-join
    "q9t_quantile_incremental", // stored buckets + delta, additive merge
    "q9u_tombstone_purge",    // masked serve + layout-preserving compaction
    "q9w_range_cardinality",  // per-day registers, range merge serve
    "q9x_batch_manifest",     // distributed enumeration, no global window
    "q9y_contamination_matrix", // digest-keyed source-pair join
    "q9v_schema_evolution",   // mergeSchema scan + era partition pruning
    "q8h_audio_wht_bands",    // integer WHT bands, narrow codegen pass
    "q8k_adpcm_audio",        // compressed-audio decode, narrow codegen pass
    "q8l_avi_rle8_video",     // RLE8 interframe video decode, one projection
    "qb8_kmv_overlap",        // bounded-state sketch agg, no corpus join
    "qb9_kmv_incremental",    // delta-only scan + algebraic sketch merge
    "q8i_scene_cuts",         // array-native frame pairing, no self-join
    "q7c_zorder_incremental", // victims-only z-merge, manifest refs
    "q9z_fuzzy_join",         // prefix-block equi-join + bounded levenshtein
    "q8j_jpeg_restart",       // restart-marker decode, one codegen pass
    "q85_bmp_rgb24",          // r14 no-explode rewrite: per-row reductions
    "q86_avi_dib",            // r14 no-explode rewrite: nested frame folds
    "qa3_id_validity",        // mint+validate loop, one 4-scalar agg
    "qa5_k_anonymity",        // QI-class partial agg + class-level scalar
    "qa6_randomized_response",// local-DP perturb, one narrow scan + agg
    "qa7_k_anonymity_incremental", // serve over stored per-batch partials
    "qb0_sorted_neighborhood",// bucketed SNM window + W-neighbor join
    "qb1_html_extract",       // map-only extraction, zero pre-sort shuffles
    "qb2_ann_recall_trained", // trained-cell routing + candidate rerank
    "qb3_embedding_hygiene",  // one multi-aggregate hygiene scan
    "qb4_cc_incremental",     // contracted-graph CC + composed labels
    "qb5_classifier_auc",     // per-score histogram AUC, no global sort
    "qb6_graph_ann",          // stored navigable graph, in-shard beam walk
    "qb7_graph_ann_incremental", // batch-attach maintained graph serve
    "qba_exact_substring",    // seeded diagonal islands, capped buckets
    "qbb_exact_substring_apply", // interval merge + gap-substring rewrite
    "qbc_exact_substring_incremental", // batch seeds vs stored seed index
    "q8m_mulaw_audio",        // companded-audio decode, narrow codegen pass
    "q8n_alaw_audio",         // A-law decode + cross-law gate, one pass
    "qc0_skew_topk_native",   // bounded topk_pairs agg, no window sort
    "qc1_skew_topk_salted",   // corpus-derived salt fan-out, 2-phase merge
    "qc2_bloom_join_reduction", // bloom probe below the join exchange
    "qc3_skew_join_salted",   // hot-key replication join, per-key fan-out
    "qc4_heavy_hitters",      // k-bounded MG sketch, partial+final agg
    "qc5_heavy_hitters_incremental", // stored base sketch + delta merge
    "qc6_feature_covariance", // paired posexplodes, d²/2 agg groups
    "qc7_pii_redact",         // narrow regex scrub chain, no shuffle
    "qc8_pii_inventory",      // extract+explode → bounded groupBy
    "qc9_langid_train",       // model-broadcast join, corpus unshuffled
    "qca_langid_apply",       // per-row literal-matrix inference (r20)
    "qcb_graph_ann_hnsw",     // 2-level HNSW: warm entries, 2-hop base
    "qcc_repetition_filter",  // per-doc array ops, zero shuffle
    "qcd_langid_stratified",  // govern on derived metadata, one pass
    "qce_encoding_hygiene",   // codegen repair expr, narrow scan only
    "qcf_lexicon_filter",     // per-doc lexicon shares, zero shuffle
    "qcg_unicode_normalize",  // codegen NFC expr, narrow scan only
    "qch_phrase_lexicon",     // Aho-Corasick walk, one narrow scan
    "qci_hygiene_pipeline",   // 4-stage hygiene fused in one projection
    "qcj_phrase_redact")      // redaction expr, one narrow scan

  /** A formatted physical plan whose ONLY node is the scan of an
    * already-materialized RDD — the shape a checkpoint-terminated
    * query presents, which audits as "no work" unless the
    * pre-checkpoint plans are captured alongside (below). */
  def isBareRddScan(formatted: String): Boolean =
    formatted.contains("Scan ExistingRDD") &&
      !formatted.linesIterator.exists(_.startsWith("(2)"))

  /** Build a query's DataFrame while recording the formatted plan of
    * every eager (local)checkpoint its construction executes — the
    * real work a checkpoint-terminated query would otherwise hide
    * from the audit (r14 blind spot: qb4's PLANS.md entry was a bare
    * `Scan ExistingRDD`). Returns (df, capturedPlans, oldest first).
    * The listener bus is async, so the capture waits until no new
    * plan has arrived for 300 ms. */
  def buildCapturing(spark: SparkSession,
      build: () => org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Seq[String]) = {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "localCheckpoint" || funcName == "checkpoint")
          captured.add(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = build()
      var last = -1
      var stable = 0
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime < deadline) {
        Thread.sleep(100)
        val n = captured.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      (df, captured.toArray(Array.empty[String]).toSeq)
    } finally spark.listenerManager.unregister(listener)
  }

  /** Plan overrides for queries whose REGISTERED form hides the
    * interesting plan for a documented reason (cache-hygiene
    * checkpoints released lazily, driver-side training loops). Shared
    * with PlanShapeSpec's audit gate. */
  def overrides: Map[String, (SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "q42_minhash_lsh" -> ((s, d) => graft.queries.Dedup.minhashPairs(
      s.read.parquet(s"$d/documents.parquet"), releaseCaches = false)),
    // q5a's registered form ends in a localCheckpoint (cache
    // hygiene), which truncates the visible plan — audit one Lloyd
    // assignment instead: the map-side literal-centroid argmin that
    // each iteration runs (no shuffle anywhere below the agg)
    "q5a_kmeans_converge" -> ((s, d) => {
      val c = graft.queries.Similarity.lloydCorpus(s, d)
      graft.queries.Similarity.lloydAssign(c,
        graft.queries.Similarity.seedGrid(c))
        .groupBy(org.apache.spark.sql.functions.col("cell"))
        .count()
    }),
    // q9a's registered form ends in a driver-local frame — audit
    // the per-round plan the loop actually repeats
    "q9a_perceptron_train" ->
      ((s, d) => graft.queries.TextOps.perceptronRoundAgg(s, d)),
    // q9e's registered form require()s contracts driver-side and
    // ends in a localCheckpoint — audit the maintained-state merge
    // itself: stored-grid scan + delta-only counters, full-outer
    // additive merge, no base-corpus rescan
    "q9e_cms_incremental" ->
      ((s, d) => graft.queries.Relational.cmsMergedCounters(s, d)))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.PlanAudit` over `$sfDir`. One\n")
    sb.append("representative per plan family; see SCALING.md for the\n")
    sb.append("claims these plans substantiate. A query whose final\n")
    sb.append("frame is an eager checkpoint audits the checkpointed\n")
    sb.append("COMPUTATION too (\"materialized during construction\") —\n")
    sb.append("a bare `Scan ExistingRDD` with no such subsection would\n")
    sb.append("mean the audit saw no work at all (gated by\n")
    sb.append("PlanShapeSpec).\n")
    var blind = 0
    Headline.foreach { name =>
      val (df, captured) = buildCapturing(spark,
        () => overrides.getOrElse(name, SparkEntry.queries(name))(spark, sfDir))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan```\n")
      if (isBareRddScan(plan)) {
        // the final frame is a checkpointed RDD: the real work ran at
        // construction time — show it (most-downstream plans last; cap
        // at the last 4, which for iterative builders are the rounds
        // that matter, and say what was elided)
        val real = captured.filterNot(isBareRddScan)
        if (real.isEmpty) {
          blind += 1
          sb.append("\n*AUDIT BLIND: checkpoint-terminated with no " +
            "captured pre-checkpoint plan.*\n")
        } else {
          if (real.size > 4)
            sb.append(s"\n*${real.size - 4} earlier construction plans " +
              "elided (iterative build).*\n")
          real.takeRight(4).foreach { p =>
            sb.append(s"\n### $name — materialized during construction\n\n")
            sb.append(s"```\n$p```\n")
          }
        }
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out (${Headline.size} plans, $blind blind)")
    spark.stop()
    if (blind > 0) sys.exit(1)
  }
}
