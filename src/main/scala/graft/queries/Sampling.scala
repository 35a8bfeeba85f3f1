package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting over `documents` — the dataset-
  * assembly ops of a training-data pipeline (quota sampling per
  * stratum, reproducible train/val/test splits, fixed-size uniform
  * samples). All are hash-derived from the row key, so they are
  * reproducible across runs, clusters and engines — no RNG state, no
  * `sample()` nondeterminism — and every one is a narrow map-side
  * filter (zero shuffle before the final bounded agg/top-k), which is
  * the only shape that survives 100 TB.
  *
  * The bucket hash is md5-based (not xxhash64) deliberately: md5 is the
  * one keyed hash DuckDB shares bit-for-bit with Spark, so the oracle
  * recomputes the sample membership itself rather than trusting the
  * engine's hash.
  */
object Sampling extends Registry {
  import Tables.table

  /** First 4 hex chars of md5(key) as a long in [0, 65536) — THE
    * engine-parity hash idiom (every user must keep it in sync with its
    * DuckDB oracle mirror `CAST('0x' || substr(md5(x), 1, 4) AS
    * BIGINT)`; one definition here so the Scala side can't diverge). */
  def md5Prefix16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Stable per-row bucket in [0, 100). */
  def bucket100(key: Column): Column = md5Prefix16(key) % 100

  /** q36's per-language keep quotas (bucket100 cutoffs) — ONE
    * definition, shared with qcd which re-keys the same sampling on
    * the DERIVED language; the default for an unquoted language is
    * [[LangQuotaDefault]] on both engine and oracle sides. */
  val LangQuota: Map[String, Int] =
    Map("en" -> 30, "es" -> 60, "fr" -> 60, "de" -> 60, "zh" -> 90)
  val LangQuotaDefault = 50

  /** The quota table as a SQL CASE over `col` — generated from
    * [[LangQuota]] so the oracles cannot drift from the engine map. */
  def langQuotaCaseSql(col: String): String =
    s"CASE $col " + LangQuota.toSeq.sorted.map {
      case (l, q) => s"WHEN '$l' THEN $q"
    }.mkString(" ") + s" ELSE $LangQuotaDefault END"

  /** qc0/qc1: per-key top-k size, and qc1's per-salt-bucket row budget
    * (S = max(4, ceil(n/budget)) — small here so the shipped sf dirs
    * exercise multiple S values; a production 100 TB run sets the
    * budget to ~10^6 so bucket width and S·k merge fan-in are both
    * ordinary task sizes). */
  val SkewTopK = 8
  val SkewSaltBudget = 256

  /** qc3: per-key replication budget for the salted join — a key whose
    * row count exceeds the budget gets fanned out over
    * ceil(count/budget) salt buckets. 100 makes the shipped corpora
    * exercise three regimes: sf0.001 only 'en' replicates (R=2),
    * sf0.01 'en' R=3 with the other langs at R=1 (selective
    * replication — rare keys pay nothing), sf0.1 every key replicates
    * at distinct fan-outs (en R=21, others R=8). At 100 TB the budget
    * rises to ~10^6 rows so the hot key's largest join task stays an
    * ordinary task size. */
  val SkewJoinBudget = 100

  /** Count ShuffleExchangeExec nodes BELOW the first sort-merge join of
    * `df`'s prepared physical plan (AQE root unwrapped) — the
    * zero-exchange proof shared by q7a (bucketed join) and q7b
    * (bucket-preserving compaction). Exchanges are inserted by
    * EnsureRequirements, so the executedPlan is the one to inspect;
    * throws if no sort-merge join is present (a broadcast join would
    * show zero exchanges for the wrong reason — see q7a's merge hint). */
  private def smjExchanges(name: String,
      df: org.apache.spark.sql.DataFrame): Int = {
    val prepared = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val smj = prepared.collectFirst {
      case jn: org.apache.spark.sql.execution.joins.SortMergeJoinExec => jn
    }.getOrElse(throw new IllegalStateException(
      s"$name: expected a sort-merge join over the bucketed tables"))
    smj.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
  }

  def defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q36: stratified quota sampling — per-language keep-rates (e.g.
    // downsample dominant English, keep all of the long tail), the
    // standard corpus-balancing op. Narrow filter; the only shuffle is
    // the final per-lang count.
    QueryDef(
      "q36_stratified_sample",
      (s, dir) => {
        import s.implicits._
        val quota = typedLit(LangQuota)
        table(s, dir, "documents")
          .withColumn("b", bucket100($"doc_id"))
          .filter($"b" < coalesce(quota($"lang"), lit(LangQuotaDefault)))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("id_checksum"))
          .orderBy($"lang")
      },
      Some(s"""SELECT lang, count(*) AS n_kept,
              |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
              |FROM (SELECT lang, doc_id,
              |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              |             AS BIGINT) % 100 AS b
              |      FROM documents) t
              |WHERE b < ${langQuotaCaseSql("lang")}
              |GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "Deterministic stratified quota sampling per language"),

    // ------------------------------------------------------------------
    // q37: reproducible train/val/test split (80/10/10 by key hash) —
    // membership is a pure function of the key, so re-runs, incremental
    // appends and other engines assign identically (no leakage drift).
    QueryDef(
      "q37_train_val_test",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .withColumn("b", bucket100($"doc_id"))
          .withColumn("split",
            when($"b" < 80, "train").when($"b" < 90, "val").otherwise("test"))
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("id_checksum"),
            sum(length($"text")).as("chars"))
          .orderBy($"split")
      },
      Some("""SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |         ELSE 'test' END AS split,
             |  count(*) AS n_docs,
             |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
             |  CAST(sum(len(text)) AS BIGINT) AS chars
             |FROM (SELECT doc_id, text,
             |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             |             AS BIGINT) % 100 AS b
             |      FROM documents) t
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Reproducible hash-keyed 80/10/10 train/val/test split"),

    // ------------------------------------------------------------------
    // q38: fixed-size uniform sample — the k rows with the smallest key
    // hashes (order-independent, reproducible; the distributed
    // stand-in for reservoir sampling). Physically TakeOrderedAndProject:
    // per-partition top-k states only, no full sort, no shuffle of N.
    QueryDef(
      "q38_hash_sample_k",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select($"doc_id", $"lang",
            md5($"doc_id".cast("string")).as("h"))
          .orderBy($"h", $"doc_id")
          .limit(20)
          .select($"doc_id", $"lang")
      },
      Some("""SELECT doc_id, lang
             |FROM (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
             |      FROM documents)
             |ORDER BY h, doc_id LIMIT 20""".stripMargin),
      doc = "Fixed-k uniform sample via smallest key hashes (top-k, no shuffle)"),

    // ------------------------------------------------------------------
    // q77: partitioned-layout round-trip — write the corpus
    // hive-partitioned by lang, read it back with a partition-pruned
    // scan (the plan shows PartitionFilters, and only the en/zh
    // directories are listed). This is the storage layout a 100 TB
    // corpus actually uses: partition columns turn selective scans into
    // directory pruning before any IO happens.
    QueryDef(
      "q77_partitioned_scan",
      (s, dir) => {
        val out = Tables.scratchDir("q77_part")
        table(s, dir, "documents").write.mode("overwrite")
          .partitionBy("lang").parquet(out)
        s.read.parquet(out)
          .filter(col("lang").isin("en", "zh"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_checksum"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
             |FROM documents WHERE lang IN ('en', 'zh')
             |GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "Hive-partitioned write + partition-pruned read-back"),

    // ------------------------------------------------------------------
    // q78: small-file compaction — the maintenance job every
    // streaming-ingested corpus needs: many tiny part files (here a
    // deliberate 32-way scatter) re-written as ceil(bytes/target)
    // right-sized files. Row count and content checksum must survive
    // the rewrite; the file-count claims are returned as booleans so the
    // check is scale-factor-independent.
    QueryDef(
      "q78_compaction",
      (s, dir) => {
        import s.implicits._
        def parquetFiles(d: String): Seq[java.io.File] =
          Option(new java.io.File(d).listFiles()).toSeq.flatten
            .filter(_.getName.endsWith(".parquet"))
        val scattered = Tables.scratchDir("q78_scatter")
        val compacted = Tables.scratchDir("q78_compact")
        val docs = table(s, dir, "documents")
        docs.repartition(32).write.mode("overwrite").parquet(scattered)
        val before = parquetFiles(scattered)
        val targetBytes = 8L << 20
        // clamp to strictly fewer files than the scatter: when the
        // corpus is big enough that right-sizing alone wouldn't reduce
        // the count, compaction still must (files_reduced is part of the
        // sf-independent contract; at that scale the target is advisory)
        val nOut = math.min(math.max(1, math.ceil(
          before.map(_.length).sum.toDouble / targetBytes).toInt),
          math.max(1, before.size - 1))
        s.read.parquet(scattered).coalesce(nOut)
          .write.mode("overwrite").parquet(compacted)
        val after = parquetFiles(compacted)
        val (rows, chk) = {
          val r = s.read.parquet(compacted)
            .agg(count(lit(1)), sum($"doc_id")).collect().head
          (r.getLong(0), r.getLong(1))
        }
        val origRows = docs.count()
        Seq((before.size > after.size, rows == origRows, chk))
          .toDF("files_reduced", "rows_preserved", "id_checksum")
      },
      Some("""SELECT true AS files_reduced, true AS rows_preserved,
             |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
             |FROM documents""".stripMargin),
      doc = "Small-file compaction: 32-way scatter re-written to right-sized files"),

    // ------------------------------------------------------------------
    // q90: training-sequence packing (concat-and-chunk) — documents are
    // concatenated in deterministic order and cut into fixed
    // token-budget sequences; each doc belongs to the sequence its start
    // offset lands in. Packing is PER HASH-SHARD, the way a real
    // pipeline packs per writer task: the running-sum window partitions
    // by shard, so there is no global single-partition window and the
    // shard count scales with the cluster, not the data. One shuffle on
    // shard; everything else is narrow.
    QueryDef(
      "q90_sequence_packing",
      (s, dir) => {
        import s.implicits._
        val budget = 2048
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"shard").orderBy($"doc_id")
          .rowsBetween(Long.MinValue, 0)
        table(s, dir, "documents")
          .select($"doc_id",
            (md5Prefix16($"doc_id") % 8).as("shard"),
            size(split($"text", " ")).cast("long").as("n_tok"))
          .withColumn("running", sum($"n_tok").over(w))
          .withColumn("seq_id",
            floor(($"running" - $"n_tok") / lit(budget.toDouble)).cast("long"))
          .groupBy($"shard")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"seq_id").as("n_seqs"),
            sum($"n_tok").as("total_tokens"),
            round(sum($"n_tok") /
              (countDistinct($"seq_id") * lit(budget.toDouble)), 4)
              .as("fill_ratio"))
          .orderBy($"shard")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             |         AS BIGINT) % 8 AS shard,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |r AS (
             |  SELECT shard, n_tok,
             |    sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS running
             |  FROM t)
             |SELECT shard, count(*) AS n_docs,
             |  count(DISTINCT CAST(floor((running - n_tok) / 2048.0) AS BIGINT))
             |    AS n_seqs,
             |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |  round(sum(n_tok) /
             |    (count(DISTINCT CAST(floor((running - n_tok) / 2048.0) AS BIGINT))
             |     * 2048.0), 4) AS fill_ratio
             |FROM r GROUP BY shard ORDER BY shard""".stripMargin),
      doc = "Per-shard concat-and-chunk sequence packing (2048-token budget)"),

    // ------------------------------------------------------------------
    // q91: dataset mixing — per-source mixture weights applied as
    // deterministic replication: integer part = whole epochs (every doc
    // repeated), fractional part = md5-bucket acceptance (w=0.5 keeps
    // half the docs, chosen by key hash, not RNG). This is the standard
    // corpus-reweighting op before training; the explode is narrow and
    // the only shuffle is the final per-source aggregate, so the shape
    // is identical at 100 TB (upsampled copies carry an epoch index a
    // downstream shuffler can salt on).
    QueryDef(
      "q91_dataset_mixing",
      (s, dir) => {
        import s.implicits._
        // weight by source index: 2.0 / 1.0 / 0.5 / 0.25 tiers
        val idx = substring($"source", 4, 10).cast("int")
        val base = when(idx < 5, 2).when(idx < 10, 1).otherwise(0)
        val fracPct = when(idx < 10, 0).when(idx < 15, 50).otherwise(25)
        table(s, dir, "documents")
          .select($"doc_id", $"source", $"n_chars",
            (base + when(bucket100($"doc_id") < fracPct, 1).otherwise(0))
              .as("copies"))
          .filter($"copies" > 0)
          .select($"doc_id", $"source", $"n_chars",
            explode(sequence(lit(1), $"copies")).as("epoch"))
          .groupBy($"source")
          .agg(countDistinct($"doc_id").as("n_docs_in"),
            count(lit(1)).as("n_copies_out"),
            sum($"doc_id").as("id_checksum"),
            sum($"n_chars").as("chars_out"),
            max($"epoch").as("max_epoch"))
          .orderBy($"source")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(substr(source, 4) AS INT) AS idx,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             |         AS BIGINT) % 100 AS b
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source, n_chars,
             |    (CASE WHEN idx < 5 THEN 2 WHEN idx < 10 THEN 1 ELSE 0 END)
             |    + (CASE WHEN b < (CASE WHEN idx < 10 THEN 0
             |                           WHEN idx < 15 THEN 50 ELSE 25 END)
             |       THEN 1 ELSE 0 END) AS copies
             |  FROM t),
             |e AS (
             |  SELECT doc_id, source, n_chars,
             |    unnest(range(1, copies + 1)) AS epoch
             |  FROM c WHERE copies > 0)
             |SELECT source, count(DISTINCT doc_id) AS n_docs_in,
             |  count(*) AS n_copies_out,
             |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
             |  CAST(sum(n_chars) AS BIGINT) AS chars_out,
             |  CAST(max(epoch) AS INT) AS max_epoch
             |FROM e GROUP BY source ORDER BY source""".stripMargin),
      doc = "Deterministic weighted dataset mixing (epoch replication + hash-fraction)"),

    // ------------------------------------------------------------------
    // q79: Z-order clustering layout — interleave the low 16 bits of two
    // scan-predicate columns into one locality key, range-partition and
    // sort the write by it, and prove the layout: files must carry
    // DISJOINT z-ranges (that disjointness is exactly what lets a
    // two-dimensional predicate skip whole files on min/max stats, the
    // multi-dim analogue of q77's partition pruning). The z-value is a
    // pure bit expression (codegen, both engines agree bit-for-bit); the
    // oracle recomputes count and z-checksum and pins the layout claims.
    QueryDef(
      "q79_zorder_layout",
      (s, dir) => {
        import s.implicits._
        val out = Tables.scratchDir("q79_zorder")
        val z = expr(zInterleaveExpr("l_partkey", "l_suppkey")).as("z")
        table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey", $"l_suppkey", z)
          .repartitionByRange(8, $"z")
          .sortWithinPartitions($"z")
          .write.mode("overwrite").parquet(out)
        val back = s.read.parquet(out)
        // per-file z ranges AND the row/checksum totals in ONE pass
        // over the written layout (r21, guide §1.2/§6: the two
        // separate validation reads re-scanned the output twice;
        // count/sum are additive over the per-file partials, so the
        // totals fold driver-side from the same bounded per-file rows)
        val ranges = back
          .select(input_file_name().as("f"), $"z")
          .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"),
            count(lit(1)).as("n"), sum($"z").as("zs"))
          .orderBy($"lo")
          .collect()
        // strict <: a shared boundary z-value would mean BOTH files hold
        // that key, so neither could be skipped by a z=v predicate
        val disjoint = ranges.sliding(2).forall {
          case Array(a, b) => a.getAs[Long]("hi") < b.getAs[Long]("lo")
          case _ => true
        }
        val nRows = ranges.iterator.map(_.getAs[Long]("n")).sum
        val zSum = ranges.iterator.map(_.getAs[Long]("zs")).sum
        Seq((nRows, zSum, ranges.length > 1, disjoint))
          .toDF("n_rows", "z_checksum", "multi_file", "ranges_disjoint")
      },
      Some(s"""SELECT count(*) AS n_rows,
           |  CAST(sum(${zInterleaveExpr("l_partkey", "l_suppkey")})
           |    AS BIGINT) AS z_checksum,
           |  true AS multi_file, true AS ranges_disjoint
           |FROM lineitem""".stripMargin),
      doc = "Z-order layout: bit-interleaved locality key, range write, disjoint file ranges"),

    // ------------------------------------------------------------------
    // q7a: bucketed co-located join — the OTHER half of the shuffle-
    // elimination story (q77 prunes scans; this removes the join
    // exchange entirely). Both fact tables are written bucketed on the
    // join key into the session catalog; the sort-merge join then reads
    // bucket i against bucket i with ZERO exchanges below the join —
    // the layout a 100 TB warehouse maintains so its biggest recurring
    // join never shuffles. Proven from the plan, not asserted: the
    // whole aggregate-over-join plan must contain exactly ONE shuffle
    // (the final groupBy), and that count rides the result row for the
    // oracle to pin. The merge hint keeps the demonstration honest at
    // small sf (a broadcast join would also show zero join exchanges,
    // but for the wrong reason — broadcast stops working when both
    // sides are huge; bucketing is precisely for that case).
    QueryDef(
      "q7a_bucketed_join",
      (s, dir) => {
        import s.implicits._
        val nBuckets = 8
        def stage(name: String, src: String, key: String,
            cols: Seq[String]): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $name")
          // repartition BY the bucket key first: without it every write
          // task emits its own file per bucket (tasks × buckets small
          // files), and multi-file buckets force the reader to re-sort;
          // aligned, each bucket is one sorted file
          table(s, dir, src).select(cols.map(col): _*)
            .repartition(nBuckets, col(key))
            .write.mode("overwrite")
            .option("path", Tables.scratchDir(s"q7a_$name"))
            .bucketBy(nBuckets, key).sortBy(key)
            .saveAsTable(name)
        }
        stage("g_orders_b", "orders", "o_orderkey",
          Seq("o_orderkey", "o_orderpriority"))
        stage("g_lineitem_b", "lineitem", "l_orderkey",
          Seq("l_orderkey", "l_extendedprice"))
        val j = s.table("g_lineitem_b")
          .join(s.table("g_orders_b").hint("merge"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_extendedprice"), 2).as("revenue"))
          .orderBy($"o_orderpriority")
        // bucketing means the sort-merge join reads both sides
        // pre-partitioned — zero exchanges below it (the final
        // groupBy/orderBy above the join still shuffle, as they must)
        val joinExchanges = smjExchanges("q7a", j)
        j.withColumn("join_exchanges", lit(joinExchanges))
          .withColumn("join_shuffle_free", lit(joinExchanges == 0))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
             |  round(sum(l_extendedprice), 2) AS revenue,
             |  0 AS join_exchanges, true AS join_shuffle_free
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "Bucketed co-located fact-fact join: zero exchanges below the sort-merge join, proven from the plan"),

    // ------------------------------------------------------------------
    // q7b: bucket-layout MAINTENANCE — q78's compaction composed with
    // q7a's bucketing: a deliberately fragmented bucketed table (8
    // round-robin writer tasks each emitting a file per bucket — the
    // shape streaming ingest leaves behind: up to tasks×buckets small
    // files) is compacted by a PER-BUCKET rewrite that KEEPS the bucket
    // metadata: read the bucketed table, co-locate each bucket's rows
    // with repartition(n, key), rewrite with the same bucketBy/sortBy
    // into the catalog. The payoff is proven, not asserted: after
    // compaction each bucket is ONE sorted file (file count == bucket
    // count, counted on disk) AND the fact-fact join still plans with
    // ZERO exchanges below the sort-merge join — compaction that lost
    // the bucket spec would reintroduce both shuffles. A naive
    // compaction (q78's, plain repartition+write) right-sizes files but
    // silently degrades every future join; this is the maintenance job
    // a 100 TB warehouse actually needs.
    QueryDef(
      "q7b_bucketed_compaction",
      (s, dir) => {
        import s.implicits._
        val nBuckets = 8
        def parquetFiles(d: String): Int =
          Option(new java.io.File(d).listFiles()).toSeq.flatten
            .count(_.getName.endsWith(".parquet")) // local-FS demo, like q78
        def bucketedWrite(df: org.apache.spark.sql.DataFrame, name: String,
            path: String, key: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $name")
          df.write.mode("overwrite").option("path", path)
            .bucketBy(nBuckets, key).sortBy(key).saveAsTable(name)
        }
        val ordersPath = Tables.scratchDir("q7b_orders")
        bucketedWrite(table(s, dir, "orders")
          .select($"o_orderkey", $"o_orderpriority")
          .repartition(nBuckets, $"o_orderkey"),
          "g_orders_c", ordersPath, "o_orderkey")
        // the fragmented side: round-robin repartition (NOT by the
        // bucket key) fans every bucket's rows across all writer tasks
        val fragPath = Tables.scratchDir("q7b_frag")
        bucketedWrite(table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice").repartition(8),
          "g_lineitem_frag", fragPath, "l_orderkey")
        val filesBefore = parquetFiles(fragPath)
        // the maintenance pass under test. Input is the PATH scan, not
        // the catalog table: a bucketed-table read advertises the very
        // hash partitioning the rewrite asks for, so the explicit
        // repartition is elided as redundant and writer tasks come from
        // the (fragmented, maxPartitionBytes-sized) scan — each emitting
        // a file per bucket again. The path scan (what a compaction job
        // reads anyway: files) keeps the repartition, aligning task i
        // with bucket i so each bucket lands as ONE sorted file.
        val compactPath = Tables.scratchDir("q7b_compact")
        bucketedWrite(s.read.parquet(fragPath)
          .repartition(nBuckets, $"l_orderkey"),
          "g_lineitem_compact", compactPath, "l_orderkey")
        val filesAfter = parquetFiles(compactPath)
        val j = s.table("g_lineitem_compact")
          .join(s.table("g_orders_c").hint("merge"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_extendedprice"), 2).as("revenue"))
          .orderBy($"o_orderpriority")
        val joinExchanges = smjExchanges("q7b", j)
        j.withColumn("join_exchanges", lit(joinExchanges))
          .withColumn("compaction_reduced_files", lit(filesAfter < filesBefore))
          .withColumn("one_file_per_bucket", lit(filesAfter == nBuckets))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
             |  round(sum(l_extendedprice), 2) AS revenue,
             |  0 AS join_exchanges, true AS compaction_reduced_files,
             |  true AS one_file_per_bucket
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "Bucket-preserving compaction: one sorted file per bucket after rewrite, join still exchange-free"),

    // ------------------------------------------------------------------
    // q96: curriculum binning — rank every document by the composite
    // quality score (q32's formula) and cut per-language quartile tiers,
    // reporting each tier's doc count and token budget: the input a
    // curriculum/annealing schedule consumes ("highest tier last").
    // Scale shape = q95's two-pass quantile pattern: a |langs|×3-row
    // exact-percentile aggregate broadcast back over a narrow second
    // scan — NO global ntile sort (a global ntile is a single-partition
    // sort at 100 TB). Tier averages ride 6-decimal micro-longs so both
    // engines sum exactly.
    QueryDef(
      "q96_curriculum",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select($"doc_id", $"lang",
            size(split($"text", " ")).as("n_words"),
            TextOps.quality($"text").as("q"))
        val cuts = docs.groupBy($"lang").agg(
          round(expr("percentile(q, 0.25D)"), 4).as("t25"),
          round(expr("percentile(q, 0.5D)"), 4).as("t50"),
          round(expr("percentile(q, 0.75D)"), 4).as("t75"))
        docs.join(broadcast(cuts), Seq("lang"))
          .withColumn("tier", lit(1) +
            when($"q" > $"t25", 1).otherwise(0) +
            when($"q" > $"t50", 1).otherwise(0) +
            when($"q" > $"t75", 1).otherwise(0))
          .groupBy($"lang", $"tier")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_words".cast("long")).as("tot_tokens"),
            round(sum(round($"q" * 1000000).cast("long")) /
              (count(lit(1)) * 1000000.0), 6).as("avg_quality"))
          .orderBy($"lang", $"tier")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
             |    round(least(len(string_split(text, ' '))::DOUBLE / 100.0, 1.0)
             |      * (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
             |               / length(text))
             |      * (1.0 - len(list_filter(string_split(text, ' '),
             |            x -> x IN ('the','a','an','of','and','to','in','is','on','for')))::DOUBLE
             |               / len(string_split(text, ' '))), 6) AS q
             |  FROM documents),
             |c AS (SELECT lang, round(quantile_cont(q, 0.25), 4) AS t25,
             |        round(quantile_cont(q, 0.5), 4) AS t50,
             |        round(quantile_cont(q, 0.75), 4) AS t75
             |      FROM d GROUP BY lang)
             |SELECT lang,
             |  1 + CASE WHEN q > t25 THEN 1 ELSE 0 END
             |    + CASE WHEN q > t50 THEN 1 ELSE 0 END
             |    + CASE WHEN q > t75 THEN 1 ELSE 0 END AS tier,
             |  count(*) AS n_docs,
             |  CAST(sum(n_words) AS BIGINT) AS tot_tokens,
             |  round(CAST(sum(CAST(round(q * 1000000) AS BIGINT)) AS BIGINT)
             |        / (count(*) * 1000000.0), 6) AS avg_quality
             |FROM d JOIN c USING (lang)
             |GROUP BY lang, tier ORDER BY lang, tier""".stripMargin),
      doc = "Curriculum quartile tiers per language (two-pass quantiles, no global sort)"),

    // ------------------------------------------------------------------
    // q9l: WEIGHTED sampling without replacement — Efraimidis-Spirakis
    // A-ES over deterministic md5-derived uniforms: per doc, key =
    // ln(u)/w with w = n_chars, take the k LARGEST keys. The classic
    // one-pass distributed reservoir: physically TakeOrderedAndProject
    // (per-partition top-k states, no full sort, no shuffle of N) —
    // q38's plan shape upgraded from uniform to weight-proportional
    // inclusion, which is how corpus mixing actually samples (longer /
    // higher-weight docs proportionally likelier). u is the md5
    // first-8-hex +1 over 2^32 (u ∈ (0,1], so ln is finite); the key is
    // rounded to integer NANO units before ranking with a doc_id
    // tiebreak — the q98 micro-rounding pattern, so both engines rank
    // identically up to ln()'s sub-ulp at the rounding boundary (the
    // accepted q54/q98 residual). Zero-weight docs are excluded
    // identically on both sides (none exist in the testdata; the guard
    // keeps 100 TB corpora with empty docs well-defined).
    // ------------------------------------------------------------------
    QueryDef(
      "q9l_weighted_sample",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .filter($"n_chars" > 0)
          .select($"doc_id", $"lang", $"n_chars",
            conv(substring(md5(concat($"doc_id".cast("string"),
              lit("|wrs"))), 1, 8), 16, 10).cast("long").as("h"))
          .select($"doc_id", $"lang", $"n_chars",
            expr("CAST(round(ln((h + 1) / 4294967296.0) / n_chars * 1e9)" +
              " AS BIGINT)").as("key_nano"))
          .orderBy($"key_nano".desc, $"doc_id")
          .limit(20)
      },
      Some("""SELECT doc_id, lang, n_chars,
             |  CAST(round(ln((CAST('0x' ||
             |      substr(md5(CAST(doc_id AS VARCHAR) || '|wrs'), 1, 8)
             |      AS BIGINT) + 1) / 4294967296.0) / n_chars * 1e9)
             |    AS BIGINT) AS key_nano
             |FROM documents WHERE n_chars > 0
             |ORDER BY key_nano DESC, doc_id LIMIT 20""".stripMargin),
      doc = "Weighted sampling without replacement (A-ES keys over " +
        "md5-derived uniforms): weight-proportional top-k, " +
        "TakeOrderedAndProject — no shuffle of the corpus")
  ) ++ Seq(

    // ------------------------------------------------------------------
    // q9o: TEMPERATURE-SCALED language mixing — the multilingual
    // balancing act (mT5/UniMax shape): sampling share per language ∝
    // share^(1/T) with T=2, which upsamples the tail and downsamples
    // the head relative to natural frequency. The per-language rate is
    // computed in EXACT integers after one sqrt: w_l = round(√(n_l/N)
    // ·1e6) (sqrt and the n_l/N division are single IEEE ops —
    // bit-identical cross-engine), then rate_micro_l = (w_l · budget ·
    // 1e6) div (W · n_l) capped at 1e6 — integer division throughout,
    // so no float sum order exists anywhere (the Σw normalization sums
    // INTEGERS). Acceptance is the md5-fraction test per doc.
    // Scale: two tiny aggregates (per-lang counts; their integer
    // normalization) broadcast back over one narrow acceptance scan —
    // the q36 quota plan with a principled rate formula.
    // ------------------------------------------------------------------
    QueryDef(
      "q9o_temperature_mix",
      (s, dir) => {
        import s.implicits._
        val budget = 200L
        val docs = table(s, dir, "documents").select($"doc_id", $"lang")
        val tot = docs.count() // bounded scalar (one long)
        val byLang = docs.groupBy($"lang").agg(count(lit(1)).as("n_l"))
          .withColumn("w_micro",
            expr(s"CAST(round(sqrt(n_l / CAST($tot AS DOUBLE)) * 1e6) " +
              "AS BIGINT)"))
        val wSum = byLang.agg(sum($"w_micro")).collect()(0).getLong(0)
        val rates = byLang.withColumn("rate_micro",
          least(lit(1000000L),
            expr(s"(w_micro * $budget * 1000000) div ($wSum * n_l)")))
        docs
          .join(broadcast(rates), Seq("lang"))
          .withColumn("u_micro",
            conv(substring(md5(concat($"doc_id".cast("string"),
              lit("|mix"))), 1, 8), 16, 10).cast("long") % 1000000L)
          .groupBy($"lang")
          .agg(max($"n_l").as("n_total"),
            max($"rate_micro").as("rate_micro"),
            sum(when($"u_micro" < $"rate_micro", 1L).otherwise(0L))
              .as("n_sampled"))
          .orderBy($"lang")
      },
      Some("""WITH t AS (SELECT count(*) AS n FROM documents),
             |bl AS (SELECT lang, count(*) AS n_l,
             |         CAST(round(sqrt(count(*) / (SELECT CAST(n AS DOUBLE)
             |             FROM t)) * 1e6) AS BIGINT) AS w_micro
             |       FROM documents GROUP BY lang),
             |ws AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w FROM bl),
             |r AS (SELECT lang, n_l,
             |        least(1000000,
             |          (w_micro * 200 * 1000000) //
             |          ((SELECT w FROM ws) * n_l)) AS rate_micro
             |      FROM bl)
             |SELECT d.lang, CAST(max(r.n_l) AS BIGINT) AS n_total,
             |  CAST(max(r.rate_micro) AS BIGINT) AS rate_micro,
             |  CAST(sum(CASE WHEN
             |      (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
             |         || '|mix'), 1, 8) AS BIGINT) % 1000000)
             |      < r.rate_micro THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_sampled
             |FROM documents d JOIN r ON d.lang = r.lang
             |GROUP BY d.lang ORDER BY d.lang""".stripMargin),
      doc = "Temperature-scaled (T=2) language mixing: integer micro " +
        "rates from one sqrt, md5-fraction acceptance, two tiny " +
        "aggregates broadcast over one narrow scan"),

    // ------------------------------------------------------------------
    // q9r: CORPUS SNAPSHOT DIFF — the dataset-versioning report every
    // reproducible training run needs: given yesterday's and today's
    // snapshot, classify every doc_id as added / removed / kept /
    // CHANGED (same id, different content digest — the class a naive
    // id-level diff misses and the one that silently poisons
    // reproducibility). Snapshots are derived deterministically
    // (v1 = id%7≠0, v2 = id%5≠0, with v2 rewriting id%11==0 docs to
    // simulate in-place edits); the diff itself is ONE full-outer join
    // on doc_id moving only (id, lang, 16-byte digest) — never text —
    // plus a per-language class count. At 100 TB both sides come from
    // stored digest manifests (q49's index), so the diff cost is
    // digest-join-sized regardless of corpus bytes.
    // ------------------------------------------------------------------
    QueryDef(
      "q9r_corpus_diff",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select($"doc_id", $"lang", $"text")
        val v1 = docs.filter($"doc_id" % 7 =!= 0)
          .select($"doc_id", $"lang".as("lang1"), md5($"text").as("h1"))
        val v2 = docs.filter($"doc_id" % 5 =!= 0)
          .select($"doc_id", $"lang".as("lang2"),
            md5(when($"doc_id" % 11 === 0, concat($"text", lit("!v2")))
              .otherwise($"text")).as("h2"))
        v1.join(v2, Seq("doc_id"), "full")
          .select(coalesce($"lang1", $"lang2").as("lang"),
            when($"h1".isNull, "added")
              .when($"h2".isNull, "removed")
              .when($"h1" === $"h2", "kept")
              .otherwise("changed").as("cls"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"cls" === "added", 1L).otherwise(0L)).as("n_added"),
            sum(when($"cls" === "removed", 1L).otherwise(0L))
              .as("n_removed"),
            sum(when($"cls" === "kept", 1L).otherwise(0L)).as("n_kept"),
            sum(when($"cls" === "changed", 1L).otherwise(0L))
              .as("n_changed"))
          .orderBy($"lang")
      },
      Some("""WITH v1 AS (SELECT doc_id, lang AS lang1, md5(text) AS h1
             |            FROM documents WHERE doc_id % 7 <> 0),
             |v2 AS (SELECT doc_id, lang AS lang2,
             |         md5(CASE WHEN doc_id % 11 = 0 THEN text || '!v2'
             |             ELSE text END) AS h2
             |       FROM documents WHERE doc_id % 5 <> 0),
             |j AS (SELECT COALESCE(lang1, lang2) AS lang,
             |        CASE WHEN h1 IS NULL THEN 'added'
             |             WHEN h2 IS NULL THEN 'removed'
             |             WHEN h1 = h2 THEN 'kept'
             |             ELSE 'changed' END AS cls
             |      FROM v1 FULL OUTER JOIN v2 USING (doc_id))
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN cls = 'added' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_added,
             |  CAST(sum(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_removed,
             |  CAST(sum(CASE WHEN cls = 'kept' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_changed
             |FROM j GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "Corpus snapshot diff: full-outer digest join classifying " +
        "added/removed/kept/changed per language — digests, not text, " +
        "cross the network"),

    // ------------------------------------------------------------------
    // q9v: SCHEMA EVOLUTION — the drift every long-lived lake
    // accumulates: files written before a column existed must stay
    // readable as ONE table after the schema evolves. The corpus is
    // written as two eras (era=v1: doc_id+n_chars only — "before we
    // tracked language"; era=v2 adds lang), then read back in a single
    // mergeSchema scan: partition discovery surfaces the era directory
    // key as a column, footer-level schema merge unions the row
    // schemas, and v1 rows materialize lang as NULL at the scan — no
    // rewrite, no per-era reader code. The require() pins the merged
    // schema (all four columns present), and the aggregate makes the
    // null-fill semantics the gated answer: legacy rows group under a
    // sentinel, per-group era span proves both eras actually
    // contributed. At 100 TB: schema merge reads FOOTERS (cost bounds
    // with file count, not bytes), missing columns are null-filled by
    // the reader for free, and the same mechanics serve a
    // catalog-pinned schema — this is how years of format drift stay
    // queryable without rewriting a single historical file.
    QueryDef(
      "q9v_schema_evolution",
      (s, dir) => schemaEvolution(s, dir),
      Some("""WITH v AS (
             |  SELECT doc_id, n_chars,
             |    CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
             |    CASE WHEN doc_id % 2 = 0 THEN 'v1' ELSE 'v2' END AS era
             |  FROM documents)
             |SELECT coalesce(lang, '_legacy_') AS lang_group,
             |  count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_legacy,
             |  count(DISTINCT era) AS n_eras
             |FROM v GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Schema evolution: two-era parquet layout read as one " +
        "mergeSchema scan — partition discovery + footer schema union " +
        "+ null-fill for pre-evolution rows, aggregated per language"),

    // ------------------------------------------------------------------
    // q9x: REPRODUCIBLE TRAINING-BATCH MANIFEST — the data-order ledger
    // an LLM training run needs: a seed-determined global shuffle of
    // the corpus, cut into fixed-size batches, such that ANY two runs
    // (and any two engines) enumerate byte-identical batches. The
    // shuffle key is md5(seed|doc_id) — no RNG state, reproducible
    // forever — and the interesting part is HOW a global rank is
    // computed at scale: NOT with a global-order window (a single-
    // partition sort, the classic scale-killer PlanShapeSpec bans) but
    // by the two-phase distributed enumeration a 1000-executor run
    // uses: range-partition by the shuffle key, rank WITHIN each range
    // partition (keyed window — parallel), then add per-partition
    // offsets (P scalars through the driver). The global rank is
    // partition-boundary-INDEPENDENT (the key order is total: md5 +
    // doc_id tiebreak), so the result equals the oracle's one-window
    // row_number replay while the plan stays fully parallel. The
    // repartitioned frame is localCheckpoint()ed so the offset pass
    // and the rank pass read the SAME materialized partitioning (the
    // production form writes the manifest to storage — same property).
    // Batches 0..7 ship with order-sensitive checksums: a manifest
    // that permuted docs within a batch, swapped batches, or drifted
    // one rank fails the hash.
    QueryDef(
      "q9x_batch_manifest",
      (s, dir) => batchManifest(s, dir),
      Some(s"""WITH k AS (
             |  SELECT doc_id, n_chars,
             |    md5('$ManifestSeed|' || CAST(doc_id AS VARCHAR)) AS k
             |  FROM documents),
             |r AS (SELECT doc_id, n_chars,
             |        row_number() OVER (ORDER BY k, doc_id) AS grank
             |      FROM k),
             |b AS (SELECT doc_id, n_chars, grank,
             |        (grank - 1) // $BatchSize AS batch FROM r)
             |SELECT CAST(batch AS BIGINT) AS batch, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS token_chars,
             |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
             |  CAST(sum(doc_id * ((grank - 1) % $BatchSize + 1)) AS BIGINT)
             |    AS order_checksum
             |FROM b WHERE batch < $ManifestBatchesOut
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Seed-deterministic training-batch manifest: distributed " +
        "global enumeration (range partition + keyed rank + offsets, " +
        "no single-partition window), order-sensitive batch checksums"),

    // ------------------------------------------------------------------
    // q7c: INCREMENTAL Z-ORDER MERGE — layout maintenance for q79's
    // clustering, the lakehouse OPTIMIZE shape: a delta batch arrives
    // against an existing z-ordered layout and must merge WITHOUT
    // re-sorting the whole table. Mechanism: the base layout's per-file
    // z-ranges are the routing table; only the files whose range
    // overlaps the delta's z-span are VICTIMS — they are read back,
    // merged with the delta, and rewritten sorted — while every other
    // file is REFERENCED untouched (the final table is a manifest of
    // untouched file paths + the merged region, exactly how table
    // formats express OPTIMIZE without copying). The delta is the
    // clustered slice real ingest produces (the middle z-band's mod-10
    // rows — monotone ids landing in one key region); its span is
    // guaranteed to overlap the file(s) holding that band's other
    // rows, so the rewrite is provably SELECTIVE (victims < files,
    // require()d) and provably SUFFICIENT (the final layout's per-file
    // z-ranges are re-proven disjoint — q79's skippability invariant
    // SURVIVES maintenance, the q7b rule for z-order). Untouched files
    // are pinned byte-identical by size+mtime snapshot. The oracle
    // pins content parity: the manifest table must hold exactly the
    // full corpus (count + z-checksum) — a merge that dropped,
    // duplicated, or double-routed a row hash-fails. At 100 TB this is
    // THE difference between a nightly full re-sort of the table and
    // rewriting only the key regions the day actually touched.
    QueryDef(
      "q7c_zorder_incremental",
      (s, dir) => zorderIncremental(s, dir),
      Some(s"""SELECT count(*) AS n_rows,
             |  CAST(sum(${zInterleaveExpr("l_partkey", "l_suppkey")})
             |    AS BIGINT) AS z_checksum,
             |  true AS multi_file, true AS selective_rewrite,
             |  true AS untouched_intact, true AS ranges_disjoint
             |FROM lineitem""".stripMargin),
      doc = "Incremental z-order merge: delta routed by per-file " +
        "z-ranges, only overlapping files rewritten, untouched files " +
        "referenced byte-identical, disjointness re-proven post-merge"),

    // ------------------------------------------------------------------
    // qc0: PER-KEY TOP-K OVER A SKEWED KEY, the NATIVE-AGGREGATE way —
    // the missing skew story of the suite made concrete. The textbook
    // formulation (`row_number() OVER (PARTITION BY lang ORDER BY
    // n_chars DESC, doc_id)` then rank ≤ k) shuffles the WHOLE corpus
    // onto |langs| partitions and sorts each language's full row set
    // in ONE task; window partitions are atomic to AQE, so the 44 %-
    // share 'en' key means one task sorting 44 % of the corpus — the
    // single-reducer death every 100 TB pipeline hits first. The
    // engine answer is to make top-k ALGEBRAIC: `topk_pairs` (the
    // second native TypedImperativeAggregate after kmv_sketch) keeps a
    // k-bounded sorted pair buffer per group, PARTIAL aggregation
    // combines map-side, and the shuffle carries ≤ k pairs per
    // (lang, map partition) — the hot key costs each map task k
    // entries instead of a sort of its row share, with NO salt needed.
    // Sort order rides the pair: (a, b) = (−n_chars, doc_id) encodes
    // "longest first, doc_id tiebreak"; the result set is the k
    // lexicographically-smallest distinct pairs — order-independent
    // and duplicate-insensitive, so a plain SQL window oracle replays
    // every row exactly. Plan: two ObjectHashAggregates (partial +
    // final) and NO Window/global sort — pinned by PlanShapeSpec.
    QueryDef(
      "qc0_skew_topk_native",
      (s, dir) => {
        graft.GraftExtensions.ensureRegistered(s)
        import s.implicits._
        table(s, dir, "documents")
          .groupBy($"lang")
          .agg(expr(s"topk_pairs(-n_chars, doc_id, $SkewTopK)").as("top"))
          .select($"lang", posexplode($"top"))
          .select($"lang", ($"pos" + 1).cast("int").as("rank"),
            $"col.b".as("doc_id"), (-$"col.a").as("n_chars"))
          .orderBy($"lang", $"rank")
      },
      Some(s"""SELECT lang, CAST(rank AS INT) AS rank, doc_id, n_chars
             |FROM (SELECT lang, doc_id, n_chars,
             |        row_number() OVER (PARTITION BY lang
             |          ORDER BY n_chars DESC, doc_id) AS rank
             |      FROM documents)
             |WHERE rank <= $SkewTopK ORDER BY lang, rank""".stripMargin),
      doc = "Skew-proof per-key top-k via the native bounded topk_pairs " +
        "aggregate: map-side partial top-k, <=k pairs per (key, task) " +
        "through the shuffle, no window sort, no salt"),

    // ------------------------------------------------------------------
    // qc1: the SAME top-k by SALTED TWO-PHASE COMPOSITION — the
    // fallback shape for engines/aggregates where a native bounded
    // aggregate is not available (holistic aggs, UDAF-hostile
    // runtimes), and the suite's explicit demonstration that "salting
    // for skew" composes from stock operators with NO custom code.
    // Phase 1 groups by (lang, salt) — salt = md5-hash of doc_id mod
    // S, so the hot key's rows spread over S buckets — and keeps each
    // bucket's local top-k (sort+slice of a bucket-bounded
    // collect_list); phase 2 re-groups by lang and merges the S
    // bounded candidate lists. Any global top-k member is its
    // bucket's local top-k member, so the composition is EXACT. S is
    // CORPUS-DERIVED (S = max(4, ceil(n/$SkewSaltBudget)) — the q5c
    // scaled-k discipline; the shipped sf dirs exercise S=4 and S=20)
    // and the oracle RE-DERIVES it from count(*) and replays the salt
    // itself: the per-lang max phase-1 bucket width rides the result,
    // pinning the spread as data, not prose. Both phase states are
    // bounded: bucket width ≈ share·n/S ≤ ~budget rows, phase-2
    // fan-in = S·k pairs per key; at 100 TB a 10^6-row budget keeps
    // the hot key's largest task at ~10^6 rows and the merge at
    // (n/10^6)·k — both ordinary task sizes. Contrast with qc0: one
    // extra shuffle and bucket-sized intermediate state vs the native
    // aggregate's k-bounded buffers — the measured price of staying
    // compose-only.
    QueryDef(
      "qc1_skew_topk_salted",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val n = docs.count()
        val sBuckets =
          math.max(4, math.ceil(n.toDouble / SkewSaltBudget).toInt)
        val keyed = docs.select($"lang", $"doc_id", $"n_chars",
          (md5Prefix16($"doc_id") % sBuckets).as("salt"))
        val phase1 = keyed.groupBy($"lang", $"salt")
          .agg(count(lit(1)).as("bucket_rows"),
            slice(sort_array(collect_list(
              struct((-$"n_chars").as("a"), $"doc_id".as("b")))),
              1, SkewTopK).as("part"))
        val phase2 = phase1.groupBy($"lang")
          .agg(max($"bucket_rows").as("max_bucket"),
            slice(sort_array(flatten(collect_list($"part"))),
              1, SkewTopK).as("top"))
        phase2.select($"lang", $"max_bucket", posexplode($"top"))
          .select($"lang", ($"pos" + 1).cast("int").as("rank"),
            $"col.b".as("doc_id"), (-$"col.a").as("n_chars"),
            $"max_bucket".as("max_bucket_rows"),
            lit(sBuckets).as("n_salt_buckets"))
          .orderBy($"lang", $"rank")
      },
      Some(s"""WITH nn AS (SELECT count(*) AS n FROM documents),
             |ss AS (SELECT GREATEST(4, CAST(ceil(n / $SkewSaltBudget.0)
             |         AS INT)) AS s FROM nn),
             |k AS (SELECT lang, doc_id, n_chars,
             |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
             |          1, 4)) AS BIGINT) % (SELECT s FROM ss) AS salt
             |      FROM documents),
             |bw AS (SELECT lang, max(cnt) AS max_bucket_rows
             |       FROM (SELECT lang, salt, count(*) AS cnt
             |             FROM k GROUP BY 1, 2) GROUP BY 1),
             |r AS (SELECT lang, doc_id, n_chars,
             |        row_number() OVER (PARTITION BY lang
             |          ORDER BY n_chars DESC, doc_id) AS rank
             |      FROM documents)
             |SELECT r.lang, CAST(rank AS INT) AS rank, doc_id, n_chars,
             |  bw.max_bucket_rows, (SELECT s FROM ss) AS n_salt_buckets
             |FROM r JOIN bw ON r.lang = bw.lang
             |WHERE rank <= $SkewTopK ORDER BY r.lang, rank""".stripMargin),
      doc = "Skew-proof per-key top-k by salted two-phase composition: " +
        "corpus-derived salt fan-out spreads the hot key, bucket-local " +
        "top-k then bounded merge, exact result; salt and bucket " +
        "widths replayed by the oracle"),

    // ------------------------------------------------------------------
    // qc3: SKEWED JOIN BY HOT-KEY REPLICATION (salted join) — the third
    // skew lever, completing the trilogy: qc0/qc1 fix skewed
    // AGGREGATION, AQE's skew-join split handles sort-merge skew at
    // runtime, and THIS is the manual production shape for when a
    // skewed fact must equi-join a dimension that is too large (or
    // contractually forbidden) to broadcast and the engine's runtime
    // splitting is unavailable — the hot key's entire row set lands in
    // one merge-join task, the same single-reducer death as qc0's
    // window. Mechanism: per-key fan-out R(key) = max(1,
    // ceil(count/budget)) is derived from a per-key frequency pass
    // (|keys| rows — broadcastable at any corpus size, since the
    // DISTINCT key count, not the row count, bounds it); the fact
    // attaches R by broadcast join and salts each row into
    // salt = hash(row) mod R(key); the DIM side replicates each key's
    // row R(key) times via explode(sequence(0, R−1)) — rare keys
    // replicate ZERO extra copies (R=1), only hot keys pay — and the
    // join runs on (key, salt), splitting the hot key's single task
    // into R tasks of ≤ budget rows. EXACT by construction: every fact
    // row matches exactly the ONE dim replica carrying its salt, so
    // the joined multiset equals the plain join's — pinned by the
    // oracle computing the PLAIN join aggregate while re-deriving R,
    // the salt (same md5-prefix hash), and the max per-(key, salt)
    // bucket width as data; a duplicate or dropped match shifts n_docs
    // and hash-fails. The merge hint keeps the demonstration honest
    // (the q7a/qc2 rule: at corpus scale the dim does not broadcast;
    // only the |keys|-row stats frame does). Plan pinned: one
    // BroadcastHashJoin (the stats attach), one SortMergeJoin on
    // (lang, salt) (the replicated join), a Generate (the dim
    // explode), no window. At 100 TB with a 10^6 budget: the frequency
    // pass is one map-side-combined aggregate, replication inflates
    // the dim by Σ(R−1) ≈ n_fact/10^6 rows, and the join's largest
    // task is ~10^6 rows regardless of key skew.
    QueryDef(
      "qc3_skew_join_salted",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val stats = docs.groupBy($"lang")
          .agg(count(lit(1)).as("lang_docs"),
            sum($"n_chars").as("dim_total_chars"))
          .withColumn("r_fanout",
            greatest(lit(1L),
              ceil($"lang_docs" / lit(SkewJoinBudget.toDouble)))
              .cast("int"))
        val fact = docs
          .join(broadcast(stats.select($"lang", $"r_fanout")), Seq("lang"))
          .select($"lang", $"doc_id", $"n_chars",
            (md5Prefix16($"doc_id") % $"r_fanout").as("salt"))
        val dimRep = stats
          .select($"lang", $"dim_total_chars", $"r_fanout",
            explode(sequence(lit(0L), $"r_fanout".cast("long") - 1))
              .as("salt"))
        fact.join(dimRep.hint("merge"), Seq("lang", "salt"))
          .groupBy($"lang", $"salt")
          .agg(count(lit(1)).as("bucket_rows"),
            sum($"n_chars").as("bucket_chars"),
            first($"r_fanout").as("r_fanout"),
            first($"dim_total_chars").as("dim_total_chars"))
          .groupBy($"lang")
          .agg(first($"r_fanout").as("r_fanout"),
            max($"bucket_rows").as("max_bucket_rows"),
            sum($"bucket_rows").as("n_docs"),
            sum($"bucket_chars").as("sum_chars"),
            first($"dim_total_chars").as("dim_total_chars"))
          .select($"lang", $"r_fanout", $"max_bucket_rows", $"n_docs",
            $"sum_chars", $"dim_total_chars")
          .orderBy($"lang")
      },
      Some(s"""WITH st AS (
             |  SELECT lang, count(*) AS lang_docs,
             |    CAST(sum(n_chars) AS BIGINT) AS dim_total_chars
             |  FROM documents GROUP BY 1),
             |r AS (SELECT lang, lang_docs, dim_total_chars,
             |    GREATEST(1, CAST(ceil(lang_docs / $SkewJoinBudget.0)
             |      AS INT)) AS r_fanout FROM st),
             |k AS (SELECT d.lang,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
             |      1, 4)) AS BIGINT) % r.r_fanout AS salt
             |  FROM documents d JOIN r ON d.lang = r.lang),
             |bw AS (SELECT lang, max(cnt) AS max_bucket_rows
             |  FROM (SELECT lang, salt, count(*) AS cnt
             |        FROM k GROUP BY 1, 2) GROUP BY 1),
             |ag AS (SELECT lang, count(*) AS n_docs,
             |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |  FROM documents GROUP BY 1)
             |SELECT r.lang, r.r_fanout, bw.max_bucket_rows, ag.n_docs,
             |  ag.sum_chars, r.dim_total_chars
             |FROM r JOIN bw USING (lang) JOIN ag USING (lang)
             |ORDER BY lang""".stripMargin),
      doc = "Skewed equi-join by hot-key replication: corpus-derived " +
        "per-key fan-out R = ceil(count/budget), fact salted into R " +
        "buckets, dim replicated R ways (rare keys pay nothing), join " +
        "on (key, salt) — exact vs the plain join, R and bucket " +
        "widths oracle-replayed")
  )

  /** q9v: write the two-era layout, read it back as one evolved table.
    * Exposed for the spec's schema/pushdown assertions. */
  def evolvedCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = Tables.scratchDir("q9v_evo")
    val docs = table(s, dir, "documents")
    docs.filter(pmod($"doc_id", lit(2)) === 0)
      .select($"doc_id", $"n_chars")
      .write.mode("overwrite").parquet(s"$out/era=v1")
    docs.filter(pmod($"doc_id", lit(2)) === 1)
      .select($"doc_id", $"n_chars", $"lang")
      .write.mode("overwrite").parquet(s"$out/era=v2")
    val merged = s.read.option("mergeSchema", "true").parquet(out)
    require(merged.columns.toSet ==
        Set("doc_id", "n_chars", "lang", "era"),
      s"q9v: merged schema missing columns: ${merged.columns.mkString(",")}")
    merged
  }

  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    evolvedCorpus(s, dir)
      .groupBy(coalesce($"lang", lit("_legacy_")).as("lang_group"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        sum(when($"lang".isNull, 1L).otherwise(0L)).as("n_legacy"),
        countDistinct($"era").as("n_eras"))
      .orderBy($"lang_group")
  }

  // ------------------------------------------------------------------
  // q9x: training-batch manifest (see the QueryDef for design)
  // ------------------------------------------------------------------
  val ManifestSeed = "r13"
  val BatchSize = 32
  val ManifestBatchesOut = 8
  private val ManifestParts = 8

  /** The distributed global enumeration: (doc_id, n_chars, grank) with
    * grank equal to row_number over (md5(seed|id), id) — computed with
    * NO global-order window. Exposed for the spec's plan assertion. */
  def manifestRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val keyed = table(s, dir, "documents")
      .select($"doc_id", $"n_chars",
        md5(concat(lit(s"$ManifestSeed|"), $"doc_id".cast("string")))
          .as("k"))
    // one materialized partitioning shared by the offset pass and the
    // rank pass (production writes the manifest; same property)
    val parts = keyed
      .repartitionByRange(ManifestParts, $"k", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // per-partition offsets: P scalars through the driver — range
    // partition p holds keys strictly below partition p+1, so the
    // offset of p is the row count of partitions 0..p-1
    val counts = parts.groupBy($"pid").agg(count(lit(1)).as("c"))
      .orderBy($"pid").collect() // bounded: ManifestParts rows
    var acc = 0L
    val offsets = counts.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }.toSeq.toDF("pid", "off")
    parts
      .withColumn("lr", row_number().over(
        Window.partitionBy($"pid").orderBy($"k", $"doc_id")))
      .join(broadcast(offsets), Seq("pid"))
      .select($"doc_id", $"n_chars", ($"off" + $"lr").as("grank"))
  }

  // ------------------------------------------------------------------
  // q7c: incremental z-order merge (see the QueryDef for design)
  // ------------------------------------------------------------------
  /** The 16-bit interleave both z-order queries and their oracles
    * share: z = bits of `a` on even positions, bits of `b` on odd. */
  private def zInterleaveExpr(a: String, b: String): String =
    (0 until 16).map(i =>
      s"(((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" | ")

  def zorderIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val z = expr(zInterleaveExpr("l_partkey", "l_suppkey")).as("z")
    // one parquet decode for the three input passes (z bounds, base
    // write, delta) — the checkpointed projection is 4 narrow columns
    val rows = table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", z)
      .localCheckpoint(true)
    // the delta band: the middle quarter of the observed z-span
    // (derived from two scalars — bounded driver state), mod-10 rows
    val mm = rows.agg(min($"z"), max($"z")).collect().head
    val (zlo, zhi) = (mm.getLong(0), mm.getLong(1))
    val b1 = zlo + (zhi - zlo) / 4
    val b2 = zlo + (zhi - zlo) / 2
    val isDelta = $"z" >= b1 && $"z" < b2 &&
      pmod($"l_orderkey", lit(10)) === 0

    // "last night": the z-ordered base layout
    val baseDir = Tables.scratchDir("q7c_base")
    rows.filter(!isDelta)
      .repartitionByRange(8, $"z").sortWithinPartitions($"z")
      .write.mode("overwrite").parquet(baseDir)
    val inv = s.read.parquet(baseDir)
      .select(input_file_name().as("f"), $"z")
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .collect() // bounded: 8 files

    // "today": the clustered delta arrives; route by file z-ranges
    val delta = rows.filter(isDelta)
    val dmm = delta.agg(min($"z"), max($"z"), count(lit(1)))
      .collect().head
    require(dmm.getLong(2) > 0, "q7c: empty delta batch")
    val (dlo, dhi) = (dmm.getLong(0), dmm.getLong(1))
    val victims = inv.filter(r =>
      r.getAs[Long]("hi") >= dlo && r.getAs[Long]("lo") <= dhi)
      .map(_.getString(0)).toSeq
    val untouched = inv.map(_.getString(0)).filterNot(victims.toSet).toSeq
    require(victims.nonEmpty,
      "q7c: delta overlapped no base file — routing broken")
    val selective = victims.size < inv.length

    def statOf(paths: Seq[String]): Seq[(String, Long, Long)] =
      paths.sorted.map { p =>
        val f = new java.io.File(new java.net.URI(p))
        (p, f.length, f.lastModified)
      }
    val beforeStat = statOf(untouched)

    // the merge: victims + delta re-sorted; everything else untouched
    val mergedDir = Tables.scratchDir("q7c_merged")
    s.read.parquet(victims: _*).unionByName(delta)
      .repartitionByRange(2, $"z").sortWithinPartitions($"z")
      .write.mode("overwrite").parquet(mergedDir)

    // the post-merge table is a MANIFEST: untouched refs + merged dir.
    // ONE pass yields per-file ranges AND the global content totals
    // (n = Σ per-file counts, checksum = Σ per-file z-sums) — the
    // layout proof and the parity proof share the scan.
    val finalDf = s.read.parquet(untouched :+ mergedDir: _*)
    val ranges = finalDf
      .select(input_file_name().as("f"), $"z")
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"),
        count(lit(1)).as("c"), sum($"z").as("zs"))
      .orderBy($"lo")
      .collect() // bounded: ≤ 10 files
    val disjoint = ranges.sliding(2).forall {
      case Array(a, b) => a.getAs[Long]("hi") < b.getAs[Long]("lo")
      case _ => true
    }
    val intact = statOf(untouched) == beforeStat
    val n = ranges.map(_.getAs[Long]("c")).sum
    val zsum = ranges.map(_.getAs[Long]("zs")).sum
    Seq((n, zsum, inv.length > 1, selective, intact, disjoint))
      .toDF("n_rows", "z_checksum", "multi_file", "selective_rewrite",
        "untouched_intact", "ranges_disjoint")
  }

  def batchManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    manifestRanks(s, dir)
      .withColumn("batch", expr(s"(grank - 1) div $BatchSize"))
      .filter($"batch" < ManifestBatchesOut)
      .groupBy($"batch")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("token_chars"),
        sum($"doc_id").as("id_checksum"),
        sum($"doc_id" * (pmod($"grank" - 1, lit(BatchSize)) + 1))
          .as("order_checksum"))
      .orderBy($"batch")
  }
}
