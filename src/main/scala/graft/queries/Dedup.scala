package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table: exact,
  * canonical-set, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design (the whole point of these ops at 100 TB):
  *  - exact/canonical dedup = one hash-shuffle on a 16-byte digest, with
  *    map-side partial aggregation;
  *  - MinHash-LSH: per-doc signature work is narrow (no shuffle); the
  *    only shuffle is the band-bucket self-join — candidate pairs are
  *    generated per bucket, never all-pairs. Bucket skew is bounded
  *    because a bucket key is (band index, 64-bit band hash);
  *  - SimHash: narrow per-doc 64-bit sketch, then a 16-bit-band
  *    self-join, same bounded-bucket property;
  *  - exact pairwise Jaccard is deliberately bounded to a keyed sample —
  *    the verification tail of LSH, not a full O(n²) pass.
  *
  * Everything is `functions._` expressions inside whole-stage codegen —
  * no UDFs. Hashes avoid multiplication (Spark 4 runs ANSI mode: long
  * overflow throws); rotate-XOR mixing gives the same dispersion without
  * overflow.
  */
object Dedup extends Registry {
  import Tables.table

  private def words(c: Column): Column = split(c, " ")

  /** Distinct word-k-shingles of a document (order-sensitive). Documents
    * shorter than k words contribute the whole text as one shingle. */
  def shingles(text: Column, k: Int): Column = {
    val w = words(text)
    when(size(w) < k, array(text)).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*))))
  }

  /** MinHash signature entry s for a shingle array: min over shingles of
    * xxhash64 salted with the hash index. */
  private def minhash(sh: Column, s: Int): Column =
    array_min(transform(sh, x => xxhash64(lit(s + "|"), x)))

  val NumHashes = 12
  val NumBands = 4 // 4 bands × 3 rows: catches J≥~0.5 with high prob.
  private val RowsPerBand = NumHashes / NumBands

  /** (doc_id, band, bh) — one row per (document, band); the LSH join key. */
  private def bandedSignatures(docs: DataFrame): DataFrame = {
    val sh = shingles(col("text"), 3).as("sh")
    val withSh = docs.select(col("doc_id"), sh)
    val mhCols = (0 until NumHashes).map(s => minhash(col("sh"), s).as(s"mh$s"))
    val sig = withSh.select((col("doc_id") +: mhCols): _*)
    val bands = array((0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}")): _*).as("bh"))
    }: _*)
    sig.select(col("doc_id"), explode(bands).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.bh"))
  }

  def defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q40: exact dedup — union the corpus with itself (simulating a
    // re-ingested batch), dedup on content hash, keep lowest doc_id.
    // Reference ops A1/A2 (dict-by-id dedup) distributed.
    QueryDef(
      "q40_dedup_exact",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents").select($"doc_id", $"lang", $"text")
        // min($"lang"), not first(): the same text can appear under two
        // langs, and first() is nondeterministic across task scheduling
        docs.unionAll(docs)
          .groupBy(md5($"text").as("h"))
          .agg(min($"doc_id").as("keeper_id"), min($"lang").as("lang"),
            count(lit(1)).as("n_copies"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_unique"), sum($"n_copies").as("n_total"))
          .orderBy($"lang")
      },
      // oracle mirrors the real dedup (GROUP BY hash first) — a plain
      // per-lang count is only equivalent when no duplicate texts exist,
      // which stops being true at sf0.1
      Some("""SELECT lang, count(*) AS n_unique,
             |  CAST(sum(n_copies) AS BIGINT) AS n_total
             |FROM (SELECT md5(text) AS h, min(lang) AS lang,
             |        2 * count(*) AS n_copies
             |      FROM documents GROUP BY md5(text)) t
             |GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "Exact dedup by content hash over a doubled corpus"),

    // ------------------------------------------------------------------
    // q41: canonical-set dedup — hash of sorted distinct words finds
    // permuted duplicates that exact hashing misses.
    QueryDef(
      "q41_dedup_canonical",
      (s, dir) => {
        import s.implicits._
        val canon = md5(concat_ws(" ", array_sort(array_distinct(words(lower($"text"))))))
        table(s, dir, "documents")
          .groupBy(canon.as("fp"))
          .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_members"))
          .filter($"n_members" > 1)
          .orderBy($"keeper_id")
      },
      Some("""SELECT fp, min(doc_id) AS keeper_id, count(*) AS n_members
             |FROM (SELECT doc_id,
             |        md5(array_to_string(list_sort(list_distinct(
             |          string_split(lower(text),' '))), ' ')) AS fp
             |      FROM documents) t
             |GROUP BY fp HAVING count(*) > 1
             |ORDER BY keeper_id""".stripMargin),
      doc = "Canonical word-set dedup (catches permuted duplicates)"),

    // ------------------------------------------------------------------
    // q42: MinHash + LSH near-duplicate pairs. Not SQL-expressible →
    // rows-only oracle. Verified (exact Jaccard ≥ 0.5) pairs only.
    QueryDef(
      "q42_minhash_lsh",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val banded = bandedSignatures(docs)
        val cands = banded.as("a")
          .join(banded.as("b"),
            $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
              $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        val shs = docs.select($"doc_id", shingles($"text", 3).as("sh"))
        cands
          .join(shs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
          .join(shs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
          .withColumn("jaccard",
            size(array_intersect($"sh_a", $"sh_b")).cast("double") /
              size(array_union($"sh_a", $"sh_b")))
          .filter($"jaccard" >= 0.5)
          .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
          .orderBy($"doc_a", $"doc_b")
      },
      None,
      doc = "MinHash(12)+LSH(4×3) candidate pairs, exact-Jaccard verified"),

    // ------------------------------------------------------------------
    // q43: SimHash near-dup pairs — 64-bit multiset sketch; candidates
    // share a 16-bit band; confirmed at Hamming distance ≤ 8.
    QueryDef(
      "q43_simhash",
      (s, dir) => {
        import s.implicits._
        val wh = transform(words($"text"), w => xxhash64(w))
        val docs = table(s, dir, "documents").select($"doc_id", wh.as("wh"))
        val bits = (0 until 64).map { k =>
          when(size(filter($"wh",
            h => shiftrightunsigned(h, k).bitwiseAND(lit(1L)) === lit(1L))) * 2
            > size($"wh"), shiftleft(lit(1L), k)).otherwise(lit(0L))
        }
        val sim = docs.select($"doc_id", bits.reduce(_ bitwiseOR _).as("simhash"))
        val bandCol = (b: Int) =>
          shiftrightunsigned($"simhash", b * 16).bitwiseAND(lit(0xffffL))
        val banded = sim.select($"doc_id", $"simhash",
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"), bandCol(b).as("key"))): _*)).as("bk"))
          .select($"doc_id", $"simhash", $"bk.band", $"bk.key")
        banded.as("a")
          .join(banded.as("b"),
            $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
              $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
            bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
          .dropDuplicates("doc_a", "doc_b")
          .filter($"hamming" <= 8)
          .orderBy($"doc_a", $"doc_b")
      },
      None,
      doc = "SimHash-64 sketch + 16-bit-band LSH, Hamming ≤ 8"),

    // ------------------------------------------------------------------
    // q44: exact n-gram Jaccard on a bounded key range — the LSH
    // verification tail as a standalone, oracle-checkable op.
    QueryDef(
      "q44_ngram_jaccard",
      (s, dir) => {
        import s.implicits._
        val sample = table(s, dir, "documents").filter($"doc_id" < 300)
        val shs = sample.select($"doc_id", shingles($"text", 2).as("sh"))
        shs.as("a").join(shs.as("b"), $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
            (size(array_intersect($"a.sh", $"b.sh")).cast("double") /
              size(array_union($"a.sh", $"b.sh"))).as("j"))
          .filter($"j" >= 0.3)
          .select($"doc_a", $"doc_b", round($"j", 4).as("jaccard"))
          .orderBy($"doc_a", $"doc_b")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, CASE WHEN len(ws) < 2 THEN [text]
             |    ELSE list_distinct([array_to_string(ws[i:i+1], ' ')
             |                        for i in range(1, len(ws))]) END AS sg
             |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
             |        FROM documents WHERE doc_id < 300) t)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  round(len(list_intersect(a.sg, b.sg))::DOUBLE
             |        / len(list_distinct(list_concat(a.sg, b.sg))), 4) AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.sg, b.sg))::DOUBLE
             |      / len(list_distinct(list_concat(a.sg, b.sg))) >= 0.3
             |ORDER BY doc_a, doc_b""".stripMargin),
      doc = "Exact bigram Jaccard similarity (bounded pair set)")
  )
}
