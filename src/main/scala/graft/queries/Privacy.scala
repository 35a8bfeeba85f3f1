package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the governance staple every production
  * LLM corpus pass runs before training (scrub emails, phone numbers,
  * IP addresses, id-number patterns). No reference counterpart
  * (SURVEY.md §2.7 beyond-reference surface); the adjacent machinery is
  * qa5/qa6's privacy audits and q9u's tombstones.
  *
  * Fixture discipline: the driver corpus contains ZERO digits and no
  * '@' (verified: `regexp_matches(text,'[0-9]')` hits 0 rows at every
  * SF), so PII is PLANTED deterministically from doc_id — identical
  * string concatenation in the engine and the DuckDB oracle — and the
  * planted spans are provably the only matches. Every pattern class is
  * exercised (doc_id%7 picks the class), one branch carries all four
  * classes in one document, and one branch carries near-miss NEGATIVES
  * (an out-of-range IPv4, a wrong-shape id, a bare domain) that the
  * octet-guarded / boundary-anchored patterns must NOT match.
  *
  * Regex dialect: patterns stay inside the Java-regex ∩ RE2 common
  * subset (char classes, bounded repeats, alternation, `\b`) — no
  * lookaround, no backreferences — so Spark codegen and DuckDB compile
  * the SAME pattern text to the same language.
  *
  * At 100 TB: redaction is a narrow per-document projection (regex
  * scalar chain, whole-stage codegen, embarrassingly parallel — no
  * shuffle at all until the deterministic output order); the inventory
  * is one extract+explode pass into a partial-aggregated groupBy whose
  * group count is bounded by distinct PII values, not corpus rows.
  */
object Privacy extends Registry {
  import Tables.table

  // ---- pattern classes (shared verbatim by engine and oracle) -------
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IdPat = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" // SSN-shaped id number
  val PhonePat = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private val Oct = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val Ipv4Pat = s"\\b$Oct(\\.$Oct){3}\\b" // octet-range guarded

  /** Redaction tokens — the SINGLE source for both the replacement
    * strings and the length-identity terms (lengths derive from the
    * token text, so engine expression and oracle SQL cannot drift). */
  val Tokens: Map[String, String] = Map(
    "email" -> "[EMAIL]", "id" -> "[ID]",
    "phone" -> "[PHONE]", "ipv4" -> "[IPV4]")
  private def tokLen(cls: String): Int = Tokens(cls).length

  // ---- deterministic planting (engine side) --------------------------
  // doc_id%7: 0 → clean, 1 → email, 2 → phone, 3 → ipv4, 4 → id,
  // 5 → ALL FOUR, 6 → near-miss negatives only.
  private def planted(d: Column, text: Column): Column = {
    val ds = d.cast("string")
    val email = concat(lit(" contact user"), ds, lit("@example.com now"))
    val phone = concat(lit(" call 555-"), lpad(pmod(d, lit(1000)).cast("string"), 3, "0"),
      lit("-"), lpad(pmod(d * 7, lit(10000)).cast("string"), 4, "0"), lit(" today"))
    val ipv4 = concat(lit(" node 10."), pmod(d, lit(256)).cast("string"),
      lit(".0."), (pmod(d, lit(254)) + 1).cast("string"), lit(" up"))
    val idnum = concat(lit(" ssn 123-45-"),
      lpad(pmod(d, lit(10000)).cast("string"), 4, "0"), lit(" ok"))
    val neg = lit(" ver 999.999.999.999 rel 1234-5678 at example.com end")
    concat(text,
      when(pmod(d, lit(7)) === 1, email)
        .when(pmod(d, lit(7)) === 2, phone)
        .when(pmod(d, lit(7)) === 3, ipv4)
        .when(pmod(d, lit(7)) === 4, idnum)
        .when(pmod(d, lit(7)) === 5, concat(email, idnum, phone, ipv4))
        .when(pmod(d, lit(7)) === 6, neg)
        .otherwise(lit("")))
  }

  /** The same planting as a DuckDB CTE producing (doc_id, t0).
    * (Continuation lines keep `||` at line END — a line-leading `||`
    * would lose its first `|` to the OUTER oracle template's
    * stripMargin when this fragment is interpolated into it.) */
  private val plantedSql: String = {
    val email = "' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@example.com now'"
    val phone = "' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || " +
      "'-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') || ' today'"
    val ipv4 = "' node 10.' || CAST(doc_id % 256 AS VARCHAR) || " +
      "'.0.' || CAST(doc_id % 254 + 1 AS VARCHAR) || ' up'"
    val idnum = "' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
      "' ok'"
    s"""p AS (
       |  SELECT doc_id, text ||
       |    CASE doc_id % 7
       |      WHEN 1 THEN $email
       |      WHEN 2 THEN $phone
       |      WHEN 3 THEN $ipv4
       |      WHEN 4 THEN $idnum
       |      WHEN 5 THEN $email || $idnum || $phone || $ipv4
       |      WHEN 6 THEN ' ver 999.999.999.999 rel 1234-5678 at example.com end'
       |      ELSE ''
       |    END AS t0
       |  FROM documents)""".stripMargin
  }

  private def sumLens(arr: Column): Column =
    aggregate(arr, lit(0), (a, x) => a + length(x))

  /** The staged scrub over any (doc_id, t0) frame — factored so the
    * spec can drive adversarial bodies (boundary-adjacent ids,
    * out-of-range octets, trailing-dot emails) through the exact
    * pipeline qc7 ships. Carries every intermediate (e/i/ph/ip, t1–t4)
    * so tests can assert on the scrubbed text itself. */
  private[queries] def redactStages(p: DataFrame): DataFrame = {
    val s = p.sparkSession
    import s.implicits._
    p
      .withColumn("e", regexp_extract_all($"t0", lit(EmailPat), lit(0)))
      .withColumn("t1", regexp_replace($"t0", EmailPat, Tokens("email")))
      .withColumn("i", regexp_extract_all($"t1", lit(IdPat), lit(0)))
      .withColumn("t2", regexp_replace($"t1", IdPat, Tokens("id")))
      .withColumn("ph", regexp_extract_all($"t2", lit(PhonePat), lit(0)))
      .withColumn("t3", regexp_replace($"t2", PhonePat, Tokens("phone")))
      .withColumn("ip", regexp_extract_all($"t3", lit(Ipv4Pat), lit(0)))
      .withColumn("t4", regexp_replace($"t3", Ipv4Pat, Tokens("ipv4")))
  }

  /** Planted corpus of a documents frame — exposed for the spec's
    * branch-coverage assertions. */
  private[queries] def plantedDocs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select($"doc_id", planted($"doc_id", $"text").as("t0"))
  }

  def defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // qc7: PII REDACTION — staged scrub (email → id → phone → ipv4,
    // each class counted on the text AS THE PREVIOUS STAGE LEFT IT, so
    // the per-document length identity
    //   len(t0) − len(t4) = Σ_c (matched_chars_c − n_c·len(token_c))
    // holds EXACTLY by construction and ships as computed data on both
    // sides (qbb's redacted-bytes discipline). md5 of the final
    // scrubbed text pins every surviving byte; near-miss negatives
    // (999.999.999.999 / 1234-5678 / bare domain) must survive
    // untouched or the md5 and identity both break. One narrow codegen
    // projection per document; the only shuffle is the output order.
    QueryDef(
      "qc7_pii_redact",
      (s, dir) => {
        import s.implicits._
        redactStages(plantedDocs(table(s, dir, "documents")))
          .select(
            $"doc_id",
            size($"e").as("n_email"),
            size($"i").as("n_id"),
            size($"ph").as("n_phone"),
            size($"ip").as("n_ipv4"),
            length($"t0").as("orig_len"),
            length($"t4").as("red_len"),
            (length($"t0") - length($"t4") ===
              sumLens($"e") - size($"e") * tokLen("email") +
              sumLens($"i") - size($"i") * tokLen("id") +
              sumLens($"ph") - size($"ph") * tokLen("phone") +
              sumLens($"ip") - size($"ip") * tokLen("ipv4"))
              .as("len_identity"),
            md5($"t4".cast("binary")).as("red_md5"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH $plantedSql,
              |r AS (
              |  SELECT doc_id, t0,
              |    regexp_extract_all(t0, '$EmailPat') AS e,
              |    regexp_replace(t0, '$EmailPat', '${Tokens("email")}', 'g') AS t1
              |  FROM p),
              |r2 AS (
              |  SELECT *, regexp_extract_all(t1, '$IdPat') AS i,
              |    regexp_replace(t1, '$IdPat', '${Tokens("id")}', 'g') AS t2 FROM r),
              |r3 AS (
              |  SELECT *, regexp_extract_all(t2, '$PhonePat') AS ph,
              |    regexp_replace(t2, '$PhonePat', '${Tokens("phone")}', 'g') AS t3 FROM r2),
              |r4 AS (
              |  SELECT *, regexp_extract_all(t3, '$Ipv4Pat') AS ip,
              |    regexp_replace(t3, '$Ipv4Pat', '${Tokens("ipv4")}', 'g') AS t4 FROM r3)
              |SELECT doc_id,
              |  CAST(len(e) AS INT) AS n_email,
              |  CAST(len(i) AS INT) AS n_id,
              |  CAST(len(ph) AS INT) AS n_phone,
              |  CAST(len(ip) AS INT) AS n_ipv4,
              |  CAST(length(t0) AS INT) AS orig_len,
              |  CAST(length(t4) AS INT) AS red_len,
              |  (length(t0) - length(t4) =
              |     COALESCE(list_sum([length(x) for x in e]), 0) - len(e) * ${tokLen("email")}
              |   + COALESCE(list_sum([length(x) for x in i]), 0) - len(i) * ${tokLen("id")}
              |   + COALESCE(list_sum([length(x) for x in ph]), 0) - len(ph) * ${tokLen("phone")}
              |   + COALESCE(list_sum([length(x) for x in ip]), 0) - len(ip) * ${tokLen("ipv4")})
              |    AS len_identity,
              |  md5(t4) AS red_md5
              |FROM r4 ORDER BY doc_id""".stripMargin),
      doc = "PII redaction: staged email/id/phone/ipv4 scrub with exact " +
        "redacted-bytes length identity, scrubbed-text md5, planted " +
        "fixtures incl. all-four and near-miss-negative branches"),

    // ------------------------------------------------------------------
    // qc8: PII INVENTORY — the detection half as a governance report:
    // WHAT PII values exist, in which class, how often, and the doc-id
    // extent (the "where do we even have phone numbers" question a
    // takedown/consent request starts from). One extract+explode pass
    // per class unioned into a single partial-aggregated groupBy; group
    // cardinality is bounded by distinct planted values (≈ docs/7 per
    // class here, and at 100 TB by the PII population — model-sized,
    // not corpus-sized). Negatives contribute zero rows by
    // construction, which the planted-branch doc extents make visible:
    // every doc_id in the result is ≢ 0,6 (mod 7). The inventory is
    // INTENTIONALLY raw-text-per-class (each class extracts from t0
    // independently): a value matching two classes — an SSN-shaped id
    // inside an email local part — is inventoried under BOTH, because
    // a takedown search must find it either way; qc7's staged scrub
    // deliberately differs (first matching stage consumes the span).
    QueryDef(
      "qc8_pii_inventory",
      (s, dir) => {
        import s.implicits._
        // ONE corpus scan: all four classes extract in a single
        // projection, tag their matches, and one explode flattens the
        // concatenated (class, value) structs — four regex passes per
        // row, one pass over the table (a unionAll of per-class
        // branches would scan and re-plant the corpus four times)
        def tagged(cls: String, pat: String): Column =
          transform(regexp_extract_all($"t0", lit(pat), lit(0)),
            v => struct(lit(cls).as("pii_class"), v.as("value")))
        plantedDocs(table(s, dir, "documents"))
          .select($"doc_id", explode(concat(
            tagged("email", EmailPat), tagged("id", IdPat),
            tagged("phone", PhonePat), tagged("ipv4", Ipv4Pat))).as("m"))
          .select($"doc_id", $"m.pii_class", $"m.value")
          .groupBy($"pii_class", $"value")
          .agg(count(lit(1)).as("n_occurrences"),
            countDistinct($"doc_id").as("n_docs"),
            min($"doc_id").as("min_doc"),
            max($"doc_id").as("max_doc"))
          .orderBy($"pii_class", $"value")
      },
      Some(s"""WITH $plantedSql,
              |m AS (
              |  SELECT doc_id, 'email' AS pii_class,
              |    unnest(regexp_extract_all(t0, '$EmailPat')) AS value FROM p
              |  UNION ALL
              |  SELECT doc_id, 'id',
              |    unnest(regexp_extract_all(t0, '$IdPat')) FROM p
              |  UNION ALL
              |  SELECT doc_id, 'phone',
              |    unnest(regexp_extract_all(t0, '$PhonePat')) FROM p
              |  UNION ALL
              |  SELECT doc_id, 'ipv4',
              |    unnest(regexp_extract_all(t0, '$Ipv4Pat')) FROM p)
              |SELECT pii_class, value,
              |  count(*) AS n_occurrences,
              |  count(DISTINCT doc_id) AS n_docs,
              |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
              |FROM m GROUP BY pii_class, value
              |ORDER BY pii_class, value""".stripMargin),
      doc = "PII inventory: per-(class, value) occurrence counts and " +
        "doc-id extents from one extract+explode pass — detection as a " +
        "governance report, group count bounded by the PII population")
  )
}
