package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Result-level contracts for the round-12 operators, each pinned
  * against an independent in-JVM recompute (never against the engine's
  * own expressions). */
class Round12OpsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** First-8-hex of md5 as unsigned long — the cross-engine hash basis
    * the queries use, recomputed here with java.security directly. */
  private def md5Prefix(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
  }

  // ---------------------------------------------------------------
  // q9j: integer PageRank
  // ---------------------------------------------------------------

  /** Pure-Scala replay of the q9j iteration over the derived graph. */
  private def bruteForcePagerank(ids: Seq[Long]): Map[Long, Long] = {
    val n = ids.size
    val edges = for (src <- ids; j <- 1 to GraphOps.OutDegree)
      yield (src, md5Prefix(s"$src>$j") % n)
    var r = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to GraphOps.Iterations) {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / GraphOps.OutDegree }.sum
      }
      r = ids.map(id => id -> (150000L + 85L * s.getOrElse(id, 0L) / 100L))
        .toMap
    }
    r
  }

  test("q9j pagerank equals a driver-side integer replay of the same " +
    "graph and iterations") {
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    val want = bruteForcePagerank(ids)
    val top = GraphOps.pagerank(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.length == 20)
    // every reported rank matches the replay, and the report IS the
    // replay's top-20 under the (rank desc, id asc) order
    top.foreach { case (id, rank) => assert(want(id) == rank, s"doc $id") }
    val expectedTop = want.toSeq.sortBy { case (id, r) => (-r, id) }.take(20)
    assert(top.toSeq == expectedTop)
    // conservation sanity: total mass stays within the truncation loss
    // of the damped update (each node loses < 100 micro per round to
    // the two integer divisions)
    val total = want.values.sum
    assert(total <= ids.size * 1000000L)
    assert(total > ids.size * 900000L)
  }

  // ---------------------------------------------------------------
  // q9i: hybrid RRF fusion
  // ---------------------------------------------------------------

  test("q9i hybrid RRF: fused scores recompute from the two arms' " +
    "ranks, pools respect HybridPoolK") {
    val rows = Similarity.hybridRrf(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rankT = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rankV = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(rankT.nonEmpty || rankV.nonEmpty)
      Seq(rankT, rankV).flatten.foreach(rk =>
        assert(rk >= 1 && rk <= Similarity.HybridPoolK))
      val expected = rankT.map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        rankV.map(rk => 1000000L / (60 + rk)).getOrElse(0L)
      assert(r.getLong(1) == expected, s"doc ${r.getLong(0)}")
    }
    // fused order is non-increasing with doc_id tiebreaks
    val scores = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(scores.sameElements(scores.sortBy { case (s, id) => (-s, id) }))
  }

  // ---------------------------------------------------------------
  // q9l: weighted sampling (A-ES keys)
  // ---------------------------------------------------------------

  test("q9l weighted sample equals a driver-side replay of the A-ES " +
    "keys over md5 uniforms") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val keyed = docs.map { case (id, w) =>
      val u = (md5Prefix(s"$id|wrs") + 1).toDouble / 4294967296.0
      // HALF_UP like Spark's round() (Math.round floors at negative .5)
      (id, BigDecimal(Math.log(u) / w * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val want = keyed.sortBy { case (id, k) => (-k, id) }.take(20)
    val got = graft.SparkEntry.queries("q9l_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  // ---------------------------------------------------------------
  // q9k: URL canonicalization + per-domain caps
  // ---------------------------------------------------------------

  test("q9k canonical URLs are actually canonical and caps hold " +
    "per domain") {
    val rows = TextOps.urlCanonicalize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perDomain = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { r =>
      val (id, url, domain, rn, kept) = (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getBoolean(4))
      assert(url.startsWith("https://"), url)
      assert(!url.contains("WWW") && !url.contains("www."), url)
      assert(!url.contains(":443") && !url.contains("#"), url)
      assert(!url.contains("utm_"), url)
      assert(url.contains(s"/p/$id?ref="), url)
      assert(domain == "example.com", domain)
      assert(kept == (rn <= TextOps.DomainCap))
      perDomain(domain) = perDomain.getOrElse(domain, 0L).max(rn)
    }
    // rn really is a dense per-domain 1..count sequence: its max equals
    // the domain's row count
    val counts = rows.groupBy(_.getString(2)).view.mapValues(_.length)
    counts.foreach { case (d, n) => assert(perDomain(d) == n.toLong, d) }
  }

  // ---------------------------------------------------------------
  // q6c + the layout-adaptive events source
  // ---------------------------------------------------------------

  test("normalizeTs adapts µs-timestamp and long-nanos layouts to one " +
    "contract") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val micros = 1723500000123456L
    val tsDf = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)).cast("timestamp_ntz"))
    val normalized = graft.streaming.EventStream.normalizeTs(tsDf)
    assert(normalized.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(normalized.collect().head.getLong(1) == micros * 1000L)
    val longDf = Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    assert(graft.streaming.EventStream.normalizeTs(longDf)
      .collect().head.getLong(1) == micros * 1000L)
  }

  test("q6c batch form: double delivery collapses to exactly the " +
    "original slice") {
    val got = graft.SparkEntry.queries("q6c_stream_dedup")(spark, sfDir).count()
    val want = Tables.eventsRaw(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("user_id") < 20).count()
    assert(got == want && got > 0)
  }
}
