package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational capability suite over the TPC-H-ish testdata
  * (TESTDATA.md). The reference engine has no SQL layer — its only
  * relational ops are set algebra + dedup (SURVEY.md §2.4/§2.7); this
  * module supplies the general query surface Spark-first, one `QueryDef`
  * per operator family, each with a DuckDB oracle.
  *
  * Scale notes (100 TB thinking, verified on `.explain`):
  *  - dimension tables (region/nation/supplier/part) are explicitly
  *    `broadcast()` — no shuffle on the fact side for those joins;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *    AQE handles skew;
  *  - aggregates are declarative groupBy → partial (map-side) + final
  *    hash aggregation for free;
  *  - filters/projections sit directly on the scan so parquet pushdown
  *    and column pruning apply.
  */
object Relational extends Registry {
  import Tables.table

  def defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q01: full-scan grouped aggregation (TPC-H Q1 shape): partial+final
    // hash agg, 6 aggregates over 2 grouping cols.
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("2001-09-01").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            sum($"l_extendedprice").as("sum_base_price"),
            sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
            avg($"l_quantity").as("avg_qty"),
            avg($"l_extendedprice").as("avg_price"),
            avg($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  sum(l_extendedprice) AS sum_base_price,
             |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
             |  avg(l_quantity) AS avg_qty,
             |  avg(l_extendedprice) AS avg_price,
             |  avg(l_discount) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "Grouped aggregation w/ filter pushdown (TPC-H Q1 shape)"),

    // ------------------------------------------------------------------
    // q02: selection + projection + deterministic top-n. Filter and the
    // 3-column projection both push into the parquet scan.
    QueryDef(
      "q02_filter_topn",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "orders")
          .filter($"o_orderstatus" === "O" && $"o_totalprice" > 100000.0)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(50)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 50""".stripMargin),
      doc = "Filter + projection pushdown + top-n (TakeOrderedAndProject)"),

    // ------------------------------------------------------------------
    // q03: 3-way join (customer⋈orders⋈lineitem) + agg + top-n
    // (TPC-H Q3). customer side shrinks ~5× after the segment filter —
    // AQE picks broadcast at bench scale; at 100 TB it becomes a shuffle
    // join on the key, which is the right plan there too.
    QueryDef(
      "q03_shipping_priority",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val ord = table(s, dir, "orders")
          .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        val li = table(s, dir, "lineitem")
          .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          // round(.,2) before ranking: a float near-tie at the limit-20
          // boundary could otherwise select different row sets between
          // engines (doubles accumulate in different orders)
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(20)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 20""".stripMargin),
      doc = "Multi-join + agg + top-n (TPC-H Q3 shape)"),

    // ------------------------------------------------------------------
    // q04: left-semi join (EXISTS) — reference op J1
    // (oneKgenomes/document_references.py:209-210 does this with Python
    // set intersection; here it is a real distributed semi join).
    QueryDef(
      "q04_semi_join_exists",
      (s, dir) => {
        import s.implicits._
        val bigLines = table(s, dir, "lineitem").filter($"l_quantity" > 45.0)
        table(s, dir, "orders")
          .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      doc = "Left-semi join = reference set-intersection J1"),

    // ------------------------------------------------------------------
    // q05: left-anti join (NOT EXISTS) — reference op J2
    // (set difference at oneKgenomes/document_references.py:211).
    QueryDef(
      "q05_anti_join_not_exists",
      (s, dir) => {
        import s.implicits._
        // threshold chosen so the anti-join side is non-empty at every
        // scale factor (sf0.001 has 20 qualifying customers; 150k left
        // zero rows there and broke the non-empty test gate)
        val bigOrders = table(s, dir, "orders").filter($"o_totalprice" > 400000.0)
        table(s, dir, "customer")
          .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_totalprice > 400000.0)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      doc = "Left-anti join = reference set-difference J2"),

    // ------------------------------------------------------------------
    // q06: star join with explicitly broadcast dimensions — the 100 TB
    // plan: the fact table never shuffles for dimension joins.
    QueryDef(
      "q06_star_broadcast",
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem")
        val sup = table(s, dir, "supplier")
        val nat = table(s, dir, "nation")
        val reg = table(s, dir, "region")
        li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(
            sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name,
             |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name
             |ORDER BY r_name""".stripMargin),
      doc = "Star-schema join, all dims broadcast (zero fact shuffle)"),

    // ------------------------------------------------------------------
    // q07: top-3 lineitems per return flag — via a BOUNDED map-side
    // top-k Aggregator. l_returnflag has ~3 distinct values, so any
    // window-based ranking must first shuffle the entire fact table to
    // ≤3 partitions (the r1-flagged straggler). The Aggregator's k-row
    // buffer partial-aggregates each input split down to 3 rows BEFORE
    // the shuffle: what moves is (#input-partitions × 3) tiny states,
    // at any table size.
    QueryDef(
      "q07_window_topk",
      (s, dir) => {
        import s.implicits._
        val topk = udaf(new graft.functions.Aggregators.TopKLines(3),
          org.apache.spark.sql.Encoders.product[graft.functions.Aggregators.PricedLine])
        table(s, dir, "lineitem")
          .select($"l_returnflag", $"l_extendedprice", $"l_orderkey", $"l_linenumber")
          .groupBy($"l_returnflag")
          .agg(topk($"l_extendedprice", $"l_orderkey", $"l_linenumber").as("top"))
          .select($"l_returnflag", posexplode($"top"))
          .select($"l_returnflag", $"col.okey".as("l_orderkey"),
            $"col.lnum".as("l_linenumber"), $"col.price".as("l_extendedprice"),
            ($"pos" + 1).cast("int").as("rn"))
          .orderBy($"l_returnflag", $"rn")
      },
      Some("""SELECT * FROM (
             |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             |    CAST(row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rn
             |  FROM lineitem) t
             |WHERE rn <= 3
             |ORDER BY l_returnflag, rn""".stripMargin),
      doc = "Ranking window function, top-k per group"),

    // ------------------------------------------------------------------
    // q08: analytic window with frame — running revenue per supplier
    // ordered by ship date (bounded to a deterministic slice).
    QueryDef(
      "q08_window_running_sum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "lineitem")
          .filter($"l_suppkey" <= 5)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate",
            $"l_extendedprice")
          // round(.,2): long cumulative double chains can land exactly on a
          // half-rounding boundary and disagree with the oracle in the last
          // bit; 2-decimal inputs make the 2-decimal rounded sum stable.
          .withColumn("running_rev", round(sum($"l_extendedprice").over(w), 2))
          .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
             |  round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
             |FROM lineitem
             |WHERE l_suppkey <= 5
             |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin),
      doc = "Analytic window with ROWS frame (running sum)"),

    // ------------------------------------------------------------------
    // q09: rollup — multi-level aggregate in one pass.
    QueryDef(
      "q09_rollup",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty, count(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      doc = "ROLLUP grouping sets"),

    // ------------------------------------------------------------------
    // q10: exact distinct counts (reference op A4 — distinct-set build —
    // generalized to multi-column count distinct).
    QueryDef(
      "q10_count_distinct",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem").agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_suppliers"),
          countDistinct($"l_orderkey").as("n_orders"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_suppliers,
             |  count(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem""".stripMargin),
      doc = "Exact multi-column distinct counts (expand + 2-phase agg)"),

    // ------------------------------------------------------------------
    // q11: set operations — nations having customers but no suppliers
    // (EXCEPT) — reference J2 at relation level.
    QueryDef(
      "q11_set_ops",
      (s, dir) => {
        import s.implicits._
        // custkeys that ordered, minus custkeys that ever ordered with
        // status 'F'; unioned (distinct) with the intersection of
        // high-balance and AUTOMOBILE customers.
        val o = table(s, dir, "orders")
        val ordered = o.select($"o_custkey".as("custkey"))
        val fStatus = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
        val c = table(s, dir, "customer")
        val rich = c.filter($"c_acctbal" > 5000.0).select($"c_custkey".as("custkey"))
        val auto = c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey".as("custkey"))
        ordered.except(fStatus)
          .union(rich.intersect(auto)).distinct()
          .orderBy($"custkey")
      },
      Some("""SELECT custkey FROM (
             |  (SELECT o_custkey AS custkey FROM orders
             |   EXCEPT
             |   SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
             |  UNION
             |  (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
             |   INTERSECT
             |   SELECT c_custkey AS custkey FROM customer
             |   WHERE c_mktsegment = 'AUTOMOBILE')) t
             |ORDER BY custkey""".stripMargin),
      doc = "Set algebra: EXCEPT / INTERSECT / UNION distinct"),

    // ------------------------------------------------------------------
    // q12: scalar-subquery pattern — customers above global mean balance;
    // the scalar agg is broadcast, not recomputed per row.
    QueryDef(
      "q12_above_avg_customers",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer")
        val avgBal = cust.agg(avg($"c_acctbal").as("avg_bal"))
        cust.join(broadcast(avgBal))
          .filter($"c_acctbal" > $"avg_bal")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_above"), max($"c_acctbal").as("max_bal"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_above, max(c_acctbal) AS max_bal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      doc = "Scalar subquery via broadcast single-row agg"),

    // ------------------------------------------------------------------
    // q13: orders-per-customer distribution (TPC-H Q13): outer join +
    // two-level aggregation.
    QueryDef(
      "q13_customer_distribution",
      (s, dir) => {
        import s.implicits._
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        c.join(o, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey) t
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      doc = "Left outer join + double aggregation (TPC-H Q13 shape)"),

    // ------------------------------------------------------------------
    // q14: conditional aggregation (TPC-H Q12 shape) — CASE inside agg.
    QueryDef(
      "q14_conditional_agg",
      (s, dir) => {
        import s.implicits._
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_linestatus")
          .agg(
            sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin),
      doc = "Conditional aggregation (TPC-H Q12 shape)"),

    // ------------------------------------------------------------------
    // q15: grouped part metrics with broadcast part dimension.
    QueryDef(
      "q15_part_metrics",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .join(broadcast(table(s, dir, "part")), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(
            sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            avg($"l_quantity").as("avg_qty"),
            min($"p_retailprice").as("min_price"),
            max($"p_retailprice").as("max_price"),
            count(lit(1)).as("n_lines"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand,
             |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
             |  avg(l_quantity) AS avg_qty,
             |  min(p_retailprice) AS min_price,
             |  max(p_retailprice) AS max_price,
             |  count(*) AS n_lines
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin),
      doc = "Broadcast dimension join + multi-agg"),

    // ------------------------------------------------------------------
    // q16: upsert/dedup-by-key with explicit precedence — reference ops
    // A1/A2/K3 (create_or_extend, utils.py:101-135): new rows win over
    // existing rows with the same key (update_existing=True semantics),
    // modeled as union + row_number window, fully distributed.
    QueryDef(
      "q16_upsert_precedence",
      (s, dir) => {
        import s.implicits._
        val existing = table(s, dir, "customer")
          .select($"c_custkey", $"c_acctbal", lit(0).as("src"))
        // "new" batch: even-keyed customers with adjusted balances
        val incoming = table(s, dir, "customer")
          .filter($"c_custkey" % 2 === 0)
          .select($"c_custkey", ($"c_acctbal" + 1000.0).as("c_acctbal"), lit(1).as("src"))
        val w = Window.partitionBy($"c_custkey").orderBy($"src".desc)
        existing.unionByName(incoming)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"c_custkey", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 1000.0
             |       ELSE c_acctbal END AS c_acctbal
             |FROM customer
             |ORDER BY c_custkey""".stripMargin),
      doc = "Keyed upsert w/ precedence (reference create_or_extend K3/A2)"),

    // ------------------------------------------------------------------
    // q17: CUBE — all four grouping-set combinations in one pass
    // (VERDICT r1 flagged cube/grouping-sets as untested).
    QueryDef(
      "q17_cube",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag".asc_nulls_first,
            $"l_linestatus".asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      doc = "CUBE grouping sets (4 combinations, single pass)"),

    // ------------------------------------------------------------------
    // q18: typed-Aggregator UDAF (geometric mean) — partial+final
    // aggregation exactly like a native agg; the UDAF/UDTF surface of
    // SURVEY §2.7.
    QueryDef(
      "q18_geomean_udaf",
      (s, dir) => {
        import s.implicits._
        val geomean = udaf(graft.functions.Aggregators.GeoMean)
        table(s, dir, "part")
          .groupBy($"p_brand")
          .agg(round(geomean($"p_retailprice"), 4).as("geo_price"),
            count(lit(1)).as("n_parts"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand,
             |  round(exp(avg(ln(p_retailprice))), 4) AS geo_price,
             |  count(*) AS n_parts
             |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      doc = "Typed Aggregator UDAF (geomean) with map-side partial agg"),

    // ------------------------------------------------------------------
    // q19: pivot — wide-format aggregation (one column per pivot value,
    // fixed value list so no extra distinct-scan pass).
    QueryDef(
      "q19_pivot",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(round(sum($"l_quantity"), 2))
          .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      doc = "PIVOT to wide format (explicit value list, single pass)"),

    // ------------------------------------------------------------------
    // q1a: unpivot/melt — long-format normalization of measure columns.
    QueryDef(
      "q1a_unpivot",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_discount")
          .unpivot(Array($"l_orderkey"),
            Array($"l_quantity", $"l_extendedprice", $"l_discount"),
            "metric", "val")
          .groupBy($"metric")
          .agg(count(lit(1)).as("n"), round(sum($"val"), 2).as("total"))
          .orderBy($"metric")
      },
      Some("""SELECT metric, count(*) AS n, round(sum(val), 2) AS total
             |FROM (
             |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
             |  UNION ALL
             |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL
             |  SELECT 'l_discount', l_discount FROM lineitem) t
             |GROUP BY metric ORDER BY metric""".stripMargin),
      doc = "UNPIVOT/melt to long format + aggregate"),

    // ------------------------------------------------------------------
    // q1b: exact interpolated percentiles per group — Spark's
    // `percentile` (exact, sort-based; the scalable sketch variant is
    // percentile_approx, error-bound-tested in ApproxSpec) against
    // DuckDB's quantile_cont, which shares the interpolation definition.
    QueryDef(
      "q1b_percentiles",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.9D))")
            .as("p"))
          .select($"l_returnflag",
            round(get($"p", lit(0)), 4).as("p25"),
            round(get($"p", lit(1)), 4).as("p50"),
            round(get($"p", lit(2)), 4).as("p90"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
             |  round(quantile_cont(l_quantity, 0.9), 4) AS p90
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      doc = "Exact interpolated percentiles per group (vs DuckDB quantile_cont)"),

    // ------------------------------------------------------------------
    // q1c: analytic window functions (lag/lead/ntile) — the
    // value-carrying complement of the ranking (q07) and frame (q08)
    // windows. One shuffle on o_custkey for lag/lead; ntile is
    // SEMANTICALLY global (a quartile needs total order), so it plans
    // an unpartitioned WindowExec by design — acceptable ONLY because
    // its input is filter-bounded (o_custkey < 100, constant rows at
    // any sf). This is the one deliberate exemption in PlanShapeSpec's
    // no-unpartitioned-window gate.
    QueryDef(
      "q1c_window_analytics",
      (s, dir) => {
        import s.implicits._
        val byCust = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey").orderBy($"o_orderkey")
        // global quartile over the o_custkey < 100 slice — bounded
        // (constant customer range × constant orders/customer at any
        // SF), so the single partition is deliberate (PlanShapeSpec
        // exempts q1c on exactly this ground; a literal partition key
        // would not survive the optimizer's constant folding anyway)
        val globalByPrice = org.apache.spark.sql.expressions.Window
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        table(s, dir, "orders")
          .filter($"o_custkey" < 100)
          .select($"o_custkey", $"o_orderkey",
            round($"o_totalprice", 2).as("price"),
            round(lag($"o_totalprice", 1).over(byCust), 2).as("prev_price"),
            round(lead($"o_totalprice", 1).over(byCust), 2).as("next_price"),
            ntile(4).over(globalByPrice).cast("long").as("price_quartile"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(o_totalprice, 2) AS price,
             |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
             |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
             |  ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey)
             |    AS price_quartile
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "Analytic windows: lag/lead per customer + global ntile quartile"),

    // ------------------------------------------------------------------
    // q1d: explicit GROUPING SETS (beyond rollup q09 / cube q17) with
    // grouping() markers — one aggregation pass producing three
    // groupings; nulls normalized so both engines order identically.
    QueryDef(
      "q1d_grouping_sets",
      (s, dir) => {
        table(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
                |  coalesce(l_linestatus, 'ALL') AS ls,
                |  grouping(l_returnflag) AS g_rf,
                |  grouping(l_linestatus) AS g_ls,
                |  count(*) AS n, round(sum(l_quantity), 2) AS qty
                |FROM lineitem_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY rf, ls""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
             |  CAST(grouping(l_linestatus) AS TINYINT) AS g_ls,
             |  count(*) AS n, round(sum(l_quantity), 2) AS qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY rf, ls""".stripMargin),
      doc = "GROUPING SETS with grouping() markers (single multi-grouping pass)"),

    // ------------------------------------------------------------------
    // q93: sketch-based approximate aggregates through the driver gate.
    // Spark's HLL++ and DuckDB's approx sketches differ by construction,
    // so the oracle can't recompute the estimate — instead the query
    // returns the EXACT values plus booleans asserting the sketch landed
    // inside its error contract (±10% ≈ 5σ for HLL at rsd 0.02, ±2% for
    // the approx median at accuracy 1000). The sketch is the 100 TB answer
    // to count-distinct — mergeable partial state, no distinct shuffle —
    // and this makes its error contract part of the gated surface
    // (previously ApproxSpec-only evidence).
    QueryDef(
      "q93_approx_sketch",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .agg(
            countDistinct($"l_partkey").as("exact_parts"),
            approx_count_distinct($"l_partkey", 0.02).as("hll_parts"),
            countDistinct($"l_orderkey").as("exact_orders"),
            approx_count_distinct($"l_orderkey", 0.02).as("hll_orders"),
            expr("percentile(l_extendedprice, 0.5D)").as("exact_med"),
            percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
              .as("approx_med"))
          .select(
            $"exact_parts", $"exact_orders",
            round($"exact_med", 2).as("exact_median"),
            // ±10% ≈ 5σ at rsd 0.02 — HLL error is probabilistic, so
            // the gate is generous on purpose: a 2.5σ (±5%) bound can
            // legitimately trip on a different cardinality and would
            // turn sketch variance into a spurious hash failure
            (abs($"hll_parts" - $"exact_parts") <= $"exact_parts" * 0.10)
              .as("parts_within_10pct"),
            (abs($"hll_orders" - $"exact_orders") <= $"exact_orders" * 0.10)
              .as("orders_within_10pct"),
            (abs($"approx_med" - $"exact_med") <= $"exact_med" * 0.02)
              .as("median_within_2pct"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
             |  count(DISTINCT l_orderkey) AS exact_orders,
             |  round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_median,
             |  true AS parts_within_10pct,
             |  true AS orders_within_10pct,
             |  true AS median_within_2pct
             |FROM lineitem""".stripMargin),
      doc = "HLL count-distinct + approx percentile with gated error bounds"),

    // ------------------------------------------------------------------
    // q1e: native RECURSIVE CTE (Spark 4's WITH RECURSIVE) — the
    // hierarchical-traversal family (org charts, BOMs, entity
    // lineage): ancestors of every entity in the heterogeneous
    // order→customer→nation→region graph, computed by a
    // depth-INDEPENDENT recursive program (the query does not know the
    // graph is 3 levels deep — the recursion discovers it). Spark's
    // recursive CTE supports UNION ALL only, so this is the DAG form;
    // cyclic closure (duplicate clusters) is q48's large-star/
    // small-star CC operator, which is also the 100 TB path for
    // unbounded-diameter graphs — native recursion ships one join+
    // shuffle per LEVEL, perfect for shallow hierarchies, wrong for
    // deep components. Because the readout only needs COUNTS, the
    // anchor pre-aggregates to (parent, n_children) — path counts
    // compose linearly through a DAG, so carrying one weighted row
    // per distinct parent instead of one row per (child, ancestor)
    // path is exact and shrinks every recursion level by the fan-in
    // (~10× here: orders collapse onto customers before level 2; at
    // 100 TB the recursion carries dimension-sized frontiers, not
    // fact-sized ones). The oracle runs the IDENTICAL recursive
    // program in DuckDB — independent recursive evaluation, same
    // fixpoint.
    QueryDef(
      "q1e_recursive_hierarchy",
      (s, dir) => {
        import s.implicits._
        val edges = table(s, dir, "orders")
          .select(concat(lit("o:"), $"o_orderkey").as("child"),
            concat(lit("c:"), $"o_custkey").as("parent"))
          .unionAll(table(s, dir, "customer")
            .select(concat(lit("c:"), $"c_custkey"),
              concat(lit("n:"), $"c_nationkey")))
          .unionAll(table(s, dir, "nation")
            .select(concat(lit("n:"), $"n_nationkey"),
              concat(lit("r:"), $"n_regionkey")))
        edges.createOrReplaceTempView("g_entity_edges")
        s.sql("""WITH RECURSIVE anc(ancestor, depth, cnt) AS (
                |  SELECT parent, 1, count(*) FROM g_entity_edges
                |  GROUP BY parent
                |  UNION ALL
                |  SELECT e.parent, a.depth + 1, a.cnt
                |  FROM anc a JOIN g_entity_edges e ON a.ancestor = e.child)
                |SELECT depth, sum(cnt) AS n_paths,
                |  sum(CASE WHEN ancestor LIKE 'r:%' THEN cnt ELSE 0 END)
                |    AS n_to_region
                |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT 'o:' || o_orderkey AS child,
             |         'c:' || o_custkey AS parent FROM orders
             |  UNION ALL
             |  SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
             |  UNION ALL
             |  SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation),
             |anc(ancestor, depth, cnt) AS (
             |  SELECT parent, 1, count(*) FROM e GROUP BY parent
             |  UNION ALL
             |  SELECT e.parent, a.depth + 1, a.cnt
             |  FROM anc a JOIN e ON a.ancestor = e.child)
             |SELECT depth, CAST(sum(cnt) AS BIGINT) AS n_paths,
             |  CAST(sum(CASE WHEN ancestor LIKE 'r:%' THEN cnt ELSE 0 END)
             |       AS BIGINT) AS n_to_region
             |FROM anc GROUP BY depth ORDER BY depth""".stripMargin),
      doc = "Native recursive CTE: depth-independent ancestor traversal of the entity DAG"),

    // ------------------------------------------------------------------
    // q9c: INCREMENTALLY MAINTAINED SKETCH STATE — the mergeable-
    // aggregate form of the q4b/q9b index-maintenance story, and the
    // 100 TB answer to "keep count-distinct fresh under daily drops":
    // per-key HLL sketches of the base split (o_orderkey % 10 != 0,
    // "yesterday") are STORED as a content-addressed parquet (a few KB
    // per key — 2^lgK registers, corpus-size-independent), and the
    // update sketches ONLY the delta batch and merges register-wise via
    // hll_union. The union is a register-wise max, so the maintained
    // REGISTER state is equivalent to a rebuild — but datasketches
    // estimates a singly-built sketch with the more accurate HIP
    // estimator, which a union cannot preserve (it falls back to the
    // composite estimator), so merged ESTIMATES match a rebuild only
    // within the composite tolerance: observed exact equality while
    // sketches are sparse (sf0.001/sf0.01) and ≤0.05% divergence at
    // the dense sf0.1 sizes. The query pins that honestly as
    // merge_within_1pct_of_rebuild (vs exact count as the yardstick)
    // alongside the q93-style ±10% error contract. DuckDB cannot replay
    // datasketches registers, so the oracle pins the exact counts and
    // the two booleans (the q93 gating pattern). The full-corpus
    // exact/rebuild columns exist ONLY to state the contract; the
    // maintained path itself reads stored state + delta, proven
    // plan-level in Round10OpsSpec.
    QueryDef(
      "q9c_hll_incremental",
      (s, dir) => hllIncremental(s, dir),
      Some("""SELECT o_orderpriority,
             |  count(DISTINCT o_custkey) AS exact_cust,
             |  true AS merged_within_10pct,
             |  true AS merge_within_1pct_of_rebuild
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      doc = "Incrementally maintained HLL state: stored per-key registers " +
        "+ delta-only sketch + hll_union merge, pinned ≈rebuild (HIP-loss " +
        "tolerance) and a gated error contract"),

    // ------------------------------------------------------------------
    // q9e: INCREMENTALLY MAINTAINED COUNT-MIN SKETCH — the EXACTLY
    // mergeable counterpart of q9c, closing the sketch-maintenance
    // family with the second workhorse sketch: per-key FREQUENCY
    // estimates (how many events has each user generated, lifetime)
    // kept fresh under daily drops. The stored state is the CMS counter
    // grid of the base split (event_id % 10 != 0) — CmsDepth×CmsWidth
    // longs, corpus-size-independent like q9c's registers — and the
    // update builds counters from the DELTA batch only and merges by
    // elementwise ADDITION. Unlike HLL's register-max (where the HIP
    // estimator is lost on union, q9c's honest ≤1% tolerance), counter
    // addition is LOSSLESS: the merged grid must equal a from-scratch
    // rebuild bit-for-bit, and the query require()s exactly that, plus
    // the CMS hard guarantee est ≥ exact on every probe. Served probes
    // are the delta's distinct users ("today's active keys — what are
    // their lifetime counts?") so the serve reads stored state + delta
    // only; the full-corpus exact/rebuild columns exist, as in q9c,
    // ONLY to state the contract. The hash basis is the md5-prefix
    // bridge (Sampling.md5Prefix16's convention, 8 hex chars here), so
    // — unlike q9c, where DuckDB cannot reproduce datasketches
    // registers — the ENTIRE sketch replays in SQL: every counter,
    // every probe's min-over-rows estimate, and the ±εN bound are
    // hash-compared, not gated booleans. Error contract: over-count
    // ≤ ceil-free integer bound (3·N) div Width per probe (3 > e, the
    // classic e/w bound made integer-exact so no float boundary can
    // desync the engines). At 100 TB: the delta shuffle is bounded by
    // depth×width groups after map-side partial agg, the merge touches
    // 2 grids of depth×width rows, and the base corpus is never
    // rescanned — the maintained path's cost is O(delta + grid).
    QueryDef(
      "q9e_cms_incremental",
      (s, dir) => cmsIncremental(s, dir),
      Some(s"""WITH delta AS (
             |  SELECT user_id FROM events WHERE event_id % $CmsDeltaMod = 0),
             |cnt AS (
             |  SELECT t.d,
             |    CAST('0x' || substr(md5(CAST(t.d AS VARCHAR) || '|' ||
             |      CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      % $CmsWidth AS w,
             |    count(*) AS cnt
             |  FROM events, range($CmsDepth) t(d) GROUP BY 1, 2),
             |probes AS (SELECT DISTINCT user_id FROM delta),
             |pos AS (
             |  SELECT p.user_id, t.d,
             |    CAST('0x' || substr(md5(CAST(t.d AS VARCHAR) || '|' ||
             |      CAST(p.user_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      % $CmsWidth AS w
             |  FROM probes p, range($CmsDepth) t(d)),
             |est AS (
             |  SELECT pos.user_id, min(cnt.cnt) AS est_cnt
             |  FROM pos JOIN cnt ON cnt.d = pos.d AND cnt.w = pos.w
             |  GROUP BY 1),
             |ex AS (SELECT user_id, count(*) AS exact_cnt
             |       FROM events GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM events)
             |SELECT e.user_id, e.est_cnt, x.exact_cnt,
             |  e.est_cnt - x.exact_cnt <= (3 * tot.n) // $CmsWidth
             |    AS within_eps,
             |  true AS merge_equals_rebuild
             |FROM est e JOIN ex x USING (user_id), tot
             |ORDER BY user_id""".stripMargin),
      doc = "Incrementally maintained count-min sketch: stored counter " +
        "grid + delta-only counters + lossless additive merge (pinned " +
        "exactly equal to rebuild), every estimate replayed in SQL"),

    // ------------------------------------------------------------------
    // q9t: INCREMENTALLY MAINTAINED QUANTILE SKETCH — the third
    // workhorse sketch (after q9c's HLL and q9e's CMS): distribution
    // quantiles (p50/p90/p99 of line price) kept fresh under daily
    // drops via a fixed-width HISTOGRAM. The stored state is the
    // bucket→count table of the base split (l_orderkey % 10 != 0) —
    // bounded by the value range over the bucket width (~1.1k rows
    // here), corpus-size-independent — and the update counts ONLY the
    // delta batch and merges by bucket-wise ADDITION. Like q9e (and
    // unlike q9c), the merge is LOSSLESS: the maintained histogram must
    // equal a from-scratch rebuild bit-for-bit, require()d below. The
    // quantile read-out is deterministic integer arithmetic — smallest
    // bucket whose cumulative count reaches ceil(p·n) — so, unlike
    // t-digest/GK (whose internals no second engine can replay), EVERY
    // number here hash-compares against DuckDB replaying the identical
    // histogram in SQL: bucket edges, exact quantiles, and the
    // containment contract est_lo ≤ exact ≤ est_hi (the histogram's
    // ±bucket-width error bound made exact). The per-value exact arm
    // exists ONLY to state that contract; the maintained path reads
    // stored buckets + delta. At 100 TB: the delta shuffle collapses to
    // ≤ |buckets| groups after map-side partial agg, the merge touches
    // two histogram-sized frames, the cumsum window runs over ~1.1k
    // rows on the driver-side scale, and the base corpus is never
    // rescanned — O(delta + histogram) maintenance, the same shape
    // production percentile dashboards (latency SLOs, price
    // distributions) actually run.
    QueryDef(
      "q9t_quantile_incremental",
      (s, dir) => quantileIncremental(s, dir),
      Some(s"""WITH c AS (
             |  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             |    AS cents FROM lineitem),
             |h AS (SELECT cents // $QtBucketW AS b, count(*) AS cnt
             |      FROM c GROUP BY 1),
             |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
             |cum AS (SELECT b, CAST(sum(cnt) OVER (ORDER BY b) AS BIGINT)
             |        AS cum FROM h),
             |ps AS (SELECT * FROM (VALUES (50), (90), (99)) t(p)),
             |est AS (
             |  SELECT ps.p, min(cum.b) AS bstar
             |  FROM ps, cum, n
             |  WHERE cum.cum >= (ps.p * n.n + 99) // 100
             |  GROUP BY ps.p),
             |vc AS (SELECT cents, count(*) AS cnt FROM c GROUP BY 1),
             |vcum AS (SELECT cents, CAST(sum(cnt) OVER (ORDER BY cents)
             |         AS BIGINT) AS cum FROM vc),
             |ex AS (
             |  SELECT ps.p, min(vcum.cents) AS exact_cents
             |  FROM ps, vcum, n
             |  WHERE vcum.cum >= (ps.p * n.n + 99) // 100
             |  GROUP BY ps.p)
             |SELECT CAST(est.p AS BIGINT) AS p, n.n AS n,
             |  est.bstar * $QtBucketW AS est_lo_cents,
             |  (est.bstar + 1) * $QtBucketW - 1 AS est_hi_cents,
             |  ex.exact_cents,
             |  ex.exact_cents BETWEEN est.bstar * $QtBucketW
             |    AND (est.bstar + 1) * $QtBucketW - 1 AS within_bucket,
             |  true AS merge_equals_rebuild
             |FROM est JOIN ex ON est.p = ex.p, n
             |ORDER BY p""".stripMargin),
      doc = "Incrementally maintained histogram quantile sketch: stored " +
        "bucket counts + delta-only counts + lossless additive merge " +
        "(pinned exactly equal to rebuild), quantile read-out and " +
        "containment contract replayed in SQL"),

    // ------------------------------------------------------------------
    // q9w: RANGE CARDINALITY from TIME-PARTITIONED sketches — the other
    // production axis of the q9c sketch story: q9c keeps ONE sketch
    // fresh under deltas; q9w stores one sketch PER DAY and answers
    // "distinct users over any date range" by merging just that range's
    // registers — the dashboard/retention-analytics shape (DAU over any
    // window, rolling 7/28-day actives) where the event log is written
    // once and every range query afterwards touches only KB-scale
    // register files, never the log. Three ranges (full span, first
    // half, last third — derived deterministically from the state's own
    // day bounds so both engines agree) are each served by one
    // hll_union_agg over ≤|days| sketches. Contract is q93's: the exact
    // per-range distinct count (the contract-only arm — at target scale
    // this is the full-log scan the sketches exist to avoid) rides
    // along with a ±10% bound the estimate must meet, and DuckDB pins
    // exact counts, day bounds, and merged-day counts; the estimate
    // itself is datasketches-internal (the q9c precedent). At 100 TB:
    // the state build is one partial-agged shuffle of |days| groups,
    // state size is days × 2^lgK bytes regardless of event volume, and
    // a range serve moves only the selected registers.
    QueryDef(
      "q9w_range_cardinality",
      (s, dir) => rangeCardinality(s, dir),
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
             |  FROM events),
             |b AS (SELECT min(day) AS dmin, max(day) AS dmax FROM e),
             |r AS (
             |  SELECT 1 AS range_id, dmin AS d_lo, dmax AS d_hi FROM b
             |  UNION ALL
             |  SELECT 2, dmin, dmin + (dmax - dmin) // 2 FROM b
             |  UNION ALL
             |  SELECT 3, dmax - (dmax - dmin) // 3, dmax FROM b)
             |SELECT CAST(r.range_id AS BIGINT) AS range_id,
             |  CAST(r.d_lo AS BIGINT) AS d_lo,
             |  CAST(r.d_hi AS BIGINT) AS d_hi,
             |  count(DISTINCT e.day) AS n_days_merged,
             |  count(DISTINCT e.user_id) AS exact_users,
             |  true AS within_10pct
             |FROM r JOIN e ON e.day BETWEEN r.d_lo AND r.d_hi
             |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),
      doc = "Distinct-users-over-any-date-range served from stored " +
        "per-day HLL registers: range merge touches KB-scale sketches, " +
        "never the event log; exact counts + 10pct contract gated"),

    // ------------------------------------------------------------------
    // qa0: COLUMN PROFILING — the Deequ/Great-Expectations first step
    // every ingest runs before trusting a new drop: per-column null
    // counts, distinct cardinalities, and min/max, in ONE pass over
    // the corpus table. Shape: a single multi-aggregate scan (the
    // count-distincts share one expand; nulls and extrema are plain
    // partial aggs), pivoted to one row per column driver-side from a
    // SINGLE collected row — no per-column rescans, which is the whole
    // point at 100 TB (profiling five columns must not cost five
    // scans). Extrema travel as strings so one schema carries numeric
    // and text columns alike (lexicographic for text — stated, not
    // hidden). The exact count-distincts are affordable because
    // profiling output is per-COLUMN, not per-value; the production
    // variant swaps in approx_count_distinct per q93's contract when
    // even the distinct shuffle is too much.
    QueryDef(
      "qa0_profile",
      (s, dir) => profileDocuments(s, dir),
      Some("""WITH m AS (
             |  SELECT count(*) AS n,
             |    count(*) - count(doc_id) AS nn_doc_id,
             |    count(DISTINCT doc_id) AS nd_doc_id,
             |    CAST(min(doc_id) AS VARCHAR) AS mn_doc_id,
             |    CAST(max(doc_id) AS VARCHAR) AS mx_doc_id,
             |    count(*) - count(text) AS nn_text,
             |    count(DISTINCT text) AS nd_text,
             |    min(text) AS mn_text, max(text) AS mx_text,
             |    count(*) - count(lang) AS nn_lang,
             |    count(DISTINCT lang) AS nd_lang,
             |    min(lang) AS mn_lang, max(lang) AS mx_lang,
             |    count(*) - count(source) AS nn_source,
             |    count(DISTINCT source) AS nd_source,
             |    min(source) AS mn_source, max(source) AS mx_source,
             |    count(*) - count(n_chars) AS nn_n_chars,
             |    count(DISTINCT n_chars) AS nd_n_chars,
             |    CAST(min(n_chars) AS VARCHAR) AS mn_n_chars,
             |    CAST(max(n_chars) AS VARCHAR) AS mx_n_chars
             |  FROM documents)
             |SELECT 'doc_id' AS col_name, n AS n_rows,
             |  nn_doc_id AS n_nulls, nd_doc_id AS n_distinct,
             |  mn_doc_id AS min_value, mx_doc_id AS max_value FROM m
             |UNION ALL SELECT 'lang', n, nn_lang, nd_lang,
             |  mn_lang, mx_lang FROM m
             |UNION ALL SELECT 'n_chars', n, nn_n_chars, nd_n_chars,
             |  mn_n_chars, mx_n_chars FROM m
             |UNION ALL SELECT 'source', n, nn_source, nd_source,
             |  mn_source, mx_source FROM m
             |UNION ALL SELECT 'text', n, nn_text, nd_text,
             |  mn_text, mx_text FROM m
             |ORDER BY col_name""".stripMargin),
      doc = "One-pass column profiling of the corpus table: null " +
        "counts, exact distincts, min/max per column from a single " +
        "multi-aggregate scan, pivoted driver-side"),

    // ------------------------------------------------------------------
    // qa1: CONSTRAINT VALIDATION — the quality GATE the profile
    // informs: declared expectations (key uniqueness, completeness,
    // referential integrity, value ranges) each counted for violations
    // in the cheapest plan that answers it — uniqueness as count −
    // distinct (one agg, no self-join), completeness as a null count
    // (partial agg), referential integrity as broadcast-able left-anti
    // joins, range checks as predicate counts pushed to the scan. One
    // (constraint, n_violations, pass) row each — the report a
    // production gate turns into a hard stop. At 100 TB every check is
    // a single scan or one anti-join on the FK; nothing is quadratic
    // and nothing collects row-level violations to the driver (a real
    // gate writes violating ROWS to a quarantine sink — V1's shape —
    // but decides on the counts alone).
    QueryDef(
      "qa1_constraints",
      (s, dir) => constraintReport(s, dir),
      Some("""SELECT constraint_name, n_violations,
             |  n_violations = 0 AS pass FROM (
             |  SELECT 'lineitem_fk_orders' AS constraint_name,
             |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             |      (SELECT 1 FROM orders o
             |       WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
             |  UNION ALL
             |  SELECT 'lineitem_qty_range',
             |    (SELECT count(*) FROM lineitem
             |     WHERE l_quantity IS NULL
             |        OR l_quantity < 1 OR l_quantity > 50)
             |  UNION ALL
             |  SELECT 'orders_custkey_complete',
             |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
             |  UNION ALL
             |  SELECT 'orders_fk_customer',
             |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
             |      (SELECT 1 FROM customer c
             |       WHERE c.c_custkey = o.o_custkey))
             |  UNION ALL
             |  SELECT 'orders_key_unique',
             |    (SELECT count(*) - count(DISTINCT o_orderkey)
             |     FROM orders)) t
             |ORDER BY constraint_name""".stripMargin),
      doc = "Declared data-quality constraints (uniqueness, " +
        "completeness, referential integrity, ranges) counted for " +
        "violations in single-scan / single-anti-join plans"),

    // ------------------------------------------------------------------
    // qa2: DISTRIBUTION DRIFT between corpus snapshots — the third
    // data-quality step (PROFILE qa0 → CONSTRAIN qa1 → DRIFT qa2):
    // after a refresh, did the corpus composition shift enough to care?
    // Two snapshots (q9r's deterministic v1/v2 split) are compared on
    // the per-language composition axis: each side reduces to
    // |langs| share values in integer micro-units (cnt·1e6 div total —
    // one partial-agged shuffle of |langs| groups per side), the
    // per-language drift is the share delta, and the headline is the
    // TOTAL VARIATION distance (Σ|Δ| div 2 in micro-units) plus a
    // drift gate against a declared threshold — the number a retrain
    // trigger or a data-contract alarm actually fires on. Everything
    // is integer arithmetic on two model-sized aggregate results, so
    // the full report hash-compares; at 100 TB each snapshot costs one
    // narrow scan + a |langs|-group aggregate, and in a q9r-style
    // manifest world even that scan is digest-manifest-sized.
    QueryDef(
      "qa2_snapshot_drift",
      (s, dir) => snapshotDrift(s, dir),
      Some(s"""WITH v1 AS (
             |  SELECT lang, count(*) AS c FROM documents
             |  WHERE doc_id % 7 <> 0 GROUP BY lang),
             |v2 AS (
             |  SELECT lang, count(*) AS c FROM documents
             |  WHERE doc_id % 5 <> 0 GROUP BY lang),
             |t1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM v1),
             |t2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM v2),
             |j AS (
             |  SELECT coalesce(v1.lang, v2.lang) AS lang,
             |    coalesce(v1.c, 0) * 1000000 // t1.n AS share1_micro,
             |    coalesce(v2.c, 0) * 1000000 // t2.n AS share2_micro
             |  FROM v1 FULL OUTER JOIN v2 ON v1.lang = v2.lang, t1, t2)
             |SELECT lang,
             |  CAST(share1_micro AS BIGINT) AS share1_micro,
             |  CAST(share2_micro AS BIGINT) AS share2_micro,
             |  CAST(abs(share1_micro - share2_micro) AS BIGINT)
             |    AS drift_micro,
             |  CAST((SELECT sum(abs(share1_micro - share2_micro))
             |        FROM j) // 2 AS BIGINT) AS tv_distance_micro,
             |  (SELECT sum(abs(share1_micro - share2_micro)) FROM j)
             |    // 2 > $DriftGateMicro AS drift_alarm
             |FROM j ORDER BY lang""".stripMargin),
      doc = "Per-language composition drift between corpus snapshots: " +
        "integer micro-unit shares, total-variation distance, and a " +
        "declared-threshold alarm — two model-sized aggregates"),

    // ------------------------------------------------------------------
    // qa3: ID WELL-FORMEDNESS — the governance check that closes the
    // mint→validate loop: every id the F5 codegen minter
    // (ids.Uuid5.mintCol — sha1, version/variant nibbles) produces for
    // the orders table must satisfy the reference's own `is_valid_uuid`
    // (F6, `fhir_etl/utils.py:34-42` semantics: syntactic UUID parse,
    // any version) AND the strict canonical-form regex a production
    // bulk gate would push through codegen (canonical ⊆ parseable, so
    // the two counts agreeing is itself a contract). The mangled
    // control (hex digits replaced with 'zz') proves the validator
    // REJECTS — a validator that returns true for everything passes
    // accept-only tests. Counts only; the oracle states the contract
    // (all minted valid on every axis, every mangled form rejected) —
    // Spark computes it for real through F5+F6, so a regression in
    // either desyncs the driver compare. One narrow scan, one partial
    // agg; the F6 UDF runs only here (validation gate), the bulk path
    // is the codegen regex.
    QueryDef(
      "qa3_id_validity",
      (s, dir) => {
        import s.implicits._
        val isValid = udf((x: String) => graft.ids.Uuid5.isValidUuid(x))
        val canonical =
          "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
        Tables.table(s, dir, "orders")
          .select(graft.ids.IdMinter.oneKg
            .mintIdentifierCol("Patient", "orders", $"o_orderkey")
            .as("minted"))
          .select($"minted",
            concat(substring($"minted", 1, 34), lit("zz")).as("mangled"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(isValid($"minted"), 1L).otherwise(0L))
              .as("n_minted_valid"),
            sum(when($"minted".rlike(canonical), 1L).otherwise(0L))
              .as("n_minted_canonical"),
            sum(when(!isValid($"mangled"), 1L).otherwise(0L))
              .as("n_mangled_rejected"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  count(*) AS n_minted_valid,
             |  count(*) AS n_minted_canonical,
             |  count(*) AS n_mangled_rejected
             |FROM orders""".stripMargin),
      doc = "Minted-id governance gate: every F5-minted uuid5 parses " +
        "(reference is_valid_uuid) and matches the canonical codegen " +
        "regex; a mangled control proves rejection fires"),

    // ------------------------------------------------------------------
    // qa5: K-ANONYMITY / L-DIVERSITY AUDIT — the privacy measurement a
    // release gate runs before data leaves the fence: group the table
    // by its QUASI-IDENTIFIERS (here nation × market segment — the
    // columns an adversary can link from outside), and report each
    // equivalence class's anonymity set size (k) and the diversity of
    // the SENSITIVE attribute within it (l = distinct acctbal
    // thousands-bracket): a class below K re-identifies its members by
    // linkage; a class with one sensitive value discloses it even at
    // large k (the homogeneity attack l-diversity exists to catch).
    // n_suppressed carries the headline cost of enforcement (rows in
    // sub-K classes a suppression release would drop). Plan: ONE
    // partial-agged groupBy over the QI columns computes size and
    // distinct-sensitive together; the suppression total is a second
    // aggregate over the CLASS-level frame (model-sized, |QI classes|
    // rows), never a second table scan — at 100 TB this is one shuffle
    // of QI-key partial aggregates, the same shape as any rollup.
    QueryDef(
      "qa5_k_anonymity",
      (s, dir) => kAnonymityAudit(Tables.table(s, dir, "customer")),
      Some(s"""WITH cls AS (
             |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
             |    count(*) AS class_size,
             |    count(DISTINCT CAST(floor(c_acctbal / 1000)
             |      AS INT)) AS l_distinct
             |  FROM customer GROUP BY 1, 2),
             |sup AS (
             |  SELECT CAST(coalesce(sum(CASE WHEN class_size < $AnonK
             |    THEN class_size END), 0) AS BIGINT) AS n FROM cls)
             |SELECT nation, segment, class_size,
             |  class_size >= $AnonK AS k_anonymous,
             |  CAST(l_distinct AS BIGINT) AS l_distinct,
             |  l_distinct >= $AnonL AS l_diverse,
             |  sup.n AS n_suppressed
             |FROM cls, sup ORDER BY nation, segment""".stripMargin),
      doc = "k-anonymity / l-diversity audit over quasi-identifier " +
        "classes: anonymity set sizes, sensitive-value diversity, and " +
        "the suppression cost — one partial-agged QI shuffle"),

    // ------------------------------------------------------------------
    // qa6: LOCAL-DP RANDOMIZED RESPONSE — the other privacy mechanism
    // class (perturb, don't suppress): each row reports a BINARY
    // attribute (segment = BUILDING) truthfully with p = 3/4, flipped
    // with p = 1/4 — classic Warner randomized response, ε = ln 3
    // local differential privacy — and the aggregate debiases the
    // noisy count: with E[C] = n/4 + T/2, the unbiased estimate is
    // T̂ = 2C − n/2, carried doubled (est2 = 4C − n) so everything
    // stays integer-exact. The coin is an md5 hash of the row key —
    // DETERMINISTIC so the DuckDB oracle replays every per-row flip
    // and the debias identity bit-for-bit (same trade as q37's hash
    // split; production swaps the keyed hash for a CSPRNG and keeps
    // every aggregate shape). The ±5σ contract (σ(est2) = √(3n))
    // is checked as data: a broken coin, flip rule, or debias
    // constant lands outside it. Plan: one narrow scan, one 4-scalar
    // partial agg — nothing row-level leaves the executors, which is
    // the entire point of the LOCAL model.
    QueryDef(
      "qa6_randomized_response",
      (s, dir) => {
        import s.implicits._
        val t = Tables.table(s, dir, "customer")
          .select(($"c_mktsegment" === "BUILDING").as("truth"),
            (conv(substring(md5(concat(lit("rr:"),
              $"c_custkey".cast("string"))), 1, 8), 16, 10)
              .cast("long") % 4 === 0).as("flip"))
          .select($"truth", ($"truth" =!= $"flip").as("response"))
        t.agg(count(lit(1)).as("n"),
            sum(when($"truth", 1L).otherwise(0L)).as("true_cnt"),
            sum(when($"response", 1L).otherwise(0L)).as("noisy_cnt"))
          .select($"n", $"true_cnt", $"noisy_cnt",
            (lit(4L) * $"noisy_cnt" - $"n").as("est2"),
            (abs(lit(4L) * $"noisy_cnt" - $"n" - lit(2L) * $"true_cnt")
              <= ceil(lit(5.0) * sqrt(lit(3.0) * $"n".cast("double")))
                .cast("long")).as("within_5_sigma"))
      },
      Some("""WITH t AS (
             |  SELECT c_mktsegment = 'BUILDING' AS truth,
             |    CAST(('0x' || substr(md5('rr:' || c_custkey), 1, 8))
             |      AS BIGINT) % 4 = 0 AS flip
             |  FROM customer),
             |r AS (SELECT truth, truth <> flip AS response FROM t),
             |a AS (
             |  SELECT count(*) AS n,
             |    CAST(coalesce(sum(CASE WHEN truth THEN 1 END), 0)
             |      AS BIGINT) AS true_cnt,
             |    CAST(coalesce(sum(CASE WHEN response THEN 1 END), 0)
             |      AS BIGINT) AS noisy_cnt
             |  FROM r)
             |SELECT n, true_cnt, noisy_cnt,
             |  4 * noisy_cnt - n AS est2,
             |  abs(4 * noisy_cnt - n - 2 * true_cnt) <=
             |    CAST(ceil(5.0 * sqrt(3.0 * n)) AS BIGINT)
             |    AS within_5_sigma
             |FROM a""".stripMargin),
      doc = "Warner randomized response (eps = ln 3 local DP) with a " +
        "deterministic keyed coin: per-row perturbation, integer-exact " +
        "debiased estimate, 5-sigma contract checked as data"),

    // ------------------------------------------------------------------
    // qa7: INCREMENTALLY MAINTAINED k-ANONYMITY — qa5's audit kept
    // fresh under streaming ingest, the q9c/q9e lifecycle applied to a
    // PRIVACY gate (the audit a release fence consults must not cost a
    // corpus rescan per arrival). State: per-batch PARTIAL bracket
    // counts, each trigger owning its own partition directory keyed by
    // batchId — a redelivered batch overwrites its own partition with
    // identical content, so at-least-once delivery is idempotent with
    // NO dedup ledger and NO read-modify-write (stronger than q9e's
    // additive grid, which needs care under redelivery; this is the
    // per-writer-delta + compaction shape real lakehouse ingest uses).
    // Serve: Σ over partials (model-sized: classes × brackets × a few
    // batches) → the same report qa5 computes. The serve ≡ rebuild
    // contract runs ONLY on the state-build run (distributed
    // symmetric except count, qb4's rule) — cached-state serves never
    // rescan the customer table; the oracle (identical to qa5's)
    // still gates every emitted result. StreamingSpec drives the same
    // fold from a real foreachBatch stream with redelivery.
    QueryDef(
      "qa7_k_anonymity_incremental",
      (s, dir) => {
        val (stateDir, built) = loadOrBuildKAnonState(s, dir)
        val serve = kAnonServe(s, stateDir)
        if (built) {
          // merge ≡ rebuild, checked once per state build (qb4's
          // rule): distributed symmetric except count — the audit is
          // class-sized today, but the contract instrument must not
          // assume that at scale, and the serve path must not pay a
          // customer-table rescan per execution
          val rebuilt = kAnonymityAudit(Tables.table(s, dir, "customer"))
          val diverged = serve.except(rebuilt).count() +
            rebuilt.except(serve).count()
          require(diverged == 0,
            s"qa7: maintained audit diverged from rebuild " +
              s"($diverged classes in the symmetric difference)")
        }
        serve
      },
      Some(s"""WITH cls AS (
             |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
             |    count(*) AS class_size,
             |    count(DISTINCT CAST(floor(c_acctbal / 1000)
             |      AS INT)) AS l_distinct
             |  FROM customer GROUP BY 1, 2),
             |sup AS (
             |  SELECT CAST(coalesce(sum(CASE WHEN class_size < $AnonK
             |    THEN class_size END), 0) AS BIGINT) AS n FROM cls)
             |SELECT nation, segment, class_size,
             |  class_size >= $AnonK AS k_anonymous,
             |  CAST(l_distinct AS BIGINT) AS l_distinct,
             |  l_distinct >= $AnonL AS l_diverse,
             |  sup.n AS n_suppressed
             |FROM cls, sup ORDER BY nation, segment""".stripMargin),
      doc = "k-anonymity audit maintained incrementally: per-batch " +
        "partial bracket counts (redelivery-idempotent by partition " +
        "ownership), served from state with a merge-equals-rebuild " +
        "contract"),

    // ------------------------------------------------------------------
    // qc2: BLOOM SEMI-JOIN REDUCTION — the shuffle-volume lever for
    // selective fact-fact joins. When a filtered build side selects few
    // join keys out of a huge fact, the naive shuffle join still ships
    // the ENTIRE probe side through the exchange; the classic fix
    // (Bloom-join / runtime filter) compresses the build side's KEY SET
    // into a bit array (16 KB here for 2^16 bits — vs gigabytes of
    // keys) and filters the probe MAP-SIDE, below the exchange, so the
    // shuffle carries ~selectivity × |fact| rows instead of |fact|. At
    // 100 TB with a 1 % predicate that is the difference between
    // shuffling 100 TB and 1 TB. The machinery is q9m's md5 bloom
    // (BloomBits=2^16, k=4 probes — shared helpers, one definition),
    // materialized as a dense word-array LITERAL in the probe
    // predicate: ≤2048 longs collected driver-side (the bounded read
    // that stands in for a broadcast var at scale) and evaluated as
    // pure scalar arithmetic inside whole-stage codegen. Honesty
    // gates: the join is hint("merge") so a broadcast join cannot fake
    // the demonstration (the q7a rule — bloom reduction matters
    // precisely when the build side's ROWS don't broadcast but its
    // keys' BLOOM does); no false negatives is structural (a selected
    // key's bits are all set), and FALSE POSITIVES are not hidden —
    // bloom-passing rows whose order is NOT selected survive to the
    // left join and group under '__bloom_fp__', a row the oracle
    // replays by rebuilding the identical bloom in SQL (expect 0 at
    // small sf, a visible count at sf0.1). One pass over the fact:
    // probe bits are 4 md5s per row, narrow; the only shuffles are the
    // reduced join's and the final 5-row aggregate's.
    QueryDef(
      "qc2_bloom_join_reduction",
      (s, dir) => {
        import s.implicits._
        val sel = table(s, dir, "orders")
          .filter($"o_totalprice" > lit(BloomJoinPriceMin))
          .select($"o_orderkey", $"o_orderpriority")
        val words = Dedup.bloomWordsOf(
          sel.select(md5($"o_orderkey".cast("string")).as("h"))).collect()
        val dense = new Array[Long](Dedup.BloomBits / 32)
        words.foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
        val probe = table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice",
            md5($"l_orderkey".cast("string")).as("h"),
            typedLit(dense.toSeq).as("bw"))
        val withPos = (0 until Dedup.BloomK).foldLeft(probe) { (df, j) =>
          df.withColumn(s"p$j", Dedup.bloomPos($"h", lit(j)))
        }
        val pass = (0 until Dedup.BloomK).map(j =>
          expr(s"((element_at(bw, CAST(p$j div 32 AS INT) + 1) >> " +
            s"CAST(p$j % 32 AS INT)) & 1) = 1")).reduce(_ && _)
        withPos.filter(pass)
          .select($"l_orderkey", $"l_extendedprice")
          .join(sel.hint("merge"),
            $"l_orderkey" === $"o_orderkey", "left")
          .groupBy(coalesce($"o_orderpriority", lit("__bloom_fp__"))
            .as("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_extendedprice"), 2).as("revenue"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""WITH sel AS (
             |  SELECT o_orderkey, o_orderpriority FROM orders
             |  WHERE o_totalprice > $BloomJoinPriceMin),
             |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
             |bloom AS (
             |  SELECT pos // 32 AS w,
             |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
             |  FROM (SELECT (CAST(('0x' || substr(md5(
             |      md5(CAST(o_orderkey AS VARCHAR)) || '#' ||
             |      CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 65536) AS pos
             |    FROM sel, js) GROUP BY 1),
             |keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
             |kpos AS (
             |  SELECT l_orderkey,
             |    (CAST(('0x' || substr(md5(
             |      md5(CAST(l_orderkey AS VARCHAR)) || '#' ||
             |      CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 65536) AS p
             |  FROM keys, js),
             |khit AS (
             |  SELECT l_orderkey,
             |    min(COALESCE((bits >> CAST(p % 32 AS INT)) & 1, 0)) AS hit
             |  FROM kpos LEFT JOIN bloom ON p // 32 = w GROUP BY 1),
             |red AS (
             |  SELECT l.l_orderkey, l.l_extendedprice
             |  FROM lineitem l JOIN khit USING (l_orderkey) WHERE hit = 1)
             |SELECT COALESCE(s.o_orderpriority, '__bloom_fp__')
             |    AS o_orderpriority,
             |  count(*) AS n_items, round(sum(l_extendedprice), 2) AS revenue
             |FROM red LEFT JOIN sel s ON red.l_orderkey = s.o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Bloom semi-join reduction: the filtered build side's key " +
        "set compressed to a 16 KB bit-array literal, probe filtered " +
        "map-side below the exchange, false positives surfaced as a " +
        "replayed row, merge-hinted join keeps the demonstration honest")
  )

  /** Build-or-reuse qa7's per-batch partial state: the customer table
    * split into 3 deterministic arrival batches (c_custkey % 3), each
    * folded exactly as a foreachBatch trigger would. Content-addressed
    * on the source stamp (torn-write rule: key file last). */
  private[queries] def loadOrBuildKAnonState(s: SparkSession,
      dir: String): (String, Boolean) = {
    import s.implicits._
    val src = s"$dir/customer.parquet"
    val key = s"v1|$src|${Tables.sourceStamp(src)}" +
      s"|qa7-brackets|k=$AnonK|l=$AnonL|batches=3"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val stateDir = Tables.persistentScratchDir(s"qa7_kanon_$tag")
    val keyFile = java.nio.file.Paths.get(stateDir, "_graft_index_key")
    val valid = java.nio.file.Files.exists(keyFile) &&
      java.nio.file.Files.readString(keyFile) == key &&
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(stateDir, "partials"))
    if (!valid) {
      val c = Tables.table(s, dir, "customer")
      (0L to 2L).foreach { b =>
        kAnonFoldBatch(s, stateDir, b,
          c.filter(pmod($"c_custkey", lit(3)) === b))
      }
      java.nio.file.Files.writeString(keyFile, key)
    }
    (stateDir, !valid)
  }

  /** qa5 thresholds: minimum anonymity set size and sensitive-value
    * diversity. */
  val AnonK = 5
  val AnonL = 3

  /** qc2: the selective build-side predicate (~1 % of orders at every
    * shipped sf — scale-invariant selectivity, so the reduction ratio
    * the query demonstrates holds at any corpus size). */
  val BloomJoinPriceMin = 495000

  /** qa5's model-sized intermediate: per (QI class, sensitive bracket)
    * row counts — the ADDITIVE state the incremental form (qa7)
    * maintains per micro-batch. */
  private[graft] def kAnonBrackets(customer: DataFrame): DataFrame = {
    val s = customer.sparkSession
    import s.implicits._
    customer
      .groupBy($"c_nationkey".as("nation"), $"c_mktsegment".as("segment"),
        floor($"c_acctbal" / 1000).cast("int").as("bracket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The audit report from bracket counts: class size = Σ cnt,
    * l-diversity = distinct brackets present. Shared by the one-shot
    * kernel (qa5) and the stored-state serve (qa7). */
  private[graft] def kAnonFromBrackets(cb: DataFrame): DataFrame = {
    val s = cb.sparkSession
    import s.implicits._
    val cls = cb.groupBy($"nation", $"segment")
      .agg(sum($"cnt").as("class_size"),
        countDistinct($"bracket").as("l_distinct_i"))
    val sup = cls.agg(coalesce(sum(when($"class_size" < AnonK,
      $"class_size")), lit(0L)).as("n_suppressed"))
    cls.crossJoin(broadcast(sup)) // class-level frame × 1 scalar row
      .select($"nation", $"segment", $"class_size",
        ($"class_size" >= AnonK).as("k_anonymous"),
        $"l_distinct_i".cast("long").as("l_distinct"),
        ($"l_distinct_i" >= AnonL).as("l_diverse"),
        $"n_suppressed")
      .orderBy($"nation", $"segment")
  }

  /** The qa5 kernel over an explicit customer-shaped frame — factored
    * so the spec can plant a sub-K class and a homogeneous class and
    * prove both gates fire. */
  private[graft] def kAnonymityAudit(customer: DataFrame): DataFrame =
    kAnonFromBrackets(kAnonBrackets(customer))

  /** Streaming-maintenance form of qa5 (qa7's state writer): fold ONE
    * micro-batch of customer rows into the stored per-batch PARTIAL
    * bracket counts. Unlike q9e's single additive grid (which is NOT
    * redelivery-safe without a ledger), each batch owns its partition
    * directory keyed by the trigger's batchId: a redelivered batch
    * OVERWRITES its own partition with identical content, so
    * at-least-once delivery is idempotent with no ledger and no
    * read-modify-write — the production per-writer-delta + compaction
    * shape. State is model-sized: |QI classes × brackets| rows per
    * batch. */
  def kAnonFoldBatch(s: SparkSession, stateDir: String, batchId: Long,
      batch: DataFrame): Unit =
    kAnonBrackets(batch).coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/partials/batch=$batchId")

  /** The qa7 serve: audit from the stored partials only (Σ over batch
    * partitions), never the corpus. */
  def kAnonServe(s: SparkSession, stateDir: String): DataFrame = {
    import s.implicits._
    kAnonFromBrackets(
      s.read.parquet(s"$stateDir/partials")
        .groupBy($"nation", $"segment", $"bracket")
        .agg(sum($"cnt").as("cnt")))
  }

  val HllLgK = 14
  private val HllDeltaMod = 10

  /** Build-or-reuse the stored per-priority HLL state over the base
    * split. Returns (state, rebuilt, stateDir). */
  private[queries] def loadOrBuildHllState(s: SparkSession, dir: String)
      : (DataFrame, Boolean, String) = {
    import s.implicits._
    val src = s"$dir/orders.parquet"
    val key = s"v1|$src|${Tables.sourceStamp(src)}" +
      s"|agg=hll-custkey|lgk=$HllLgK|base=mod${HllDeltaMod}ne0"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val stateDir = Tables.persistentScratchDir(s"q9c_hll_$tag")
    val skDir = java.nio.file.Paths.get(stateDir, "sketches")
    val keyFile = java.nio.file.Paths.get(stateDir, "_graft_index_key")
    val valid = java.nio.file.Files.exists(keyFile) &&
      java.nio.file.Files.readString(keyFile) == key &&
      java.nio.file.Files.exists(skDir.resolve("_SUCCESS"))
    if (!valid) {
      Tables.table(s, dir, "orders")
        .filter(pmod($"o_orderkey", lit(HllDeltaMod)) =!= 0)
        .groupBy($"o_orderpriority")
        .agg(hll_sketch_agg($"o_custkey", lit(HllLgK)).as("sk_base"))
        .write.mode("overwrite").parquet(skDir.toString)
      java.nio.file.Files.writeString(keyFile, key)
    }
    (s.read.parquet(skDir.toString), !valid, stateDir)
  }

  /** The maintained estimate: stored base registers ∪ delta-batch
    * sketch, no base rescan. Exposed for the spec's plan assertions. */
  private[queries] def hllMergedEstimate(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val (stored, _, _) = loadOrBuildHllState(s, dir)
    val delta = Tables.table(s, dir, "orders")
      .filter(pmod($"o_orderkey", lit(HllDeltaMod)) === 0)
      .groupBy($"o_orderpriority")
      .agg(hll_sketch_agg($"o_custkey", lit(HllLgK)).as("sk_delta"))
    stored.join(delta, Seq("o_orderpriority"), "full")
      .select($"o_orderpriority",
        hll_sketch_estimate(
          when($"sk_base".isNull, $"sk_delta")
            .when($"sk_delta".isNull, $"sk_base")
            .otherwise(hll_union($"sk_base", $"sk_delta",
              allowDifferentLgConfigK = false))).as("est_merged"))
  }

  /** Streaming-maintenance form of q9c: fold ONE micro-batch of orders
    * rows into the stored per-priority register file (the foreachBatch
    * production shape — a stream keeps count-distinct fresh by merging
    * each trigger's sketches into state whose size is keys × 2^lgK
    * bytes REGARDLESS of stream volume). The state is collected to the
    * driver before the overwrite (bounded: a few KB per key), which
    * also makes the read-modify-write safe against reading the
    * directory being replaced. StreamingSpec proves drained-stream ≡
    * from-scratch rebuild. */
  def hllFoldBatch(s: SparkSession, stateDir: String,
      batch: DataFrame): Unit = {
    import s.implicits._
    val skDir = java.nio.file.Paths.get(stateDir, "sketches")
    val bs = batch.groupBy($"o_orderpriority")
      .agg(hll_sketch_agg($"o_custkey", lit(HllLgK)).as("sk_new"))
    val merged =
      if (java.nio.file.Files.exists(skDir.resolve("_SUCCESS")))
        s.read.parquet(skDir.toString)
          .join(bs, Seq("o_orderpriority"), "full")
          .select($"o_orderpriority",
            when($"sk_base".isNull, $"sk_new")
              .when($"sk_new".isNull, $"sk_base")
              .otherwise(hll_union($"sk_base", $"sk_new",
                allowDifferentLgConfigK = false)).as("sk_base"))
      else bs.select($"o_orderpriority", $"sk_new".as("sk_base"))
    val rows = merged.collect() // bounded: keys × sketch bytes
    s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1),
        merged.schema)
      .write.mode("overwrite").parquet(skDir.toString)
  }

  def hllIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merged = hllMergedEstimate(s, dir)
    // contract columns only: the exact count and the from-scratch
    // sketch exist to GATE the maintained path, not to serve it
    val contract = Tables.table(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("exact_cust"),
        hll_sketch_estimate(hll_sketch_agg($"o_custkey", lit(HllLgK)))
          .as("est_rebuild"))
    merged.join(contract, "o_orderpriority")
      .select($"o_orderpriority", $"exact_cust",
        (abs($"est_merged" - $"exact_cust") <= $"exact_cust" * 0.10)
          .as("merged_within_10pct"),
        (abs($"est_merged" - $"est_rebuild") <= $"exact_cust" * 0.01)
          .as("merge_within_1pct_of_rebuild"))
      .orderBy($"o_orderpriority")
  }

  // ------------------------------------------------------------------
  // q9e: count-min sketch maintenance (see the QueryDef for design)
  // ------------------------------------------------------------------
  val CmsDepth = 4
  val CmsWidth = 512
  private val CmsDeltaMod = 10

  /** q9e only touches (event_id, user_id); the layout-adaptive raw
    * reader keeps the scan resolvable whichever ts type the files
    * carry (same contract as EventOps). */
  private def cmsEvents(s: SparkSession, dir: String): DataFrame =
    Tables.eventsRaw(s, dir)

  /** Row-`d` counter position of `key`: the first 8 hex chars of
    * md5("d|key") as an integer, mod the grid width — the same
    * md5-prefix Spark↔DuckDB bridge as Sampling.md5Prefix16 (md5 is
    * the one hash both engines share bit-for-bit). */
  private def cmsPos(d: Int, key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(d.toString), lit("|"),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % CmsWidth

  /** CMS counter grid of a (user_id) event frame: one row per occupied
    * (d, w) cell. The depth dimension explodes map-side (CmsDepth rows
    * per event), then ONE shuffle bounded by depth×width groups after
    * map-side partial aggregation — at any corpus scale the reduce side
    * is at most CmsDepth×CmsWidth rows. */
  private[graft] def cmsCounters(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.select(explode(array((0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), cmsPos(d, col("user_id")).as("w"))): _*))
        .as("p"))
      .groupBy($"p.d".as("d"), $"p.w".as("w"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Build-or-reuse the stored base-split counter grid. Returns
    * (counters, rebuilt, stateDir). Torn-write rule shared with
    * q9c/q9b: the key file is written last, so interrupted builds leave
    * a key mismatch and are rebuilt wholesale. */
  private[queries] def loadOrBuildCmsState(s: SparkSession, dir: String)
      : (DataFrame, Boolean, String) = {
    import s.implicits._
    val src = s"$dir/events.parquet"
    // v2: the merge≡rebuild contract moved INTO this build (r20, qb4's
    // rule) — the bump forces one rebuild so every serving store has
    // passed the contract
    val key = s"v2|$src|${Tables.sourceStamp(src)}" +
      s"|agg=cms-userid|d=$CmsDepth|w=$CmsWidth|base=mod${CmsDeltaMod}ne0"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val stateDir = Tables.persistentScratchDir(s"q9e_cms_$tag")
    val gridDir = java.nio.file.Paths.get(stateDir, "counters")
    val keyFile = java.nio.file.Paths.get(stateDir, "_graft_index_key")
    val valid = java.nio.file.Files.exists(keyFile) &&
      java.nio.file.Files.readString(keyFile) == key &&
      java.nio.file.Files.exists(gridDir.resolve("_SUCCESS"))
    if (!valid) {
      cmsCounters(cmsEvents(s, dir)
          .filter(pmod($"event_id", lit(CmsDeltaMod)) =!= 0)
          .select($"user_id"))
        .write.mode("overwrite").parquet(gridDir.toString)
      // contract (lossless merge), ON THE BUILD RUN ONLY (qb4's rule;
      // pre-r20 every serve re-counted the full event stream to
      // re-prove it): stored base grid + delta counters must equal a
      // full rebuild bit-for-bit. Throws before the key file lands.
      val delta = cmsEvents(s, dir)
        .filter(pmod($"event_id", lit(CmsDeltaMod)) === 0)
        .select($"user_id")
      val merged = s.read.parquet(gridDir.toString)
        .withColumnRenamed("cnt", "cnt_base")
        .join(cmsCounters(delta).withColumnRenamed("cnt", "cnt_delta"),
          Seq("d", "w"), "full")
        .select($"d", $"w",
          (coalesce($"cnt_base", lit(0L)) + coalesce($"cnt_delta", lit(0L)))
            .as("cnt"))
      val rebuilt = cmsCounters(cmsEvents(s, dir).select($"user_id"))
      val diff = merged
        .join(rebuilt.withColumnRenamed("cnt", "cnt_rb"), Seq("d", "w"),
          "full")
        .agg(sum(abs(coalesce($"cnt", lit(0L)) - coalesce($"cnt_rb", lit(0L))))
          .as("dv"))
        .collect().head
      require(!diff.isNullAt(0) && diff.getLong(0) == 0L,
        "q9e: merged CMS counters diverged from a from-scratch rebuild")
      java.nio.file.Files.writeString(keyFile, key)
    }
    (s.read.parquet(gridDir.toString), !valid, stateDir)
  }

  /** The maintained grid: stored base counters + delta-batch counters,
    * merged by elementwise addition (lossless — the q9c contrast).
    * Exposed for the spec's plan/equality assertions. */
  private[graft] def cmsMergedCounters(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val (stored, _, _) = loadOrBuildCmsState(s, dir)
    val delta = cmsEvents(s, dir)
      .filter(pmod($"event_id", lit(CmsDeltaMod)) === 0)
      .select($"user_id")
    stored.withColumnRenamed("cnt", "cnt_base")
      .join(cmsCounters(delta).withColumnRenamed("cnt", "cnt_delta"),
        Seq("d", "w"), "full")
      .select($"d", $"w",
        (coalesce($"cnt_base", lit(0L)) + coalesce($"cnt_delta", lit(0L)))
          .as("cnt"))
  }

  /** Streaming-maintenance form of q9e: fold ONE micro-batch of events
    * into the stored counter grid (the foreachBatch production shape —
    * state size is depth×width longs REGARDLESS of stream volume, and
    * because counter addition is exactly mergeable the drained state
    * equals a from-scratch build bit-for-bit, with no q9c-style
    * estimator caveat). The grid is collected to the driver before the
    * write (bounded). Additive counters are NOT naturally idempotent —
    * a redelivered batch would double-count — so the fold carries an
    * applied-batch LEDGER, and state + ledger commit in ONE atomic
    * rename via [[VersionedState]]: a crash can never leave merged
    * counters marked unapplied (the window the old write-grid-then-
    * touch-marker order had), which is what makes at-least-once
    * redelivery exactly-once at the sink. */
  def cmsFoldBatch(s: SparkSession, stateDir: String, batchId: Long,
      batch: DataFrame): Unit = {
    import s.implicits._
    if (VersionedState.applied(stateDir, batchId)) return
    val bc = cmsCounters(batch.select($"user_id"))
      .withColumnRenamed("cnt", "cnt_new")
    val merged = VersionedState.tablePath(stateDir, "counters") match {
      case Some(grid) =>
        s.read.parquet(grid.toString)
          .join(bc, Seq("d", "w"), "full")
          .select($"d", $"w",
            (coalesce($"cnt", lit(0L)) + coalesce($"cnt_new", lit(0L)))
              .as("cnt"))
      case None => bc.select($"d", $"w", $"cnt_new".as("cnt"))
    }
    val rows = merged.collect() // bounded: ≤ depth×width rows
    VersionedState.commit(stateDir, batchId) { vdir =>
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1),
          merged.schema)
        .write.parquet(vdir.resolve("counters").toString)
    }
  }

  def cmsIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merged = cmsMergedCounters(s, dir)
    // contract 1 (lossless merge) runs on the STATE-BUILD run inside
    // loadOrBuildCmsState (qb4's rule — r20; pre-r20 every serve
    // re-counted the full event stream as the contract instrument). A
    // serving store exists only because the contract held, so the
    // in-band flag below is constant-true by construction — exactly
    // as it was before, when require(mergeEq) preceded it. PRECISELY:
    // the flag asserts "contract verified when this store was BUILT";
    // post-build store corruption (key file + _SUCCESS intact) is
    // carried by parquet footer checksums + the per-query oracle
    // hash, not re-proven per serve.
    val mergeEq = true

    // serve: lifetime estimates for the delta's active keys, from the
    // merged grid only (broadcast: ≤ depth×width rows)
    val probes = cmsEvents(s, dir)
      .filter(pmod($"event_id", lit(CmsDeltaMod)) === 0)
      .select($"user_id").distinct()
    val est = probes
      .select($"user_id", explode(array((0 until CmsDepth).map(d =>
          struct(lit(d).as("d"), cmsPos(d, col("user_id")).as("w"))): _*))
        .as("p"))
      .select($"user_id", $"p.d".as("d"), $"p.w".as("w"))
      .join(broadcast(merged), Seq("d", "w"))
      .groupBy($"user_id").agg(min($"cnt").as("est_cnt"))

    // contract 2 (error bound): integer-exact (3·N) div Width ≥ the
    // classic e·N/w CMS bound, with no float boundary to desync the
    // engines; contract 3 (hard guarantee): est ≥ exact, require()d
    // below driver-side so a broken merge errors the query even though
    // both engines would agree on the comparison columns. N_total is
    // the sum of the per-key exact counts — same scan, one fewer full
    // pass than the old separate ev.agg(count) (r20).
    val exact = cmsEvents(s, dir).groupBy($"user_id")
      .agg(count(lit(1)).as("exact_cnt"))
      .localCheckpoint(true) // bounded: one row per active key
    val out = est.join(exact, Seq("user_id"))
      .crossJoin(broadcast(exact.agg(
        sum($"exact_cnt").cast("long").as("n_total"))))
      .select($"user_id", $"est_cnt", $"exact_cnt",
        ($"est_cnt" - $"exact_cnt" <= expr(s"(3 * n_total) div $CmsWidth"))
          .as("within_eps"),
        lit(mergeEq).as("merge_equals_rebuild"))
      .orderBy($"user_id")
      .localCheckpoint(true) // bounded: one row per delta-active key
    require(out.filter($"est_cnt" < $"exact_cnt").isEmpty,
      "q9e: CMS estimate below exact count — hash or merge broken")
    out
  }

  // ------------------------------------------------------------------
  // q9t: histogram quantile maintenance (see the QueryDef for design)
  // ------------------------------------------------------------------
  /** Bucket width in integer cents ($100): bounds the stored state at
    * (max price / width) ≈ 1.1k rows whatever the corpus size, and IS
    * the quantile error bound (est_hi − est_lo = W − 1). */
  val QtBucketW = 10000L
  private val QtDeltaMod = 10
  private val QtPs = Seq(50, 90, 99)

  /** The exact integer basis both engines share: l_extendedprice in
    * rounded cents (a raw double×100 cast would truncate 936.01→93600
    * on the float side; round() first is bit-stable in both engines). */
  private[graft] def qtCentsOf(price: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    round(price * 100).cast("long")

  private def qtCents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "lineitem")
      .select($"l_orderkey", qtCentsOf($"l_extendedprice").as("cents"))
  }

  /** Histogram of a cents frame: one row per occupied bucket. ONE
    * shuffle bounded by |buckets| groups after map-side partial agg —
    * the reduce side is ≤ ~1.1k rows at any corpus scale. */
  private[graft] def qtHist(cents: DataFrame): DataFrame = {
    val s = cents.sparkSession
    import s.implicits._
    cents.groupBy(expr(s"cents div $QtBucketW").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Build-or-reuse the stored base-split histogram. Returns
    * (histogram, rebuilt, stateDir). Torn-write rule shared with
    * q9c/q9e: key file last. */
  private[queries] def loadOrBuildQtState(s: SparkSession, dir: String)
      : (DataFrame, Boolean, String) = {
    import s.implicits._
    val src = s"$dir/lineitem.parquet"
    // v2: the merge≡rebuild contract moved INTO this build (r20, qb4's
    // rule) — the bump forces one rebuild so every serving store has
    // passed the contract
    val key = s"v2|$src|${Tables.sourceStamp(src)}" +
      s"|agg=hist-extprice-cents|w=$QtBucketW|base=mod${QtDeltaMod}ne0"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val stateDir = Tables.persistentScratchDir(s"q9t_hist_$tag")
    val histDir = java.nio.file.Paths.get(stateDir, "hist")
    val keyFile = java.nio.file.Paths.get(stateDir, "_graft_index_key")
    val valid = java.nio.file.Files.exists(keyFile) &&
      java.nio.file.Files.readString(keyFile) == key &&
      java.nio.file.Files.exists(histDir.resolve("_SUCCESS"))
    if (!valid) {
      qtHist(qtCents(s, dir)
          .filter(pmod($"l_orderkey", lit(QtDeltaMod)) =!= 0))
        .write.mode("overwrite").parquet(histDir.toString)
      // contract (lossless merge), ON THE BUILD RUN ONLY (qb4's rule;
      // pre-r20 every serve re-histogrammed the full corpus to
      // re-prove it): stored base buckets + delta buckets must equal
      // a full rebuild bit-for-bit. Throws before the key file lands.
      val delta = qtHist(qtCents(s, dir)
        .filter(pmod($"l_orderkey", lit(QtDeltaMod)) === 0))
      val merged = s.read.parquet(histDir.toString)
        .withColumnRenamed("cnt", "cnt_base")
        .join(delta.withColumnRenamed("cnt", "cnt_delta"), Seq("b"), "full")
        .select($"b",
          (coalesce($"cnt_base", lit(0L)) + coalesce($"cnt_delta", lit(0L)))
            .as("cnt"))
      val rebuilt = qtHist(qtCents(s, dir))
      val diff = merged
        .join(rebuilt.withColumnRenamed("cnt", "cnt_rb"), Seq("b"), "full")
        .agg(sum(abs(coalesce($"cnt", lit(0L)) - coalesce($"cnt_rb", lit(0L))))
          .as("dv"))
        .collect().head
      require(!diff.isNullAt(0) && diff.getLong(0) == 0L,
        "q9t: merged histogram diverged from a from-scratch rebuild")
      java.nio.file.Files.writeString(keyFile, key)
    }
    (s.read.parquet(histDir.toString), !valid, stateDir)
  }

  /** The maintained histogram: stored base buckets + delta-batch
    * buckets, merged by bucket-wise addition (lossless, like q9e's
    * grid). Exposed for the spec's plan/equality assertions. */
  private[graft] def qtMergedHist(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val (stored, _, _) = loadOrBuildQtState(s, dir)
    val delta = qtHist(qtCents(s, dir)
      .filter(pmod($"l_orderkey", lit(QtDeltaMod)) === 0))
    stored.withColumnRenamed("cnt", "cnt_base")
      .join(delta.withColumnRenamed("cnt", "cnt_delta"), Seq("b"), "full")
      .select($"b",
        (coalesce($"cnt_base", lit(0L)) + coalesce($"cnt_delta", lit(0L)))
          .as("cnt"))
  }

  /** Streaming-maintenance form of q9t: fold ONE micro-batch of
    * lineitem rows into the stored bucket-count histogram (the
    * foreachBatch production shape — state stays ≤ |buckets| rows
    * regardless of stream volume, and because bucket addition is
    * exactly mergeable the drained state equals a from-scratch
    * histogram bit-for-bit: q9e's lossless guarantee, not q9c's
    * estimator tolerance). The histogram is collected to the driver
    * before the write (bounded: ≤ ~1.1k rows). Additive — so the
    * applied-batch ledger guards redelivery, committed atomically
    * with the histogram via [[VersionedState]] (see cmsFoldBatch). */
  def qtFoldBatch(s: SparkSession, stateDir: String, batchId: Long,
      batch: DataFrame): Unit = {
    import s.implicits._
    if (VersionedState.applied(stateDir, batchId)) return
    val bh = qtHist(batch
        .select(qtCentsOf($"l_extendedprice").as("cents")))
      .withColumnRenamed("cnt", "cnt_new")
    val merged = VersionedState.tablePath(stateDir, "hist") match {
      case Some(hist) =>
        s.read.parquet(hist.toString)
          .join(bh, Seq("b"), "full")
          .select($"b",
            (coalesce($"cnt", lit(0L)) + coalesce($"cnt_new", lit(0L)))
              .as("cnt"))
      case None => bh.select($"b", $"cnt_new".as("cnt"))
    }
    val rows = merged.collect() // bounded: ≤ |buckets| rows
    VersionedState.commit(stateDir, batchId) { vdir =>
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1),
          merged.schema)
        .write.parquet(vdir.resolve("hist").toString)
    }
  }

  /** ceil(p·n / 100) over in-scope columns `p`/`n`, in pure integer
    * arithmetic (no float boundary to desync the engines); `div`
    * truncation equals DuckDB's `//` floor on these non-negative
    * operands. */
  private def qtTarget: org.apache.spark.sql.Column =
    expr("(p * n + 99) div 100")

  def quantileIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merged = qtMergedHist(s, dir)
    // contract 1 (lossless merge) runs on the STATE-BUILD run inside
    // loadOrBuildQtState (qb4's rule — r20; pre-r20 every serve
    // re-histogrammed the full corpus as the contract instrument). A
    // serving store exists only because the contract held, so the
    // in-band flag below is constant-true by construction — exactly
    // as it was before, when require(mergeEq) preceded it. PRECISELY:
    // the flag asserts "contract verified when this store was BUILT";
    // post-build store corruption is carried by parquet footer
    // checksums + the per-query oracle hash, not re-proven per serve.
    val mergeEq = true

    // Bucket-axis readout, r21: ONE evaluation of the maintained
    // histogram — a bounded collect (≤ ~1.1k bucket rows, state-sized
    // by construction; the pre-r21 shape collected the SAME rows to
    // the driver anyway, as the broadcast side of the estimate join,
    // and evaluated the merge subtree up to four times on top). n,
    // the per-p estimated buckets (inclusive-prefix threshold scan)
    // and the exact arm's per-bucket offsets (exclusive prefix) all
    // fold from the collected rows; the r20 single-partition
    // WindowExec over the bucket axis is gone entirely.
    val hist = merged.orderBy($"b").collect()
    val nTotal = hist.iterator.map(_.getLong(1)).sum
    def targetOf(p: Int): Long = (p.toLong * nTotal + 99L) / 100L
    val estRows = QtPs.flatMap { p =>
      var cum = 0L
      var hit: Option[(Long, Long)] = None
      val it = hist.iterator
      while (hit.isEmpty && it.hasNext) {
        val r = it.next()
        cum += r.getLong(1)
        if (cum >= targetOf(p)) hit = Some((p.toLong, r.getLong(0)))
      }
      hit
    }
    val est = estRows.toDF("p", "bstar")
    val offRows = {
      var acc = 0L
      hist.toSeq.map { r =>
        val o = (r.getLong(0), acc); acc += r.getLong(1); o
      }
    }

    // contract 2 (containment): the exact quantile must land inside
    // the estimated bucket. The per-value cumsum below is the
    // contract-only arm — and the one place this query used to move
    // EVERY distinct cents value into a single WindowExec partition
    // (fine at sf0.1, a serialization point at 100 TB). r21: two-level
    // cumsum (guide §2.5's two-level aggregation applied to a prefix
    // sum) — a hash-partitioned within-bucket window plus the bounded
    // per-bucket offsets from the maintained histogram (the lossless-
    // merge contract guarantees the histogram's per-bucket counts
    // equal a fresh bucket aggregation, so the exact arm never
    // re-derives bucket totals); cb is monotone in cents, so
    // off(cb) + within-bucket prefix ≡ the global prefix exactly.
    val perCents = qtCents(s, dir)
      .groupBy($"cents").agg(count(lit(1)).as("cnt"))
      .withColumn("cb", expr(s"cents div $QtBucketW"))
    val wIn = Window.partitionBy($"cb").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val vcum = perCents.withColumn("cumw", sum($"cnt").over(wIn))
      .join(broadcast(offRows.toDF("cb", "off")), Seq("cb"))
      .select($"cents", ($"cumw" + $"off").as("cum"))
    val targets = QtPs.map(p => (p.toLong, targetOf(p))).toDF("p", "tgt")
    val exact = vcum.join(broadcast(targets), $"cum" >= $"tgt")
      .groupBy($"p").agg(min($"cents").as("exact_cents"))

    val out = est.join(exact, Seq("p"))
      .select($"p", lit(nTotal).as("n"),
        ($"bstar" * QtBucketW).as("est_lo_cents"),
        (($"bstar" + 1) * QtBucketW - 1).as("est_hi_cents"),
        $"exact_cents",
        $"exact_cents".between($"bstar" * QtBucketW,
          ($"bstar" + 1) * QtBucketW - 1).as("within_bucket"),
        lit(mergeEq).as("merge_equals_rebuild"))
      .orderBy($"p")
      .localCheckpoint(true) // bounded: |QtPs| rows
    require(out.filter(!$"within_bucket").isEmpty,
      "q9t: exact quantile escaped the estimated bucket — histogram broken")
    out
  }

  // ------------------------------------------------------------------
  // qa0/qa1: data-quality ops (see the QueryDefs for design)
  // ------------------------------------------------------------------
  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  def profileDocuments(s: SparkSession, dir: String): DataFrame =
    profileOf(Tables.table(s, dir, "documents"), ProfileCols)

  /** The qa0 kernel over an explicit frame — factored so the spec can
    * prove planted nulls/duplicates land in the right report cells. */
  private[graft] def profileOf(d: DataFrame, cols: Seq[String])
      : DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    // ONE multi-aggregate pass; the pivot to per-column rows happens
    // on a single collected row (bounded: 1 row × 4·|cols|+1 cells)
    val r = d.agg(aggs.head, aggs.tail: _*).collect().head
    val n = r.getAs[Long]("n")
    cols.sorted.map { c =>
      (c, n, r.getAs[Long](s"nn_$c"), r.getAs[Long](s"nd_$c"),
        r.getAs[String](s"mn_$c"), r.getAs[String](s"mx_$c"))
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value")
  }

  def constraintReport(s: SparkSession, dir: String): DataFrame =
    constraintChecks(s,
      Tables.table(s, dir, "lineitem"),
      Tables.table(s, dir, "orders"),
      Tables.table(s, dir, "customer"))

  /** The qa1 kernel over explicit frames — factored so the spec can
    * plant violations and prove each check actually fires. */
  private[graft] def constraintChecks(s: SparkSession, li: DataFrame,
      o: DataFrame, c: DataFrame): DataFrame = {
    import s.implicits._
    // each check is the cheapest plan answering it: counts come back
    // as 5 driver scalars — no row-level violations leave the cluster
    val checks = Seq(
      ("lineitem_fk_orders",
        li.select($"l_orderkey")
          .join(o.select($"o_orderkey"),
            $"l_orderkey" === $"o_orderkey", "left_anti").count()),
      ("lineitem_qty_range",
        li.filter($"l_quantity".isNull ||
          $"l_quantity" < 1 || $"l_quantity" > 50).count()),
      ("orders_custkey_complete",
        o.filter($"o_custkey".isNull).count()),
      ("orders_fk_customer",
        o.select($"o_custkey")
          .join(c.select($"c_custkey"),
            $"o_custkey" === $"c_custkey", "left_anti").count()),
      ("orders_key_unique", {
        val r = o.agg(count(lit(1)), countDistinct($"o_orderkey"))
          .collect().head
        r.getLong(0) - r.getLong(1)
      }))
    checks.map { case (name, v) => (name, v, v == 0L) }
      .toDF("constraint_name", "n_violations", "pass")
      .orderBy($"constraint_name")
  }

  /** qa2: total-variation alarm threshold (micro-units = 2%). */
  val DriftGateMicro = 20000L

  def snapshotDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.table(s, dir, "documents").select($"doc_id", $"lang")
    def shares(f: org.apache.spark.sql.Column, name: String): DataFrame = {
      val counts = d.filter(f).groupBy($"lang").agg(count(lit(1)).as("c"))
      val total = counts.agg(sum($"c").as("n"))
      counts.crossJoin(broadcast(total))
        .select($"lang", expr("c * 1000000 div n").as(name))
    }
    val j = shares($"doc_id" % 7 =!= 0, "share1_micro")
      .join(shares($"doc_id" % 5 =!= 0, "share2_micro"), Seq("lang"), "full")
      .select($"lang",
        coalesce($"share1_micro", lit(0L)).as("share1_micro"),
        coalesce($"share2_micro", lit(0L)).as("share2_micro"))
      .localCheckpoint(true) // bounded: |langs| rows
    val tv = j.agg(expr("sum(abs(share1_micro - share2_micro)) div 2"))
      .collect().head.getLong(0)
    j.select($"lang", $"share1_micro", $"share2_micro",
        abs($"share1_micro" - $"share2_micro").as("drift_micro"),
        lit(tv).as("tv_distance_micro"),
        lit(tv > DriftGateMicro).as("drift_alarm"))
      .orderBy($"lang")
  }

  // ------------------------------------------------------------------
  // q9w: per-day HLL state + range serve (see the QueryDef for design)
  // ------------------------------------------------------------------
  private val DayNanos = 86400000000000L

  /** Build-or-reuse the per-day HLL register store over the event log.
    * Returns (state, rebuilt, stateDir). Torn-write rule shared with
    * q9c/q9e/q9t: key file last. */
  private[queries] def loadOrBuildDailyHll(s: SparkSession, dir: String)
      : (DataFrame, Boolean, String) = {
    import s.implicits._
    val src = s"$dir/events.parquet"
    val key = s"v1|$src|${Tables.sourceStamp(src)}" +
      s"|agg=daily-hll-user|lgk=$HllLgK"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val stateDir = Tables.persistentScratchDir(s"q9w_dailyhll_$tag")
    val skDir = java.nio.file.Paths.get(stateDir, "sketches")
    val keyFile = java.nio.file.Paths.get(stateDir, "_graft_index_key")
    val valid = java.nio.file.Files.exists(keyFile) &&
      java.nio.file.Files.readString(keyFile) == key &&
      java.nio.file.Files.exists(skDir.resolve("_SUCCESS"))
    if (!valid) {
      Tables.eventsRaw(s, dir)
        .select($"user_id", expr(s"ts div $DayNanos").as("day"))
        .groupBy($"day")
        .agg(hll_sketch_agg($"user_id", lit(HllLgK)).as("sk"))
        .write.mode("overwrite").parquet(skDir.toString)
      java.nio.file.Files.writeString(keyFile, key)
    }
    (s.read.parquet(skDir.toString), !valid, stateDir)
  }

  /** The q9w serve path alone — range estimates from stored registers,
    * zero event-log reads (the spec proves it from the executed plan's
    * file list). */
  def rangeEstimates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (state, _, _) = loadOrBuildDailyHll(s, dir)
    // range bounds from the state's own day axis (bounded: 1 row).
    // Empty state (no events ingested / everything filtered) yields
    // null min/max — return an empty frame of the serve's shape
    // instead of NPEing on getLong
    val b = state.agg(min($"day"), max($"day")).collect().head
    if (b.isNullAt(0))
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("range_id", "d_lo", "d_hi", "n_days_merged", "est_users")
    val (dmin, dmax) = (b.getLong(0), b.getLong(1))
    val ranges = Seq(
      (1L, dmin, dmax),
      (2L, dmin, dmin + (dmax - dmin) / 2),
      (3L, dmax - (dmax - dmin) / 3, dmax))
      .toDF("range_id", "d_lo", "d_hi")
    // the serve: union only the selected registers — |days| sketch rows
    // join against 3 range rows, then one register-wise merge per range
    state.join(broadcast(ranges), $"day".between($"d_lo", $"d_hi"))
      .groupBy($"range_id", $"d_lo", $"d_hi")
      .agg(count(lit(1)).as("n_days_merged"),
        hll_sketch_estimate(hll_union_agg($"sk",
          allowDifferentLgConfigK = false)).as("est_users"))
  }

  /** Streaming-maintenance form of q9w: fold ONE micro-batch of
    * events (ts long-nanos, user_id) into the per-day register store —
    * the foreachBatch production shape for the DAU dashboard: each
    * trigger sketches only itself and merges via hll_union, so state
    * stays days × 2^lgK bytes regardless of stream volume. Because the
    * union is a register-wise MAX, the fold is also IDEMPOTENT: a
    * redelivered batch maxes registers against themselves and changes
    * nothing — at-least-once delivery needs no dedup ledger here
    * (contrast q9e's additive counters, which do). Collected to the
    * driver before the overwrite (bounded: days × sketch bytes),
    * making the read-modify-write safe. */
  def dailyHllFoldBatch(s: SparkSession, stateDir: String,
      batch: DataFrame): Unit = {
    import s.implicits._
    val skDir = java.nio.file.Paths.get(stateDir, "sketches")
    val bs = batch
      .select($"user_id", expr(s"ts div $DayNanos").as("day"))
      .groupBy($"day")
      .agg(hll_sketch_agg($"user_id", lit(HllLgK)).as("sk_new"))
    val merged =
      if (java.nio.file.Files.exists(skDir.resolve("_SUCCESS")))
        s.read.parquet(skDir.toString)
          .join(bs, Seq("day"), "full")
          .select($"day",
            when($"sk".isNull, $"sk_new")
              .when($"sk_new".isNull, $"sk")
              .otherwise(hll_union($"sk", $"sk_new",
                allowDifferentLgConfigK = false)).as("sk"))
      else bs.select($"day", $"sk_new".as("sk"))
    val rows = merged.collect() // bounded: days × sketch bytes
    s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1),
        merged.schema)
      .write.mode("overwrite").parquet(skDir.toString)
  }

  def rangeCardinality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val est = rangeEstimates(s, dir)
    val ranges = est.select($"range_id", $"d_lo", $"d_hi")
    // contract-only arm: the exact distinct scan the sketches replace
    val exact = Tables.eventsRaw(s, dir)
      .select($"user_id", expr(s"ts div $DayNanos").as("day"))
      .join(broadcast(ranges), $"day".between($"d_lo", $"d_hi"))
      .groupBy($"range_id")
      .agg(countDistinct($"user_id").as("exact_users"))
    est.join(exact, Seq("range_id"))
      .select($"range_id", $"d_lo", $"d_hi", $"n_days_merged",
        $"exact_users",
        (abs($"est_users" - $"exact_users") <= $"exact_users" * 0.10)
          .as("within_10pct"))
      .orderBy($"range_id")
  }
}
