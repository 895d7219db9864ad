package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{moneySum, moneySumCents, moneySumCentsSql, moneySumSql, rd, rdSql, t}

/** Relational core over the TPC-H-ish testdata (SURVEY.md §2.1–§2.4,
  * §2.6–§2.7). Pure built-in operators — Catalyst handles pushdown, pruning,
  * join selection, partial aggregation; no custom rules needed (§4).
  *
  * Every query ends in a total ORDER BY over a unique key set and aliases
  * every computed column identically to its DuckDB oracle (§5.3).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ── §2.1 scans ────────────────────────────────────────────────────────
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem, so
    // the total order sorts on every column; remaining ties would be
    // identical rows (validated: none).
    "scan_parquet" -> ((s, d) => {
      t(s, d, "lineitem")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        .limit(100)
    }),

    // ── §2.2 filter/project ──────────────────────────────────────────────
    // Filter + projection reach the parquet scan (PushedFilters/ReadSchema).
    "filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          rd(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"))
        .orderBy("l_orderkey", "l_linenumber", "revenue")
    }),

    // ── §2.3 joins ───────────────────────────────────────────────────────
    "join_inner" -> ((s, d) => {
      t(s, d, "orders")
        .filter(col("o_totalprice") > 150000)
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(
          col("o_orderkey"), col("c_name"), col("c_mktsegment"),
          round(col("o_totalprice"), 2).as("total_price"))
        .orderBy("o_orderkey")
        .limit(200)
    }),

    // Explicit broadcast of the 5-row dim side → BroadcastHashJoinExec, no
    // shuffle of the probe side. The pattern that matters at 100 TB.
    "join_broadcast" -> ((s, d) => {
      t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("r_name"))
        .orderBy("n_nationkey")
    }),

    "join_left_outer" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    "join_full_outer" -> ((s, d) => {
      t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"), "full_outer")
        .select(col("s_suppkey"), col("s_name"), col("n_nationkey"), col("n_name"))
        .orderBy(asc_nulls_first("n_nationkey"), asc_nulls_first("s_suppkey"))
    }),

    "join_left_semi" -> ((s, d) => {
      t(s, d, "orders")
        .join(
          t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .orderBy("o_orderkey")
        .limit(200)
    }),

    "join_left_anti" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .orderBy("c_custkey")
    }),

    "join_cross" -> ((s, d) => {
      val r1 = t(s, d, "region").select(col("r_name").as("r1_name"))
      val r2 = t(s, d, "region").select(col("r_name").as("r2_name"))
      r1.crossJoin(r2).orderBy("r1_name", "r2_name")
    }),

    // Equi-key + range residual: Catalyst plans the equi part as the join key
    // (sort-merge / shuffled-hash) and evaluates the date band as a residual
    // predicate — no O(n²) blowup at scale.
    "join_interval" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(
          t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          moneySumCents(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // 4-table star join (TPC-H Q10 shape): the most common real analytics
    // shape — fact ⋈ fact-sized orders on the shuffle key, then
    // progressively smaller dims. At 100 TB lineitem⋈orders is a sort-merge
    // join on orderkey (both huge — left to Catalyst/AQE), customer stays an
    // AQE decision (broadcast at small SF, shuffle at scale), and nation
    // (25 rows at every SF) is explicitly broadcast. Filters on both fact
    // inputs are pushed to the scans BEFORE the first shuffle. Ordering is
    // on the ROUNDED revenue so the top-20 cut agrees with the oracle.
    "join_star" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(
          t(s, d, "orders").filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ── §2.4 aggregations ────────────────────────────────────────────────
    "agg_groupby" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
          moneySumCents(col("l_extendedprice")).as("sum_base"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_global" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07))
        .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),

    "agg_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")
    }),

    "agg_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "agg_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySumCents(col("o_totalprice")).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // SQL entry point on purpose — exercises the parser → same Catalyst
    // pipeline (SURVEY.md §3.2); `parquet.` path avoids temp-view state.
    "agg_grouping_sets" -> ((s, d) => {
      s.sql(
        s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM parquet.`$d/documents.parquet`
           |GROUP BY GROUPING SETS ((lang), (source), ())
           |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin)
    }),

    // HyperLogLog++ sketch — the scale path for distinct counts (no exact
    // distinct shuffle). Deterministic given identical input, but
    // algorithm-specific: intentionally oracle-less (SURVEY.md §2.4).
    "agg_approx_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")
    }),

    "agg_udaf_geomean" -> ((s, d) => {
      val gm = udaf(graft.functions.GeoMean)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(gm(col("l_extendedprice")), 2).as("geomean_price"))
        .orderBy("l_returnflag")
    }),

    // ── §2.6 sorts / top-k ───────────────────────────────────────────────
    // orderBy+limit collapses to TakeOrderedAndProject: per-partition heap
    // top-k + driver merge, never a full global sort.
    "sort_multi_key" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
    }),

    "topk_global" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(10)
    }),

    // ── §2.7 set ops ─────────────────────────────────────────────────────
    "set_union" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    }),

    "set_intersect" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    "set_except" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    // Multiset (bag) semantics — duplicates preserved/subtracted by count.
    // Output rows within a key are identical, so the ORDER BY stays total.
    "set_union_all" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .unionAll(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    "set_intersect_all" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    "set_except_all" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT * FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        |         l_extendedprice, l_discount, l_tax, l_returnflag,
        |         l_linestatus, l_shipdate
        |LIMIT 100""".stripMargin,
    "filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * (1.0 - l_discount) * 1e2 + 0.5) / 1e2 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment, round(o_totalprice, 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 150000
        |ORDER BY o_orderkey LIMIT 200""".stripMargin,
    "join_broadcast" ->
      """SELECT n_nationkey, n_name, n_regionkey, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, c_name, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT s_suppkey, s_name, n_nationkey, n_name
        |FROM supplier FULL OUTER JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_nationkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST""".stripMargin,
    "join_left_semi" ->
      """SELECT * FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |ORDER BY o_orderkey LIMIT 200""".stripMargin,
    "join_left_anti" ->
      """SELECT * FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
        |FROM region r1 CROSS JOIN region r2
        |ORDER BY r1_name, r2_name""".stripMargin,
    "join_interval" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       ${moneySumCentsSql("l_extendedprice")} AS sum_price
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "join_star" ->
      s"""SELECT c_custkey, c_name, n_name,
        |       ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
        |       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 1e2 AS sum_qty,
        |       ${moneySumCentsSql("l_extendedprice")} AS sum_base,
        |       ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_global" ->
      s"""SELECT ${moneySumSql("l_extendedprice * l_discount")} AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       ${moneySumCentsSql("o_totalprice")} AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin,
    "agg_udaf_geomean" ->
      """SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 2) AS geomean_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sort_multi_key" ->
      """SELECT * FROM orders
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,
    "topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10""".stripMargin,
    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_union_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION ALL SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_except_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin
  )
}
