package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{events, moneySumCents, moneySumCentsSql, rd, rdSql, t}

/** Round-3 analytic-SQL widening (SURVEY.md §2.14): statistical and bitwise
  * aggregates, deterministic mode/median, struct-ordering argmax, grouping
  * metadata, IGNORE NULLS windows (forward-fill), correlated LATERAL joins,
  * CDC latest-snapshot compaction, and the DataSketches HLL union surface.
  *
  * Parity notes:
  * - Spark `skewness`/`kurtosis` are population moments (g1, excess g2);
  *   DuckDB's are sample-corrected, so the oracle converts
  *   (g1 = G1·(n−2)/√(n(n−1)); kurtosis_pop == Spark kurtosis). Verified
  *   numerically this session.
  * - `mode` ties are unspecified in both engines → both sides compute the
  *   deterministic formulation (max count, smallest value wins).
  * - `max(struct(price, key))` ties on price break by key; the oracle's
  *   `arg_max(key, price + key·1e-9)` is the same total order (the epsilon
  *   is injective below the 0.01 price granularity — §2.13 agg_minmax_by).
  *
  * Scale: every aggregate here is a partial+final HashAggregate (map-side
  * combine, one shuffle on the group key). The HLL-union query is THE
  * 100 TB distinct-count pattern: per-partition sketches merged by a
  * fixed-size binary union instead of an exact distinct shuffle. CDC
  * latest-snapshot is one window per key — at scale, partition the log by
  * key range so the window never sees more than a partition.
  */
object Analytics2 {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Deterministic mode + interpolated median per group. Mode ties broken
    // by smallest value — both engines use the same window formulation
    // because builtin mode() tie order is unspecified in both.
    "agg_mode_median" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val counts = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      // single aggregate, no window shuffle: struct order = (count, −qty),
      // so the max is (highest count, smallest qty) — the deterministic mode
      val modes = counts
        .groupBy("l_returnflag")
        .agg(max(struct(col("cnt"), (-col("l_quantity")).as("negq"))).as("m"))
        .select(col("l_returnflag"), (-col("m.negq")).as("mode_qty"),
          col("m.cnt").cast("long").as("mode_cnt"))
      val med = li.groupBy("l_returnflag")
        .agg(round(median(col("l_quantity").cast("double")), 4).as("med_qty"))
      modes.join(med, "l_returnflag").orderBy("l_returnflag")
    }),

    // OLS regression aggregates: slope/intercept/r² of price on quantity.
    "agg_regr" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("icept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").cast("long").as("n"))
        .orderBy("l_returnflag")
    }),

    // Bitwise aggregates over the key space (bitmap-style rollups).
    "agg_bitwise" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          bit_and(col("o_orderkey")).cast("long").as("band"),
          bit_or(col("o_orderkey")).cast("long").as("bor"),
          bit_xor(col("o_orderkey")).cast("long").as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // Higher-moment shape statistics (population g1 / excess kurtosis).
    // NULL for n < 3 or zero variance on BOTH sides: DuckDB's sample
    // skewness is NULL there while Spark's population form returns
    // 0/NaN, so the defined domain is pinned explicitly.
    "agg_skew_kurt" -> ((s, d) => {
      val defined = count(col("l_discount")) >= 3 && var_samp(col("l_discount")) > 0
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          when(defined, round(skewness(col("l_discount")), 6)).as("skew"),
          when(defined, round(kurtosis(col("l_discount")), 6)).as("kurt"),
          count(col("l_discount")).as("n"))
        .orderBy("l_returnflag")
    }),

    // Distinct-collect surface: sorted distinct set rendered stably.
    "agg_collect_set" -> ((s, d) => {
      t(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(
          array_join(
            transform(array_sort(collect_set(col("c_nationkey"))),
              x => x.cast("string")), ",").as("nations"),
          countDistinct(col("c_nationkey")).cast("long").as("n_nations"))
        .orderBy("c_mktsegment")
    }),

    // GROUPING() / GROUPING_ID() metadata — how a consumer tells subtotal
    // rows from genuine-NULL group keys.
    "agg_grouping_id" -> ((s, d) => {
      s.sql(
        s"""SELECT lang, source,
           |       CAST(grouping(lang) AS BIGINT) AS g_lang,
           |       CAST(grouping(source) AS BIGINT) AS g_source,
           |       CAST(grouping_id(lang, source) AS BIGINT) AS gid,
           |       CAST(count(*) AS BIGINT) AS n
           |FROM parquet.`$d/documents.parquet`
           |GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
           |ORDER BY gid, lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin)
    }),

    // The single-aggregate argmax idiom: max(struct(order cols…)) — no
    // window, no second shuffle; the struct comparison is the total order.
    "agg_argmax_struct" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .select(col("o_orderpriority"), col("m.o_orderkey").as("best_order"),
          col("max_price"))
        .orderBy("o_orderpriority")
    }),

    // Forward-fill via IGNORE NULLS: carry the last click value forward and
    // expose the previous non-null (gap-tolerant sensor/event repair).
    "window_fill_forward" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val v = when(col("event_type") === "click", col("value"))
      events(s, d)
        .select(
          col("event_id"), col("user_id"),
          rd(last(v, ignoreNulls = true).over(wRun), 4).as("fill_v"),
          rd(lag(v, 1, null, ignoreNulls = true).over(w), 4).as("prev_v"))
        .orderBy("event_id")
    }),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    // customers per nation) — the SQL face of topk_per_group.
    "join_lateral_topk" -> ((s, d) => {
      s.sql(
        s"""SELECT n.n_name, c.c_custkey, round(c.c_acctbal, 2) AS acctbal
           |FROM parquet.`$d/nation.parquet` n
           |JOIN LATERAL (
           |  SELECT c_custkey, c_acctbal
           |  FROM parquet.`$d/customer.parquet`
           |  WHERE c_nationkey = n.n_nationkey
           |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
           |ORDER BY n.n_name, c.c_custkey""".stripMargin)
    }),

    // CDC MERGE/upsert: apply an (op, key, payload) change set to a base
    // snapshot — updates override, inserts append, deletes drop, untouched
    // keys keep their base row. One full-outer equi-join on the key; at
    // scale both sides bucket/partition by the key so the merge is
    // co-located, and the op column makes the apply idempotent (re-running
    // the same change set yields the same snapshot).
    "merge_upsert" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val changes = orders.filter(col("o_orderkey") % 10 <= 3)
        .select(
          col("o_orderkey").as("k"),
          when(col("o_orderkey") % 10 <= 2, "U").otherwise("D").as("op"),
          rd(col("o_totalprice") * 1.1, 2).as("new_price"))
        .unionByName(orders.filter(col("o_orderkey") % 10 === 4)
          .select(
            // synthesized insert keys live in the NEGATIVE key space —
            // base orderkeys are non-negative at every scale factor, so an
            // insert can never silently collide with (and "update") a real
            // base row the way a fixed positive offset would at sf ≥ 2
            (-col("o_orderkey") - 1L).as("k"),
            lit("I").as("op"),
            rd(col("o_totalprice") * 0.5, 2).as("new_price")))
      val base = orders.select(
        col("o_orderkey").as("bk"), col("o_custkey"),
        rd(col("o_totalprice"), 2).as("price"))
      base.join(changes, col("bk") === col("k"), "full_outer")
        .select(
          coalesce(col("bk"), col("k")).as("o_orderkey"),
          coalesce(col("o_custkey"), lit(-1L)).as("o_custkey"),
          when(col("op").isin("U", "I"), col("new_price"))
            .otherwise(col("price")).as("price"),
          coalesce(col("op"), lit("K")).as("op"))
        .filter(col("op") =!= "D")
        .orderBy("o_orderkey")
    }),

    // CDC latest-snapshot compaction: one row per key = the change-log
    // entry with the greatest (ts, event_id). max_by over a struct ordering
    // key instead of a sort-window: partial aggregation compacts each map
    // partition to ≤1 row per key BEFORE the shuffle — at 100 TB the
    // shuffle carries keys, not the log.
    // Bitmap-based EXACT distinct count (§2.17): keys bucket into 32k-bit
    // bitmaps (bitmap_bucket_number / bitmap_bit_position), partial
    // aggregation ORs bitmaps map-side, and the final count sums popcounts.
    // The shuffle carries compressed bitmaps instead of raw key values —
    // the exact-distinct path that survives 100 TB where count(distinct)
    // shuffles every key (and approx_count_distinct is inexact). Oracle is
    // the plain COUNT(DISTINCT): same number, two formulations.
    "agg_bitmap_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_partkey"))
        .groupBy(col("l_returnflag"), expr("bitmap_bucket_number(l_partkey)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_distinct"))
        .orderBy("l_returnflag")
    }),

    // Snapshot diff (§2.17, the CDC/reconciliation op): two per-user latest-
    // state snapshots (deterministic event_id slices of the stream) full-
    // outer-joined on the entity key and classified added / removed /
    // changed; unchanged rows drop. Both snapshots are max_by hash
    // aggregates — two slim entity-keyed shuffles plus one join, no sort.
    "join_snapshot_diff" -> ((s, d) => {
      def snap(cond: org.apache.spark.sql.Column, alias: String) =
        events(s, d).filter(cond)
          .groupBy("user_id")
          .agg(max_by(col("event_type"), struct(col("ts_us"), col("event_id"))).as(alias))
      val a = snap(col("event_id") % 2 === 0, "old_state")
      val b = snap(col("event_id") % 3 > 0, "new_state")
      a.join(b, Seq("user_id"), "full_outer")
        .withColumn("status",
          when(col("old_state").isNull, "added")
            .when(col("new_state").isNull, "removed")
            .when(col("old_state") =!= col("new_state"), "changed")
            .otherwise("unchanged"))
        .filter(col("status") =!= "unchanged")
        .select(col("user_id"), col("old_state"), col("new_state"), col("status"))
        .orderBy("user_id")
    }),

    "cdc_latest" -> ((s, d) => {
      val payload = struct(col("event_id"), col("event_type"), col("value"),
        col("ts_us"))
      events(s, d)
        .groupBy("user_id")
        .agg(max_by(payload, struct(col("ts_us"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("last_event"),
          col("m.event_type").as("last_type"), rd(col("m.value"), 4).as("last_value"),
          col("m.ts_us").as("last_ts_us"))
        .orderBy("user_id")
    }),

    // Time-series resample: densify each user's activity to an hourly grid
    // (sequence-exploded spine, no recursion), LEFT JOIN the per-hour
    // aggregate, forward-fill gaps with the last observed value. The grid is
    // the TRAILING 720 hours (30 days) of the corpus: an unbounded spine is
    // O(users × total span) OUTPUT — quadratic when both grow with the
    // corpus, and the sf10 rung measured exactly that (1.08B spine rows,
    // 936 s, vs 97M/1.4 s at sf3 — the generator widens the span with
    // scale). Densify-to-all-history is unbounded by construction at
    // 100 TB; the declared operator resamples the trailing window —
    // O(users × 720), linear. The forward-fill SEEDS from each user's last
    // observation at-or-before the window start (one bounded seed row per
    // user, ADVICE r12), so pre-cutoff history is summarized, not dropped.
    // Corpora spanning ≤ 720 h (sf0.001…sf1) are bit-identical to the
    // unbounded form.
    "resample_hourly" -> ((s, d) => {
      val UsPerHour = 3600000000L
      // integer `div`, not `/`: double division of µs-scale longs can land
      // a hair below the true quotient and floor to the previous hour
      val ev = events(s, d)
        .select(col("user_id"), expr(s"ts_us div $UsPerHour").as("hr"),
          col("value"))
      resampleHourly(ev).orderBy("user_id", "hr")
    }),

    // DataSketches HLL: per-group sketches merged by hll_union_agg — the
    // re-aggregatable distinct-count pattern (sketches, not raw keys, move
    // through the shuffle). Estimates are algorithm-specific → oracle-less;
    // exact twin is agg_distinct.
    "agg_hll_union" -> ((s, d) => {
      val sk = t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      val per = sk.select(col("l_returnflag").as("flag"),
        expr("hll_sketch_estimate(sk)").cast("long").as("est_partkeys"))
      val all = sk
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("est_partkeys"))
        .select(lit("ALL").as("flag"), col("est_partkeys"))
      per.unionByName(all).orderBy("flag")
    }),

    // Sketched heavy hitters (approx_top_k) — bounded-memory top-k without
    // the exact global sort. Oracle-less; exact twin is text_top_terms.
    "agg_approx_topk" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(graft.Tables.spaceSplit(graft.Tables.normText(col("text")))).as("token"))
        // maxItemsTracked 1000 (default 10000): the per-partition summaries
        // that move through the merge are 10× smaller, and 100× the k is
        // far beyond the accuracy the top-10 needs on a zipfy vocabulary
        .agg(expr("approx_top_k(token, 10, 1000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.*"))
        .toDF("token", "est_count")
        .orderBy(col("est_count").desc, col("token"))
    })
  )

  /** Trailing-window hourly resample over an (user_id, hr, value) frame —
    * the shared core of `resample_hourly` (and its spec fixtures).
    *
    * `trailingHours` is the declared window parameter (default 720 h =
    * 30 days). The spine is clamped to `[max(hr) - trailingHours + 1,
    * max(hr)]` per user, so output is O(users × trailingHours) — linear in
    * users, constant in corpus span. The forward-fill is seeded with each
    * user's most recent observation STRICTLY BEFORE the cutoff (one
    * `max_by` row per user, injected at hr = cut - 1 and filtered back out
    * after the window), so a user's in-window hours before their first
    * in-window observation fill from the last known value instead of NULL.
    * Every broadcast here is a one-row global aggregate (the cutoff) — the
    * deliberate 1×N pattern PlanSpec's structural BNLJ lint admits.
    */
  def resampleHourly(ev: DataFrame, trailingHours: Int = 720): DataFrame = {
    val agg = ev.groupBy("user_id", "hr")
      .agg(count(lit(1)).as("n"), moneySumCents(col("value")).as("sum_v"))
    // one-row global cutoff, broadcast into the per-user span clamp
    val cut = ev.agg((max(col("hr")) - lit(trailingHours - 1)).as("cut"))
    val spine = ev.groupBy("user_id")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .crossJoin(broadcast(cut))
      .select(col("user_id"), greatest(col("h0"), col("cut")).as("h0c"),
        col("h1"))
      // a user with no activity inside the window drops out (sequence
      // with h0 > h1 would count DOWN in Spark; DuckDB range() is empty)
      .where(col("h0c") <= col("h1"))
      .select(col("user_id"), explode(sequence(col("h0c"), col("h1"))).as("hr"))
    // bounded fill seed: ≤1 row per user, the last pre-cutoff observation
    val seed = agg.crossJoin(broadcast(cut))
      .where(col("hr") < col("cut"))
      .groupBy("user_id")
      .agg(max_by(col("sum_v"), col("hr")).as("sum_v"),
        (first(col("cut")) - 1).as("hr"))
      .select(col("user_id"), col("hr"), lit(null).cast("long").as("n"),
        col("sum_v"), lit(true).as("is_seed"))
    val w = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq("user_id", "hr"), "left_outer")
      .select(col("user_id"), col("hr"), col("n"), col("sum_v"),
        lit(false).as("is_seed"))
      .unionByName(seed)
      .select(col("user_id"), col("hr"), col("n"), col("is_seed"),
        last(col("sum_v"), ignoreNulls = true).over(w).as("fill_v"))
      .where(!col("is_seed"))
      .select(col("user_id"), col("hr"), coalesce(col("n"), lit(0L)).as("n"),
        col("fill_v"))
  }

  val oracle: Map[String, String] = Map(
    "merge_upsert" ->
      s"""WITH chg AS (
         |  SELECT o_orderkey AS k,
         |         CASE WHEN o_orderkey % 10 <= 2 THEN 'U' ELSE 'D' END AS op,
         |         ${rdSql("o_totalprice * 1.1", 2)} AS new_price
         |  FROM orders WHERE o_orderkey % 10 <= 3
         |  UNION ALL
         |  SELECT -o_orderkey - 1 AS k, 'I' AS op,
         |         ${rdSql("o_totalprice * 0.5", 2)} AS new_price
         |  FROM orders WHERE o_orderkey % 10 = 4),
         |base AS (SELECT o_orderkey AS bk, o_custkey,
         |                ${rdSql("o_totalprice", 2)} AS price FROM orders),
         |m AS (SELECT coalesce(b.bk, c.k) AS o_orderkey,
         |             coalesce(b.o_custkey, -1) AS o_custkey,
         |             CASE WHEN c.op IN ('U', 'I') THEN c.new_price
         |                  ELSE b.price END AS price,
         |             coalesce(c.op, 'K') AS op
         |      FROM base b FULL OUTER JOIN chg c ON b.bk = c.k)
         |SELECT o_orderkey, o_custkey, price, op
         |FROM m WHERE op <> 'D'
         |ORDER BY o_orderkey""".stripMargin,
    "agg_mode_median" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT *, max(cnt) OVER (PARTITION BY l_returnflag) AS max_cnt FROM c),
        |modes AS (SELECT l_returnflag, min(l_quantity) AS mode_qty,
        |                 CAST(max(max_cnt) AS BIGINT) AS mode_cnt
        |          FROM w WHERE cnt = max_cnt GROUP BY 1),
        |med AS (SELECT l_returnflag,
        |               round(median(CAST(l_quantity AS DOUBLE)), 4) AS med_qty
        |        FROM lineitem GROUP BY 1)
        |SELECT modes.l_returnflag, mode_qty, mode_cnt, med_qty
        |FROM modes JOIN med USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "agg_regr" ->
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_bitwise" ->
      """SELECT o_orderpriority,
        |       CAST(bit_and(o_orderkey) AS BIGINT) AS band,
        |       CAST(bit_or(o_orderkey) AS BIGINT) AS bor,
        |       CAST(bit_xor(o_orderkey) AS BIGINT) AS bxor,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // DuckDB skewness/kurtosis are sample statistics; convert to Spark's
    // population definitions: g1 = G1·(n−2)/√(n(n−1)), kurtosis_pop = g2.
    "agg_skew_kurt" ->
      """SELECT l_returnflag,
        |       CASE WHEN count(l_discount) >= 3 AND var_samp(l_discount) > 0
        |            THEN round(skewness(l_discount) * (count(l_discount) - 2)
        |                 / sqrt(count(l_discount) * (count(l_discount) - 1.0)), 6)
        |       END AS skew,
        |       CASE WHEN count(l_discount) >= 3 AND var_samp(l_discount) > 0
        |            THEN round(kurtosis_pop(l_discount), 6)
        |       END AS kurt,
        |       CAST(count(l_discount) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_collect_set" ->
      """SELECT c_mktsegment,
        |       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
        |       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_grouping_id" ->
      """SELECT lang, source,
        |       CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        |       CAST(GROUPING(source) AS BIGINT) AS g_source,
        |       CAST(GROUPING_ID(lang, source) AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
        |ORDER BY gid, lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin,
    "agg_argmax_struct" ->
      """SELECT o_orderpriority,
        |       max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS best_order,
        |       round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "window_fill_forward" ->
      """SELECT event_id, user_id,
        |       floor(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000.0 + 0.5) / 10000.0 AS fill_v,
        |       floor(lag(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |             * 10000.0 + 0.5) / 10000.0 AS prev_v
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |             CASE WHEN event_type = 'click' THEN value END AS v
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "join_lateral_topk" ->
      """SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal FROM (
        |  SELECT n_name, c_custkey, c_acctbal,
        |         row_number() OVER (PARTITION BY n_nationkey
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey) t
        |WHERE rn <= 2
        |ORDER BY n_name, c_custkey""".stripMargin,
    "resample_hourly" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr, value FROM events),
        |a AS (SELECT user_id, hr, CAST(count(*) AS BIGINT) AS n,
        |             ${moneySumCentsSql("value")} AS sum_v
        |      FROM e GROUP BY 1, 2),
        |c AS (SELECT max(hr) - 719 AS cut FROM e),
        |b AS (SELECT user_id, greatest(min(hr), (SELECT cut FROM c)) AS h0,
        |             max(hr) AS h1
        |      FROM e GROUP BY user_id),
        |s AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM b
        |      WHERE h0 <= h1),
        |seed AS (SELECT user_id, (SELECT cut FROM c) - 1 AS hr,
        |                CAST(NULL AS BIGINT) AS n,
        |                arg_max(sum_v, hr) AS sum_v, TRUE AS is_seed
        |         FROM a WHERE hr < (SELECT cut FROM c) GROUP BY user_id),
        |u AS (SELECT s.user_id, s.hr, a.n, a.sum_v, FALSE AS is_seed
        |      FROM s LEFT JOIN a ON s.user_id = a.user_id AND s.hr = a.hr
        |      UNION ALL SELECT * FROM seed)
        |SELECT user_id, hr, coalesce(n, 0) AS n, fill_v FROM (
        |  SELECT user_id, hr, n, is_seed,
        |         last_value(sum_v IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY hr
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_v
        |  FROM u) t
        |WHERE NOT is_seed
        |ORDER BY user_id, hr""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "join_snapshot_diff" ->
      """WITH a AS (SELECT user_id, event_type AS old_state FROM events WHERE event_id % 2 = 0
        |           QUALIFY row_number() OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts) DESC, event_id DESC) = 1),
        |b AS (SELECT user_id, event_type AS new_state FROM events WHERE event_id % 3 > 0
        |      QUALIFY row_number() OVER (PARTITION BY user_id
        |          ORDER BY epoch_us(ts) DESC, event_id DESC) = 1)
        |SELECT coalesce(a.user_id, b.user_id) AS user_id, a.old_state, b.new_state,
        |       CASE WHEN a.user_id IS NULL THEN 'added'
        |            WHEN b.user_id IS NULL THEN 'removed'
        |            WHEN a.old_state <> b.new_state THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM a FULL JOIN b ON a.user_id = b.user_id
        |WHERE a.user_id IS NULL OR b.user_id IS NULL OR a.old_state <> b.new_state
        |ORDER BY user_id""".stripMargin,
    "cdc_latest" ->
      """SELECT user_id, event_id AS last_event, event_type AS last_type,
        |       floor(value * 10000.0 + 0.5) / 10000.0 AS last_value,
        |       ts_us AS last_ts_us
        |FROM (SELECT *, epoch_us(ts) AS ts_us,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin
  )
}
