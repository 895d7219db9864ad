package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string twins of representative DataFrame queries (SURVEY.md §3.2:
  * both entry points funnel into the same Catalyst pipeline, so the engine
  * exposes each surface; SqlSurfaceSpec asserts the plans produce identical
  * results). `parquet.` table paths keep the catalog stateless.
  */
object SqlSurface {

  def lineitem(d: String) = s"parquet.`$d/lineitem.parquet`"
  def orders(d: String) = s"parquet.`$d/orders.parquet`"
  def customer(d: String) = s"parquet.`$d/customer.parquet`"

  /** TPC-H Q1 shape — SQL twin of `agg_groupby`. */
  def aggGroupBySql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 1e2 AS sum_qty,
         |       ${graft.Tables.moneySumCentsSql("l_extendedprice")} AS sum_base,
         |       ${graft.Tables.moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |       round(avg(l_discount), 6) AS avg_disc,
         |       count(*) AS n
         |FROM ${lineitem(d)}
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  /** SQL twin of `join_inner`. */
  def joinInnerSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_orderkey, c_name, c_mktsegment, round(o_totalprice, 2) AS total_price
         |FROM ${orders(d)} JOIN ${customer(d)} ON o_custkey = c_custkey
         |WHERE o_totalprice > 150000
         |ORDER BY o_orderkey LIMIT 200""".stripMargin)

  /** SQL twin of `topk_per_group` (window + QUALIFY-style filter). */
  def topkPerGroupSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |         CAST(row_number() OVER (PARTITION BY o_custkey
         |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
         |  FROM ${orders(d)})
         |WHERE rn <= 3
         |ORDER BY o_custkey, rn""".stripMargin)

  def part(d: String) = s"parquet.`$d/part.parquet`"
  def documents(d: String) = s"parquet.`$d/documents.parquet`"
  def nation(d: String) = s"parquet.`$d/nation.parquet`"
  def region(d: String) = s"parquet.`$d/region.parquet`"

  /** events with the µs event-time BIGINT derived timezone-independently —
    * the Spark-SQL face of `Tables.events` (the NTZ testdata schema).
    */
  private def eventsCte(d: String): String =
    s"""e AS (SELECT event_id, user_id, event_type, value, props,
       |            timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS ts_us
       |     FROM parquet.`$d/events.parquet`)""".stripMargin

  // ── Spark-dialect twins for keys whose DuckDB oracle cannot be shared
  //    verbatim (epoch extraction, IGNORE NULLS placement, explode vs
  //    unnest, array_join vs array_to_string): the engine's SQL surface
  //    still covers the operator — a SQL-first user writes THIS spelling. ──

  /** SQL twin of `window_lag_lead` (Spark µs spelling). */
  def windowLagLeadSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""WITH ${eventsCte(d)}
         |SELECT event_id, user_id, value,
         |       floor(lag(value, 1) OVER w * 1e2 + 0.5) / 1e2 AS prev_value,
         |       lead(event_type, 1) OVER w AS next_type
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |ORDER BY event_id""".stripMargin)

  /** SQL twin of `window_fill_forward` — Spark's postfix `IGNORE NULLS`
    * (DuckDB only accepts it inside the call parentheses).
    */
  def windowFillForwardSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""WITH ${eventsCte(d)},
         |v AS (SELECT event_id, user_id, ts_us,
         |             CASE WHEN event_type = 'click' THEN value END AS v FROM e)
         |SELECT event_id, user_id,
         |       floor(last_value(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e4 + 0.5) / 1e4 AS fill_v,
         |       floor(lag(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         |             * 1e4 + 0.5) / 1e4 AS prev_v
         |FROM v ORDER BY event_id""".stripMargin)

  /** SQL twin of `func_json` (get_json_object vs DuckDB's json_extract_string). */
  def funcJsonSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""WITH ${eventsCte(d)}
         |SELECT event_id, CAST(get_json_object(props, '$$.k') AS BIGINT) AS k
         |FROM e ORDER BY event_id LIMIT 500""".stripMargin)

  /** SQL twin of `join_asof` — the backward strict as-of as a window over
    * the banded join (same semantics the native AsOfJoinExec implements).
    */
  def joinAsofSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""WITH ${eventsCte(d)},
         |p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT event_id AS v_id, user_id AS v_user, ts_us AS v_ts FROM e WHERE event_type = 'view'),
         |j AS (SELECT p_id, v_id,
         |             row_number() OVER (PARTITION BY p_id ORDER BY v_ts DESC, v_id DESC) AS rn
         |      FROM p JOIN v ON user_id = v_user AND v_ts < p_ts)
         |SELECT p_id AS event_id, v_id AS prev_view FROM j WHERE rn = 1
         |ORDER BY event_id""".stripMargin)

  /** SQL twin of `agg_listagg` — Spark's array_join over a sorted collect
    * (DuckDB spells the ordered concatenation `string_agg(x ORDER BY ...)`).
    */
  def aggListaggSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT r_name,
         |       array_join(sort_array(collect_list(n_name)), ',') AS nations,
         |       count(*) AS n
         |FROM ${nation(d)} JOIN ${region(d)} ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin)

  /** SQL twin of `text_top_terms` — explode vs DuckDB's unnest. */
  def textTopTermsSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT token, count(*) AS n FROM (
         |  SELECT explode(split(regexp_replace(trim(lower(text)), '\\\\s+', ' '), ' ')) AS token
         |  FROM ${documents(d)})
         |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin)

  /** SQL twin of `text_tokencount` (size/split/regexp_extract_all spellings). */
  def textTokencountSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT doc_id,
         |       CASE WHEN trim(text) = '' THEN 0
         |            ELSE CAST(size(split(regexp_replace(trim(text), '\\\\s+', ' '), ' ')) AS BIGINT)
         |       END AS ws_tokens,
         |       CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\\\s]', 0)) AS BIGINT) AS bpe_tokens
         |FROM ${documents(d)} ORDER BY doc_id""".stripMargin)

  /** SQL twin of `dedup_jaccard` (array_distinct/array_intersect/size). */
  def dedupJaccardSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""WITH docs AS (
         |  SELECT doc_id, lang,
         |         array_distinct(split(regexp_replace(trim(lower(text)), '\\\\s+', ' '), ' ')) AS toks
         |  FROM ${documents(d)} WHERE doc_id < 500),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |         CAST(size(array_intersect(a.toks, b.toks)) AS DOUBLE) AS isize,
         |         CAST(size(a.toks) + size(b.toks) AS DOUBLE)
         |           - CAST(size(array_intersect(a.toks, b.toks)) AS DOUBLE) AS usize
         |  FROM docs a JOIN docs b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, floor(isize / usize * 1e4 + 0.5) / 1e4 AS jac
         |FROM pairs WHERE isize / usize >= 0.5
         |ORDER BY a_id, b_id""".stripMargin)

  /** SQL twin of `skyline_pareto` (round 7) — the window-form prefix-max
    * dominance filter expressed purely in SQL.
    */
  def skylineParetoSql(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT p_partkey, p_retailprice, p_size FROM (
         |  SELECT p_partkey, p_retailprice, p_size,
         |         max(p_size) OVER (ORDER BY p_retailprice ASC, p_size DESC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
         |         min(p_retailprice) OVER (PARTITION BY p_size ORDER BY p_retailprice ASC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m2
         |  FROM ${part(d)})
         |WHERE NOT (coalesce(m1 > p_size, false) OR coalesce(m2 < p_retailprice, false))
         |ORDER BY p_partkey""".stripMargin)
}
