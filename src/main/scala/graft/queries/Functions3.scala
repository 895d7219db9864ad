package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{normText, normTextSql, t}

/** Round-3 scalar-function widening (SURVEY.md §2.14): regexp suite,
  * cryptographic hashes, extended string/date/array functions, and URL
  * parsing. All per-row, codegen'd built-ins — embarrassingly parallel, no
  * shuffle before the final presentation sort; at 100 TB these run at scan
  * speed inside WholeStageCodegen.
  *
  * Parity notes:
  * - Regex patterns stay inside the RE2 ∩ java.util.regex common subset
  *   (char classes, groups, anchors — no backrefs/lookarounds).
  * - Spark `regexp_replace` replaces all matches by default; DuckDB needs
  *   the explicit 'g' flag.
  * - DuckDB `dayofweek` is 0-based (Sun=0), Spark 1-based (Sun=1) → +1.
  * - DuckDB has no initcap/sha1; surface sticks to md5/sha256.
  * - `array_position`: both engines return 0 when missing (validated).
  */
object Functions3 {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "func_regexp" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        expr("regexp_count(p_name, '[aeiou]+')").cast("long").as("n_vowel_runs"),
        col("p_name").rlike("ge").as("has_ge"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), ",").as("words"))
        .orderBy("p_partkey").limit(500)
    }),

    // Content-addressable identity: md5 + sha256 over normalized text (the
    // exact-dedup / cache-key hash surface).
    "func_hash" -> ((s, d) => {
      val n = normText(col("text"))
      t(s, d, "documents").select(
        col("doc_id"),
        md5(n).as("md5_hex"),
        sha2(n, 256).as("sha256_hex"),
        substring(sha2(n, 256), 1, 8).as("sha_prefix"))
        .orderBy("doc_id")
    }),

    "func_string2" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        rpad(col("p_brand"), 10, ".").as("brand_padded"),
        translate(col("p_type"), "aeo", "430").as("leeted"),
        reverse(substring(col("p_name"), 1, 6)).as("rev6"),
        format_string("%05d:%s", col("p_partkey"), col("p_type")).as("tagged"))
        .orderBy("p_partkey").limit(500)
    }),

    "func_date2" -> ((s, d) => {
      val od = col("o_orderdate").cast("date")
      t(s, d, "orders").select(
        col("o_orderkey"),
        last_day(od).cast("timestamp").as("eom"),
        make_date(year(od), month(od), lit(1)).cast("timestamp").as("som"),
        quarter(od).cast("long").as("q"),
        dayofweek(od).cast("long").as("dow"),
        weekofyear(od).cast("long").as("woy"),
        add_months(od, 3).cast("timestamp").as("plus3m"))
        .orderBy("o_orderkey").limit(500)
    }),

    "func_array2" -> ((s, d) => {
      val tk = split(normText(col("text")), " ")
      t(s, d, "documents").select(
        col("doc_id"),
        array_position(tk, "spark").cast("long").as("pos_spark"),
        size(filter(tk, x => x =!= "the")).cast("long").as("n_wo_the"),
        size(array_distinct(tk)).cast("long").as("n_uniq"),
        array_join(slice(array_sort(array_distinct(tk)), 1, 5), " ").as("first5"))
        .orderBy("doc_id")
    }),

    // URL parse/extract — synthesized from columns so both engines see the
    // same strings; the oracle re-derives host/path/param via regex.
    "func_url" -> ((s, d) => {
      val url = concat(lit("https://"), col("source"), lit(".example.com/"),
        col("lang"), lit("/"), col("doc_id").cast("string"),
        lit("?q="), col("lang"))
      t(s, d, "documents").select(
        col("doc_id"),
        url.as("url"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY"), lit("q")).as("qparam"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "func_regexp" ->
      """SELECT p_partkey,
        |       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |       CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
        |       regexp_matches(p_name, 'ge') AS has_ge,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |       array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,
    "func_hash" ->
      s"""SELECT doc_id,
         |       md5(${normTextSql("text")}) AS md5_hex,
         |       sha256(${normTextSql("text")}) AS sha256_hex,
         |       substr(sha256(${normTextSql("text")}), 1, 8) AS sha_prefix
         |FROM documents ORDER BY doc_id""".stripMargin,
    "func_string2" ->
      """SELECT p_partkey,
        |       split_part(p_name, ' ', 2) AS second_word,
        |       CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
        |       lpad(CAST(p_partkey AS STRING), 8, '0') AS key_padded,
        |       rpad(p_brand, 10, '.') AS brand_padded,
        |       translate(p_type, 'aeo', '430') AS leeted,
        |       reverse(substr(p_name, 1, 6)) AS rev6,
        |       printf('%05d:%s', p_partkey, p_type) AS tagged
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,
    "func_date2" ->
      """SELECT o_orderkey,
        |       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
        |       CAST(make_date(year(o_orderdate), month(o_orderdate), 1) AS TIMESTAMP) AS som,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,
    "func_array2" ->
      s"""WITH d AS (SELECT doc_id,
         |                  string_split(${normTextSql("text")}, ' ') AS tk
         |           FROM documents)
         |SELECT doc_id,
         |       CAST(list_position(tk, 'spark') AS BIGINT) AS pos_spark,
         |       CAST(len(list_filter(tk, x -> x != 'the')) AS BIGINT) AS n_wo_the,
         |       CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
         |       array_to_string(list_sort(list_distinct(tk))[1:5], ' ') AS first5
         |FROM d ORDER BY doc_id""".stripMargin,
    "func_url" ->
      """WITH u AS (SELECT doc_id,
        |                  concat('https://', source, '.example.com/', lang, '/',
        |                         CAST(doc_id AS STRING), '?q=', lang) AS url
        |           FROM documents)
        |SELECT doc_id, url,
        |       regexp_extract(url, '^https://([^/]+)', 1) AS host,
        |       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]q=([^&]*)', 1) AS qparam
        |FROM u ORDER BY doc_id""".stripMargin
  )
}
