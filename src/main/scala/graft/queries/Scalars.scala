package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{rd, t}

/** Scalar-function and UDF/UDTF surface (SURVEY.md §2.8–§2.9). Everything
  * except `udf_wordcount` is built-in Catalyst expressions (codegen'd,
  * pushdown-friendly); the UDF exists to demonstrate the extension point and
  * its Scaladoc says why natives are preferred.
  */
object Scalars {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "func_string" -> ((s, d) => {
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_type")).as("type_u"),
          substring(col("p_name"), 1, 8).as("name8"),
          length(col("p_name")).cast("long").as("name_len"),
          expr("replace(p_brand, '#', '_')").as("brand_r"),
          col("p_name").like("%a%").as("has_a"))
        .orderBy("p_partkey")
    }),

    "func_date" -> ((s, d) => {
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_trunc("month", col("o_orderdate")).as("mon"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("d"))
        .orderBy("o_orderkey")
        .limit(500)
    }),

    "func_math" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          rd(col("l_extendedprice"), 1).as("price_r"),
          rd(abs(col("l_discount")), 6).as("abs_disc"),
          floor(col("l_extendedprice")).cast("long").as("floor_p"),
          ceil(col("l_extendedprice")).cast("long").as("ceil_p"),
          rd(pow(col("l_discount"), 2), 6).as("pow_d"),
          rd(log(col("l_extendedprice")), 6).as("ln_p"))
        // lineitem keys are non-unique; tiebreak on every output column
        .orderBy("l_orderkey", "l_linenumber", "price_r", "abs_disc",
          "floor_p", "ceil_p", "pow_d", "ln_p")
        .limit(500)
    }),

    "func_array" -> ((s, d) => {
      val toks = split(col("text"), " ")
      t(s, d, "documents")
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          array_contains(toks, "spark").as("has_spark"),
          element_at(toks, 1).as("first_tok"))
        .orderBy("doc_id")
    }),

    // Scala UDF — the extension point the reference's users would reach for.
    // Prefer Catalyst natives in hot paths: a UDF is an opaque black box to
    // the optimizer (no pushdown through it, breaks whole-stage codegen).
    "udf_wordcount" -> ((s, d) => {
      val normWordCount = udf((text: String) => {
        if (text == null) 0L
        else {
          val trimmed = text.trim.toLowerCase
          if (trimmed.isEmpty) 0L else trimmed.split("\\s+").length.toLong
        }
      })
      t(s, d, "documents")
        .select(col("doc_id"), normWordCount(col("text")).as("wc"))
        .orderBy("doc_id")
    }),

    // Built-in Generator (UDTF surface): posexplode. A custom table function
    // would extend o.a.s.sql.catalyst.expressions.Generator the same way.
    "udtf_posexplode" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    })
  )

  val oracle: Map[String, String] = Map(
    "func_string" ->
      """SELECT p_partkey, upper(p_type) AS type_u, substring(p_name, 1, 8) AS name8,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       replace(p_brand, '#', '_') AS brand_r,
        |       p_name LIKE '%a%' AS has_a
        |FROM part ORDER BY p_partkey""".stripMargin,
    "func_date" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       date_trunc('month', o_orderdate) AS mon,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,
    "func_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * 1e1 + 0.5) / 1e1 AS price_r,
        |       floor(abs(l_discount) * 1e6 + 0.5) / 1e6 AS abs_disc,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |       floor(power(l_discount, 2) * 1e6 + 0.5) / 1e6 AS pow_d,
        |       floor(ln(l_extendedprice) * 1e6 + 0.5) / 1e6 AS ln_p
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, price_r, abs_disc, floor_p, ceil_p, pow_d, ln_p
        |LIMIT 500""".stripMargin,
    "func_array" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |       string_split(text, ' ')[1] AS first_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "udf_wordcount" ->
      """SELECT doc_id,
        |       CASE WHEN trim(text) = '' THEN 0
        |            ELSE CAST(len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT)
        |       END AS wc
        |FROM documents ORDER BY doc_id""".stripMargin,
    "udtf_posexplode" ->
      """SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS pos, unnest(toks) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id, pos""".stripMargin
  )
}
