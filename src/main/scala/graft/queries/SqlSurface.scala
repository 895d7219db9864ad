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
         |       round(sum(l_quantity), 2) AS sum_qty,
         |       round(sum(l_extendedprice), 2) AS sum_base,
         |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
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
