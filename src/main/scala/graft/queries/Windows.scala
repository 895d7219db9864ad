package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.{events, rd, t}

/** Window-function surface (SURVEY.md §2.5). All windows partition before
  * ordering — one hash exchange on the partition key, per-partition sort,
  * no global sort; the shape that scales.
  */
object Windows {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "window_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(
          col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          row_number().over(w).cast("long").as("rn"))
        .orderBy("c_nationkey", "rn")
    }),

    "window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          (sum(round(col("o_totalprice") * 100).cast("long")).over(w) / 100.0).as("run_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // Event-time windows order by ts_us (µs) so Spark and the µs-truncating
    // DuckDB oracle sort identically (Tables.events scaladoc).
    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      events(s, d)
        .select(
          col("event_id"), col("user_id"), col("value"),
          rd(lag(col("value"), 1).over(w), 2).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("event_id")
    }),

    "window_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(-2, 0)
      events(s, d)
        .select(
          col("event_id"), col("user_id"),
          rd(avg(col("value")).over(w), 4).as("mavg"))
        .orderBy("event_id")
    }),

    // Window top-k: rank inside the partition then filter — the distributed
    // top-k-per-group idiom (no per-group collect).
    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    })
  )

  val oracle: Map[String, String] = Map(
    "window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |       CAST(rank() OVER w AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |       CAST(row_number() OVER w AS BIGINT) AS rn
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, rn""".stripMargin,
    "window_running_sum" ->
      """SELECT o_custkey, o_orderdate, o_orderkey,
        |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1e2 AS run_total
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "window_lag_lead" ->
      """SELECT event_id, user_id, value,
        |       floor(lag(value, 1) OVER w * 100.0 + 0.5) / 100.0 AS prev_value,
        |       lead(event_type, 1) OVER w AS next_type
        |FROM (SELECT *, epoch_us(ts) AS ts_us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY event_id""".stripMargin,
    "window_moving_avg" ->
      """SELECT event_id, user_id,
        |       floor(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000.0 + 0.5) / 10000.0 AS mavg
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "topk_per_group" ->
      // subquery-filter form instead of QUALIFY: same plan in DuckDB, and
      // the string is then verbatim-valid Spark SQL too (SqlSurfaceSpec)
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER w AS BIGINT) AS rn
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin
  )
}
