package graft

import graft.queries.SqlSurface

/** The SQL and DataFrame surfaces must produce identical results — they
  * compile through the same Catalyst pipeline.
  */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)

  private def same(sqlDf: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, d)
    assert(sqlDf.columns.toSeq === df.columns.toSeq, s"$name column mismatch")
    assert(sqlDf.collect().toSeq === df.collect().toSeq, s"$name row mismatch")
  }

  test("agg_groupby: SQL twin equals DataFrame result") {
    same(SqlSurface.aggGroupBySql(spark, d), "agg_groupby")
  }

  test("join_inner: SQL twin equals DataFrame result") {
    same(SqlSurface.joinInnerSql(spark, d), "join_inner")
  }

  test("topk_per_group: SQL twin equals DataFrame result") {
    same(SqlSurface.topkPerGroupSql(spark, d), "topk_per_group")
  }

  test("skyline_pareto: SQL twin equals DataFrame result") {
    same(SqlSurface.skylineParetoSql(spark, d), "skyline_pareto")
  }

  // ---- SURVEY §3.2's dual-surface promise, proven at breadth (round 9):
  // the DuckDB oracle strings for the relational core are deliberately
  // dialect-portable ANSI, so the SAME SQL text that gates correctness in
  // DuckDB also runs through spark.sql over temp views — one string, three
  // executions (DataFrame API, Spark SQL, DuckDB), one result. ----

  /** Declared keys whose ORACLE SQL is valid Spark SQL verbatim — widened
    * from the round-9 relational core (25) to every key that passes a full
    * probe of the oracle map (round 10): the window family, correlated /
    * IN / scalar subqueries, recursive CTE, pivot/unpivot, the bloom and
    * salted joins, the z-order interleave and the statistical aggregates
    * all run on both engines from ONE string.
    */
  private val portable = Seq(
    "scan_parquet", "filter_project",
    "join_inner", "join_broadcast", "join_left_outer", "join_full_outer",
    "join_left_semi", "join_left_anti", "join_cross", "join_interval",
    "join_star", "join_salted", "join_bloom", "join_bloom_native",
    "join_lateral_topk",
    "agg_groupby", "agg_global", "agg_distinct", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_grouping_id", "agg_filtered", "agg_stats",
    "agg_regr", "agg_bitwise", "agg_bitmap_distinct", "agg_histogram",
    "agg_mode_median", "agg_udaf_geomean", "agg_weighted_median",
    "sort_multi_key", "topk_global",
    "set_union", "set_intersect", "set_except",
    "set_union_all", "set_intersect_all", "set_except_all",
    "window_rank", "window_running_sum", "window_cume_dist",
    "window_range_frame",
    "subquery_scalar", "subquery_in", "subquery_not_in",
    "subquery_correlated",
    "cte_recursive", "pivot_status", "unpivot_metrics",
    "sample_hash", "skyline_pareto", "zorder_cluster", "func_string")

  test("54 declared queries run row-identical through their oracle SQL on spark.sql") {
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
      "part", "documents", "embeddings")
      .foreach(n => graft.Tables.t(spark, d, n).createOrReplaceTempView(n))
    portable.foreach { k =>
      val sqlDf = spark.sql(SparkEntry.oracleSql(k))
      val df = SparkEntry.queries(k)(spark, d)
      assert(sqlDf.columns.toSeq === df.columns.toSeq, s"$k column mismatch")
      assert(sqlDf.collect().toSeq === df.collect().toSeq, s"$k row mismatch")
    }
  }
}
