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
}
