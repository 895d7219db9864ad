package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** Custom Catalyst expression: ppdb_split must agree with the regex split
  * in both interpreted and whole-stage-codegen execution.
  */
class PpdbSplitLineSpec extends SparkSpec {

  private def check(): Unit = {
    import spark.implicits._
    val lines = Seq(
      "[JJ] ||| happy ||| glad ||| PPDB2.0Score=5.31 ||| 0-0 ||| Equivalence",
      "a ||| b", // fewer fields
      "no delimiter at all",
      "x ||| ||| y", // empty field
      "trailing ||| ")
    val df = lines.toDF("value")
    val native = df.select(expr("ppdb_split(value)").as("p")).as[Seq[String]].collect()
    val regex = df.select(split(col("value"), " \\|\\|\\| ").as("p")).as[Seq[String]].collect()
    assert(native.toSeq === regex.toSeq)
  }

  test("ppdb_split matches regex split (codegen on)") {
    GraftExtensions.register(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    check()
  }

  test("ppdb_split matches regex split (interpreted)") {
    GraftExtensions.register(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null input yields null, not a crash") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("a ||| b")).toDF("value")
      .selectExpr("ppdb_split(value) AS p").collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[String](0) === Seq("a", "b"))
  }
}
