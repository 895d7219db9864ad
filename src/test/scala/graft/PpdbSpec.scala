package graft

import org.apache.spark.sql.functions._

import graft.ppdb.Ppdb

/** PPDB parser unit tests against the committed fixture
  * (FIXTURES.md §2 spot-checks).
  */
class PpdbSpec extends SparkSpec {

  test("parse reads 12 rules with full schema") {
    val df = Ppdb.parse(spark)
    assert(df.count() === 12)
    assert(df.columns.toSeq === Seq(
      "lhs", "phrase", "paraphrase", "features_raw", "alignment", "entailment", "ppdb2score"))
    assert(df.filter(col("ppdb2score").isNull).count() === 0)
  }

  test("lookup('happy') ranks glad > content > cheerful") {
    val rows = Ppdb.parse(spark)
      .filter(col("phrase") === "happy")
      .orderBy(col("ppdb2score").desc)
      .select("paraphrase", "ppdb2score")
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("glad", "content", "cheerful"))
    assert(rows.head.getDouble(1) === 5.31)
  }

  test("2-hop chains include happy→pleased and the car→the vehicle") {
    val chains = SparkEntry.queries("ppdb_selfjoin_chain")(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(chains.contains(("happy", "pleased")))
    assert(chains.contains(("the car", "the vehicle")))
  }

  test("alignment explode yields 3 pairs per 'thrown into jail' rule") {
    val n = SparkEntry.queries("ppdb_explode_alignment")(spark, "unused")
      .filter(col("phrase") === "thrown into jail")
      .groupBy("paraphrase").count().collect()
    assert(n.length === 2)
    assert(n.forall(_.getLong(1) === 3L))
  }

  test("entailment aggregate: Equivalence 8, ForwardEntailment 2, Exclusion 1, OtherRelated 1") {
    val m = SparkEntry.queries("ppdb_agg_entailment")(spark, "unused")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map(
      "Equivalence" -> 8L, "ForwardEntailment" -> 2L,
      "Exclusion" -> 1L, "OtherRelated" -> 1L))
  }

  test("typed Dataset[PpdbRule] exposes features map and alignment pairs") {
    val r = Ppdb.rules(spark).filter(_.phrase == "thrown into jail")
      .filter(_.paraphrase == "jailed").head()
    assert(r.features("PPDB2.0Score") === 3.87)
    assert(r.features("p(e|f)") === 2.10)
    assert(r.alignment === Seq((0, 0), (1, 0), (2, 0)))
    assert(r.entailment === "Equivalence")
  }
}
