package graft

import org.apache.spark.sql.functions.{col, size, split}
import org.scalacheck.Gen

/** Bit-parity gate for the round-19 fused [[graft.plans.MatchTokens]]
  * kernel against the split/size/KeepInSet composition it replaces in
  * rank_bm25's checkpoint stage: dl ≡ size(split(s, " ")), mtoks ≡
  * keepInSet(split(s, " "), set) (order and duplicates preserved, empty
  * tokens probed like the builtin split emits them), NULL → NULL.
  */
class MatchTokensParitySpec extends SparkSpec {

  private val set = Seq("join", "merge", "sort", "")

  private def kernel(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.plans.MatchTokens(
        org.apache.spark.sql.GraftSqlShim.expression(c), set))

  private def reference(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.plans.KeepInSet(
        org.apache.spark.sql.GraftSqlShim.expression(split(c, " ")), set))

  private def assertParity(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val df = spark.createDataset(inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("id", "text")
    val rows = df
      .select(col("id"),
        kernel(col("text")).getField("dl").as("kdl"),
        kernel(col("text")).getField("mtoks").as("km"),
        size(split(col("text"), " ")).as("bdl"),
        reference(col("text")).as("bm"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(3),
        s"dl kernel=${r.getInt(1)} builtin=${r.getInt(3)} input=${inputs(r.getLong(0).toInt)}")
      assert(r.getSeq[String](2) == r.getSeq[String](4),
        s"mtoks kernel=${r.getSeq[String](2)} ref=${r.getSeq[String](4)} input=${inputs(r.getLong(0).toInt)}")
    }
  }

  test("edge literals incl. empty-token probes and duplicates") {
    assertParity(Seq(
      "", " ", "  ", "join", "join join", "a join b merge sort",
      " join", "join ", " join ", "join  merge", "nojoin joined sort",
      "sort sort sort", "merge", "a b c", "join\tmerge", "中文 join 混合"))
  }

  test("null input yields null struct") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, Option.empty[String]), (2L, Some("join x"))))
      .toDF("id", "text")
    val rows = df.select(col("id"), kernel(col("text")).as("k")).orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getStruct(1).getInt(0) == 2)
  }

  test("generated strings") {
    val word = Gen.frequency(
      (3, Gen.oneOf("join", "merge", "sort", "", "a", "bb")),
      (2, Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)))
    val gen = Gen.listOfN(12, word).map(_.mkString(" "))
    val samples = Gen.listOfN(300, gen).sample.getOrElse(Nil)
    assert(samples.nonEmpty)
    assertParity(samples)
  }

  test("corpus parity at sf0.001 over normText output") {
    import graft.Tables.normText
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val bad = docs
      .select(
        (kernel(normText(col("text"))).getField("dl") <=>
          size(split(normText(col("text")), " "))).as("dl_ok"),
        (kernel(normText(col("text"))).getField("mtoks") <=>
          reference(normText(col("text")))).as("m_ok"))
      .filter(!col("dl_ok") || !col("m_ok"))
      .count()
    assert(bad == 0L)
  }
}
