package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

/** Bit-parity gate for the round-19 fused [[graft.plans.TokenHashSums]]
  * kernel against the spaceSplit → 2×SetHashSum composition it replaces in
  * dedup_token_sort: identical wrapping sums per seed (the kernel hashes
  * in-place slices with the same XxHash64Function entry point), "" hashes
  * as the one empty token split keeps, NULL input → (0, 0).
  */
class TokenHashSumsParitySpec extends SparkSpec {

  private def kernel(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.plans.TokenHashSums(
        org.apache.spark.sql.GraftSqlShim.expression(c), 42L, 7L))

  private def ref(c: org.apache.spark.sql.Column, seed: Long) =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.plans.SetHashSum(
        org.apache.spark.sql.GraftSqlShim.expression(Tables.spaceSplit(c)), seed))

  private def assertParity(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val df = spark.createDataset(inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("id", "text")
    val rows = df
      .select(col("id"),
        kernel(col("text")).getField("fp1").as("k1"),
        kernel(col("text")).getField("fp2").as("k2"),
        ref(col("text"), 42L).as("b1"),
        ref(col("text"), 7L).as("b2"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4),
        s"kernel=(${r.getLong(1)},${r.getLong(2)}) ref=(${r.getLong(3)},${r.getLong(4)}) " +
          s"input=${inputs(r.getLong(0).toInt)}")
    }
  }

  test("edge literals") {
    assertParity(Seq(
      "", " ", "  ", "a", "a b", "b a", "a a b", " a ", "a  b",
      "duplicate duplicate tokens sum twice", "中文 tokens 混合", "🎉 🎊"))
  }

  test("null input yields the composition's (0, 0)") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, Option.empty[String]), (2L, Some("a"))))
      .toDF("id", "text")
    val rows = df.select(col("id"), kernel(col("text")).as("k")).orderBy("id").collect()
    assert(rows(0).getStruct(1).getLong(0) == 0L && rows(0).getStruct(1).getLong(1) == 0L)
  }

  test("multiset property: permutations agree, multiplicity changes differ") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      (1L, "a b c"), (2L, "c b a"), (3L, "a b c c"))).toDF("id", "text")
    val rows = df.select(col("id"), kernel(col("text")).getField("fp1").as("f"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == rows(1).getLong(1))
    assert(rows(0).getLong(1) != rows(2).getLong(1))
  }

  test("generated strings") {
    val word = Gen.frequency(
      (5, Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)),
      (1, Gen.const("")), (1, Gen.const("中文")))
    val gen = Gen.listOfN(10, word).map(_.mkString(" "))
    val samples = Gen.listOfN(300, gen).sample.getOrElse(Nil)
    assert(samples.nonEmpty)
    assertParity(samples)
  }

  test("corpus parity at sf0.001 over normText output") {
    import graft.Tables.normText
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val bad = docs
      .select(
        (kernel(normText(col("text"))).getField("fp1") <=>
          ref(normText(col("text")), 42L)).as("ok1"),
        (kernel(normText(col("text"))).getField("fp2") <=>
          ref(normText(col("text")), 7L)).as("ok2"))
      .filter(!col("ok1") || !col("ok2"))
      .count()
    assert(bad == 0L)
  }
}
