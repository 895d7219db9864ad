package graft

import org.apache.spark.sql.functions.{col, split}
import org.scalacheck.Gen

import graft.Tables.spaceSplit

/** Bit-parity gate for the round-18 [[graft.plans.SpaceSplit]] kernel
  * against the builtin `split(s, " ")` it replaces in every text-key
  * tokenize chain. The builtin is Java `String.split(" ", -1)` under the
  * hood (single-char non-regex fast path), so the contract is: consecutive
  * spaces yield empty tokens, a leading space yields a leading empty token,
  * trailing empties are kept, empty input yields `[""]`, NULL yields NULL.
  * Parity holds for every valid-UTF-8 string (the kernel slices the
  * original bytes; the builtin round-trips through UTF-16, which is
  * byte-preserving exactly on valid UTF-8 — and every tokenize site feeds
  * the kernel normText output of parquet string columns, which is valid
  * UTF-8 by construction).
  */
class SpaceSplitSpec extends SparkSpec {

  private def assertParity(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val df = spark.createDataset(inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("id", "text")
    val rows = df
      .select(col("id"),
        spaceSplit(col("text")).as("k"),
        split(col("text"), " ").as("b"))
      .collect()
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) null else r.getSeq[String](1)
      val b = if (r.isNullAt(2)) null else r.getSeq[String](2)
      assert(k == b,
        s"kernel=$k builtin=$b input=${inputs(r.getLong(0).toInt)}")
    }
  }

  test("edge literals: empties, runs, leading/trailing, non-space whitespace") {
    assertParity(Seq(
      "", " ", "  ", "   ", "a", "a b", "a b c",
      " a", "a ", " a ", "a  b", "a   b  c ", "  a  ",
      "\ta b", "a\tb", "a\nb c", "ab", // non-space whitespace is NOT a separator
      "word", "two words", "ends with space ", " starts with space"))
  }

  test("unicode: multibyte tokens slice at byte level without mangling") {
    assertParity(Seq(
      "中文 tokens 混合", "Ångström unit", "emoji 🎉 party 🎊",
      "ß sharp s", "и кириллица тест", "　ideographic space is one token",
      "nbsp stays attached", "a 🎉🎊 b", "🎉 🎊", " 🎉 "))
  }

  test("null input yields null, like the builtin") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, Option.empty[String]), (2L, Some("a b"))))
      .toDF("id", "text")
    val rows = df.select(col("id"), spaceSplit(col("text")).as("k")).orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](1) == Seq("a", "b"))
  }

  test("generated strings: parity on arbitrary space/char mixes") {
    val tokenChar = Gen.frequency(
      (8, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', ' ', ' ', '\t', 'é', '中', 'ß', '!', '.', 'я')))
    val gen = Gen.listOfN(40, tokenChar).map(_.mkString)
    val samples = Gen.listOfN(300, gen).sample.getOrElse(Nil)
    assert(samples.nonEmpty)
    assertParity(samples)
  }

  test("explode over the kernel matches explode over the builtin") {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    val df = spark.createDataset(Seq(
      (1L, "a b  c"), (2L, ""), (3L, " x "), (4L, "single")))
      .toDF("id", "text")
    val k = df.select(col("id"), explode(spaceSplit(col("text"))).as("t"))
      .orderBy("id", "t").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = df.select(col("id"), explode(split(col("text"), " ")).as("t"))
      .orderBy("id", "t").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(k == b)
  }
}
