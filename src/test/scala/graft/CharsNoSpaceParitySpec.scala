package graft

import org.apache.spark.sql.functions._

/** Parity gate for the round-18 arithmetic `chars` rewrite
  * (`Extras.charsNoSpace`): `length(norm) − (size(toks) − 1)` must equal
  * `length(regexp_replace(norm, " ", ""))` for every normText output —
  * normText collapses interior whitespace to single spaces and trims the
  * edges, so the space count is exactly tokens − 1. Pinned on adversarial
  * literals (empty, whitespace-only, unicode, NULL) plus generated mixes,
  * and on the sf-fixture documents when present.
  */
class CharsNoSpaceParitySpec extends SparkSpec {

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val norm = graft.Tables.normText(col("text"))
    val toks = graft.Tables.spaceSplit(norm)
    df.select(
      length(regexp_replace(norm, " ", "")).cast("double").as("old"),
      graft.queries.Extras.charsNoSpace(norm, toks).as("neu"))
      .collect()
      .foreach { r =>
        val o = if (r.isNullAt(0)) null else r.getDouble(0).asInstanceOf[AnyRef]
        val n = if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[AnyRef]
        assert(o == n, s"chars diverge: regex=$o arithmetic=$n")
      }
  }

  test("adversarial literals: empty, whitespace-only, unicode, tabs, NULL") {
    import spark.implicits._
    val rows = Seq(
      "hello world", "", "   ", "\t\n  \r", "one", "  padded  ",
      "a  b\t\tc\n\nd", "多字 节 tokens 混 合", "ends with space ",
      " leading", "a", "ab", null.asInstanceOf[String],
      "punct, marks! and; stuff?", " nbsp is not \\s in java")
    both(rows.toDF("text"))
  }

  test("generated space/char mixes") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab \t\n  cdé字 "
    val rows = (1 to 500).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    both(rows.toDF("text"))
  }

  test("sf0.01 documents, when present") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    both(graft.Tables.t(spark, d, "documents").select(col("text")))
  }
}
