package graft

import org.apache.spark.sql.functions.{col, expr}

/** Bit-parity gate for the round-18 [[graft.plans.WordSegments]] kernel
  * against the `transform(sequence(1, (size(w)+n-1) div n),
  * i -> array_join(slice(w, (i-1)·n+1, n), ' '))` composition it replaces
  * in text_seg_dedup: short last segment, null-token skipping without a
  * doubled separator, NULL array → NULL.
  */
class SegmentsParitySpec extends SparkSpec {

  private val N = 5 // SegWords

  private def kernel(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlShim.column(graft.plans.WordSegments(
      org.apache.spark.sql.GraftSqlShim.expression(c), N))

  test("kernel == composition on dense, ragged-tail, null-token and null-array inputs") {
    import spark.implicits._
    val rows: Seq[(Long, Seq[String])] = Seq(
      (1L, (1 to 12).map(i => s"w$i")),            // 12 tokens → 5,5,2
      (2L, (1 to 5).map(i => s"w$i")),             // exactly one segment
      (3L, Seq("only")),                           // shorter than N
      (4L, (1 to 10).map(i => s"w$i")),            // exact multiple
      (5L, Seq("a", null, "b", "c", null, "d")),   // nulls skipped by join
      (6L, Seq("")),                               // the spaceSplit("") shape
      (7L, null),                                  // NULL array → NULL
      (8L, Seq("多字", "节", "tokens", "混", "合", "x")))
    val df = rows.toDF("id", "w")
    val out = df.select(
      col("id"),
      kernel(col("w")).as("k"),
      expr(s"transform(sequence(1, (size(w) + ${N - 1}) div $N)," +
        s" i -> array_join(slice(w, (i - 1) * $N + 1, $N), ' '))").as("f"))
      .collect()
    out.foreach { r =>
      val k = if (r.isNullAt(1)) null else r.getSeq[String](1)
      val f = if (r.isNullAt(2)) null else r.getSeq[String](2)
      assert(k == f, s"id=${r.getLong(0)}: kernel=$k composition=$f")
    }
  }

  test("text_seg_dedup declared output is unchanged on the unit fixture") {
    val d = TestTables.dir(spark)
    val rows = SparkEntry.queries("text_seg_dedup")(spark, d).collect()
    assert(rows.nonEmpty)
  }
}
