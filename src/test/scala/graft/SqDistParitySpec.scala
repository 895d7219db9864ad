package graft

import org.apache.spark.sql.functions.{col, expr}

/** Bit-parity gate for the round-18 [[graft.plans.SqDistLong]] kernel
  * against the `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
  * (acc, v) -> acc + v)` fold it replaces in the clustering family's inner
  * loop: identical exact long sums on dense equal-dimension input, and the
  * fold's lenient null semantics — ragged pair or null element → SQL NULL.
  */
class SqDistParitySpec extends SparkSpec {

  test("kernel == fold on dense, ragged, null-element and empty inputs") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 6L, 3L)),
      (2L, Seq[java.lang.Long](1000000L, 2000000L), Seq[java.lang.Long](0L, 0L)),
      (3L, Seq[java.lang.Long](), Seq[java.lang.Long]()),
      (4L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L)), // ragged → NULL
      (5L, Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)), // null elem → NULL
      (6L, Seq[java.lang.Long](-5L, 7L, 0L), Seq[java.lang.Long](5L, -7L, 1L)),
      (7L, null, Seq[java.lang.Long](1L)), // null array → NULL
      (8L, Seq[java.lang.Long](3000000L, 3000000L, 3000000L),
        Seq[java.lang.Long](-3000000L, -3000000L, -3000000L)))
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      col("id"),
      org.apache.spark.sql.GraftSqlShim.column(graft.plans.SqDistLong(
        org.apache.spark.sql.GraftSqlShim.expression(col("a")),
        org.apache.spark.sql.GraftSqlShim.expression(col("b")))).as("k"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")
        .as("f"))
      .collect()
    out.foreach { r =>
      val k = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      val f = if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))
      assert(k == f, s"id=${r.getLong(0)}: kernel=$k fold=$f")
    }
  }

  test("declared clustering keys are unchanged by the kernel (unit fixture row identity)") {
    val d = TestTables.dir(spark)
    for (key <- Seq("embedding_kmeans", "sample_diversity", "sample_coreset")) {
      val rows = SparkEntry.queries(key)(spark, d).collect()
      assert(rows.nonEmpty, s"$key returned no rows")
    }
  }
}
