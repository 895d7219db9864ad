package graft

import org.apache.spark.sql.DataFrame

/** Round-13 hardening tests (VERDICT r12 items). */
class Round13Spec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // ---- skyline oracle reformulation (VERDICT r12 item 4) ----
  // The official oracleSql is now the O(n log n) per-price-max + running
  // strict-prefix-max form (it verified sf3 in 3 s where the quadratic
  // NOT EXISTS needed 3.6e11 pair tests). These tests pin the two
  // formulations equivalent on adversarial frames, so the fast oracle
  // inherits the quadratic one's authority. Spark runs both SQLs here;
  // DuckDB runs the fast one in the driver gate — same ANSI text modulo
  // the null-safe join spelling.

  private val quadraticSql =
    """SELECT p.p_partkey, p.p_retailprice, p.p_size FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_partkey""".stripMargin

  private val fastSql =
    """WITH g AS (SELECT p_retailprice, max(p_size) AS mx
      |           FROM part GROUP BY p_retailprice),
      |r AS (SELECT p_retailprice, mx,
      |             max(mx) OVER (ORDER BY p_retailprice
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strictm
      |      FROM g)
      |SELECT p.p_partkey, p.p_retailprice, p.p_size
      |FROM part p JOIN r ON p.p_retailprice <=> r.p_retailprice
      |WHERE (r.strictm IS NULL OR r.strictm < p.p_size) AND r.mx = p.p_size
      |ORDER BY p_partkey""".stripMargin

  private def abOracle(data: Seq[(Long, Double, Int)]): Unit = {
    spark.createDataFrame(data).toDF("p_partkey", "p_retailprice", "p_size")
      .createOrReplaceTempView("part")
    try {
      val quad = rows(spark.sql(quadraticSql))
      val fast = rows(spark.sql(fastSql))
      assert(quad.nonEmpty && quad === fast)
    } finally spark.catalog.dropTempView("part")
  }

  test("skyline fast oracle == quadratic NOT EXISTS on the edge-case frame") {
    // duplicate point, same-size cheaper row, same-price bigger row — every
    // dominance edge case (the Round7/8 frame)
    abOracle(Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 7), (4L, 9.0, 5),
      (5L, 12.0, 9), (6L, 12.0, 8), (7L, 8.0, 2), (8L, 15.0, 9)))
  }

  test("skyline fast oracle == quadratic on an all-equal-price frame") {
    abOracle(Seq((1L, 5.0, 3), (2L, 5.0, 9), (3L, 5.0, 9), (4L, 5.0, 1)))
  }

  test("skyline fast oracle == quadratic on 200 mixed points") {
    abOracle((0 until 200).map { i =>
      ((i + 1).toLong, (i * 7 % 97) * 1.5 + 900.0, i * 13 % 50)
    })
  }

  test("skyline fast oracle == engine result on the test part table") {
    val d = TestTables.dir(spark)
    val got = rows(SparkEntry.queries("skyline_pareto")(spark, d))
    Tables.t(spark, d, "part").createOrReplaceTempView("part")
    try assert(got.nonEmpty && got === rows(spark.sql(fastSql)))
    finally spark.catalog.dropTempView("part")
  }
}
