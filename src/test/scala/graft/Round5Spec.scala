package graft

/** Round-5 hardening + widening tests (VERDICT r4 task list). */
class Round5Spec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  // ---- CosinePairs fail-fast guard ----

  test("CosinePairs.allPairs throws fast when the build side exceeds maxBuildRows") {
    import spark.implicits._
    val big = spark.range(0, 50)
      .selectExpr("id", "array(cast(id as double), 1.0d) as vec")
    val e = intercept[IllegalArgumentException] {
      graft.operators.CosinePairs.allPairs(spark, big, threshold = 0.0, maxBuildRows = 10)
    }
    assert(e.getMessage.contains("maxBuildRows"))
  }

  test("CosinePairs.allPairs under the cap still finds the duplicate pair") {
    val df = spark.range(0, 3)
      .selectExpr("id", "array(1.0d, 2.0d, 3.0d) as vec")
    val pairs = graft.operators.CosinePairs
      .allPairs(spark, df, threshold = 0.99, maxBuildRows = 10)
      .collect()
    // 3 identical vectors → 3 pairs, all cosine 1.0
    assert(pairs.length === 3)
    assert(pairs.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }
}
