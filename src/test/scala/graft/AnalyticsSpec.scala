package graft

import org.apache.spark.sql.functions._

/** §2.13 analytic-SQL surface: reshaping, stats/ordered-set/filtered
  * aggregates, subqueries, advanced frames, deterministic sampling — runs
  * the REAL SparkEntry.queries over TestTables.
  */
class AnalyticsSpec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("pivot_status cells partition the orders count and fill absent cells with 0") {
    val rows = q("pivot_status").collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    assert(total === spark.read.parquet(s"$d/orders.parquet").count())
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 0 && r.getLong(3) >= 0))
  }

  test("unpivot_metrics emits exactly two long-form rows per part") {
    val n = spark.read.parquet(s"$d/part.parquet").count()
    val out = q("unpivot_metrics").collect()
    assert(out.length === 2 * n)
    assert(out.map(_.getString(1)).toSet === Set("size", "retailprice"))
  }

  test("agg_percentiles: Spark percentile interpolates like quantile_cont") {
    import spark.implicits._
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 10.0))
      .toDF("g", "x")
    val r = df.groupBy("g")
      .agg(expr("percentile(x, 0.5)").as("p50"), expr("percentile(x, 0.25)").as("p25"))
      .head()
    assert(r.getDouble(1) === 2.5) // (2+3)/2
    assert(r.getDouble(2) === 1.75) // 1 + 0.75*(2-1)
  }

  test("agg_minmax_by epsilon tiebreak is deterministic under value ties") {
    import spark.implicits._
    val df = Seq((1L, "P", 100.00), (2L, "P", 100.00), (3L, "P", 50.00))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val rank = col("o_totalprice") + col("o_orderkey") * lit(1e-9)
    val r = df.groupBy("o_orderpriority")
      .agg(max_by(col("o_orderkey"), rank).as("mx"), min_by(col("o_orderkey"), rank).as("mn"))
      .head()
    assert(r.getLong(1) === 2L) // tie on 100.00 → larger key wins max
    assert(r.getLong(2) === 3L) // true min untouched by epsilon
  }

  test("agg_filtered boolean aggregates") {
    import spark.implicits._
    val df = Seq(("S", -5.0), ("S", 10.0), ("T", 3.0)).toDF("c_mktsegment", "c_acctbal")
    val r = df.groupBy("c_mktsegment")
      .agg(count_if(col("c_acctbal") < 0).as("n_neg"),
        bool_and(col("c_acctbal") > -1000).as("all_above"))
      .orderBy("c_mktsegment").collect()
    assert(r(0).getLong(1) === 1L && r(0).getBoolean(2))
    assert(r(1).getLong(1) === 0L && r(1).getBoolean(2))
  }

  test("agg_listagg emits a deterministic sorted join") {
    val rows = q("agg_listagg").collect()
    rows.foreach { r =>
      val parts = r.getString(1).split(",")
      assert(parts.sorted.sameElements(parts))
      assert(parts.length === r.getLong(2))
    }
  }

  test("subquery_correlated keeps only orders above 1.9x their customer's average") {
    import spark.implicits._
    val out = q("subquery_correlated").as[Long].collect().toSet
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val avgByCust = orders.groupBy("o_custkey").agg(avg("o_totalprice").as("a"))
    val expected = orders.join(avgByCust, "o_custkey")
      .filter(col("o_totalprice") > lit(1.9) * col("a"))
      .select("o_orderkey").as[Long].collect().toSet
    assert(out === expected)
  }

  test("window_range_frame sums an interval-bounded event-time frame") {
    import spark.implicits._
    spark.sql("SET spark.sql.session.timeZone=UTC")
    val df = Seq(
      (1L, 7L, "2020-01-01"), (2L, 7L, "2020-01-20"), (3L, 7L, "2020-03-01"))
      .toDF("o_orderkey", "o_custkey", "ds")
      .withColumn("o_orderdate", col("ds").cast("timestamp"))
      .withColumn("o_totalprice", col("o_orderkey").cast("double"))
    df.createOrReplaceTempView("rf_in")
    val r = spark.sql(
      """SELECT o_orderkey, sum(o_totalprice) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS s
        |FROM rf_in ORDER BY o_orderkey""".stripMargin).collect()
    assert(r.map(_.getDouble(1)).toSeq === Seq(1.0, 3.0, 3.0))
  }

  test("window_ntile quartiles are 1..4 and percent_rank is within [0,1]") {
    val rows = q("window_ntile").collect()
    assert(rows.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 4))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(rows.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
  }

  test("window_first_last: full frame makes last/nth independent of current row") {
    val rows = q("window_first_last").collect()
    val byUser = rows.groupBy(_.getLong(1))
    byUser.values.foreach { rs =>
      assert(rs.map(_.getString(3)).distinct.length === 1) // last_et constant per user
      assert(rs.map(_.getString(2)).distinct.length === 1) // first_et constant per user
    }
  }

  test("sample_hash is deterministic across runs") {
    val a = q("sample_hash").collect().toSeq
    val b = q("sample_hash").collect().toSeq
    assert(a === b)
  }
}
