package graft

import org.apache.spark.sql.Row

/** Operator-level tests running the REAL SparkEntry.queries functions over
  * the tiny literal tables (TestTables) — exact expected outputs.
  */
class QueriesSpec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("inventory: 53 declared queries, 51 with oracles") {
    assert(SparkEntry.queries.size === 53)
    assert(SparkEntry.oracleSql.size === 51)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("agg_approx_distinct", "dedup_minhash"))
  }

  test("dedup_exact groups normalized duplicates") {
    val rows = q("dedup_exact").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq // (keeper, dupes)
    assert(rows === Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("dedup_jaccard finds the a-b-c / a-b-d near pair") {
    val rows = q("dedup_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // jac(abc, abd) = 2/4 = 0.5 ; jac(abc, abc) = 1.0 (docs 0,1)
    assert(rows.contains((0L, 1L, 1.0)))
    assert(rows.contains((0L, 3L, 0.5)))
    assert(rows.contains((1L, 3L, 0.5)))
    assert(!rows.exists(r => r._1 == 2L || r._2 == 2L))
  }

  test("join_asof pairs each purchase with the latest earlier view") {
    val rows = q("join_asof").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((2L, 1L), (4L, 3L)))
  }

  test("stream_session splits user 7 at the 40-min gap") {
    val rows = q("stream_session").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((7L, 1L, 2L), (7L, 2L, 2L), (8L, 1L, 1L)))
  }

  test("stream_tumbling buckets by hour") {
    val rows = q("stream_tumbling").collect()
    // hour 0: view(1,3) + purchase(2,5→user8 view) → events 1,2,5 in [0,60)
    // at minutes 0,10,20; events 3,4 at 50,55 are also hour 0
    assert(rows.map(_.getLong(2)).sum === 5L)
  }

  test("topk_per_group keeps 3 best orders per customer") {
    val rows = q("topk_per_group").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 1L, 11L), (1L, 2L, 10L), (2L, 1L, 12L)))
  }

  test("agg_rollup emits leaf, subtotal and grand-total rows") {
    val rows = q("agg_rollup").collect()
    val total = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(total.getLong(2) === 4L)
    assert(rows.length === 8) // 4 leaves + 3 flag subtotals + 1 total
  }

  test("join_left_outer counts orders per customer including zero") {
    val rows = q("join_left_outer").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(rows === Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }

  test("udf_wordcount normalizes whitespace and case") {
    val rows = q("udf_wordcount").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows === Map(0L -> 3L, 1L -> 3L, 2L -> 2L, 3L -> 3L))
  }

  test("text_bigrams counts adjacent pairs across normalized docs") {
    val rows = q("text_bigrams").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("a b") === 3L)
    assert(rows("b c") === 2L)
    assert(rows("b d") === 1L)
  }

  test("dedup_minhash finds the exact-duplicate pair via banded LSH") {
    val rows = q("dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq((0L, 1L, 1.0))) // docs 0,1 normalize identical
  }

  test("sim_knn_cosine ranks the aligned vector first") {
    val first = q("sim_knn_cosine").collect()
      .filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L).head
    assert(first.getLong(2) === 1L) // nearest neighbor of e0 is e1
    assert(first.getDouble(3) > 0.99)
  }

  test("func_json extracts typed values") {
    val rows = q("func_json").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("entry returns the 3 ranked paraphrases of 'happy'") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 3)
    assert(rows.head.getString(0) === "glad")
  }
}
