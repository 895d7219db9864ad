package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvDistinct

/** KMV sketch: accuracy on a Spark aggregation and merge laws. */
class KmvDistinctSpec extends SparkSpec {

  test("estimates 10k distinct within 15% through a grouped aggregation") {
    import spark.implicits._
    val kmv = udaf(new KmvDistinct(256))
    val df = (1 to 30000).map(i => ("g", (i % 10000).toLong)).toDF("g", "v")
    val est = df
      .groupBy("g")
      .agg(kmv(xxhash64(col("v"))).as("est"))
      .collect()(0).getLong(1)
    assert(math.abs(est - 10000) < 1500, s"estimate $est too far from 10000")
  }

  test("exact below k; merge is order-insensitive") {
    val agg = new KmvDistinct(64)
    val hashes = (1 to 40).map(i => i * 1234567L)
    val b = hashes.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) === 40L)

    val (l, r) = hashes.splitAt(13)
    val m1 = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val m2 = agg.merge(r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
    assert(m1 === m2)
    assert(agg.finish(agg.merge(b, b)) === 40L) // idempotent under self-merge
  }
}
