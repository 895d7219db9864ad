package graft

import graft.operators.RangeJoin

/** Bucketed range join must equal the naive nested-loop formulation. */
class RangeJoinSpec extends SparkSpec {

  test("point-in-interval matches the naive join across bucket boundaries") {
    import spark.implicits._
    val points = (0L to 100L by 7L).map(p => (p, s"p$p")).toDF("t", "pname")
    val intervals = Seq(
      (0L, 10L, "a"), (5L, 25L, "b"), (24L, 24L, "c"), // point-sized
      (30L, 95L, "d"), // spans many buckets
      (96L, 200L, "e"))
      .toDF("s", "e", "iname")

    val naive = points.crossJoin(intervals)
      .filter($"t" >= $"s" && $"t" <= $"e")
      .select("pname", "iname")
    val bucketed = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", bucketWidth = 10L)
      .select("pname", "iname")

    assert(bucketed.count() === naive.count())
    assert(bucketed.except(naive).count() === 0)
    assert(naive.except(bucketed).count() === 0)
  }

  test("degenerate giant intervals are dropped by the guard") {
    import spark.implicits._
    val points = Seq((5L, "p")).toDF("t", "pname")
    val intervals = Seq((0L, 1000000L, "huge")).toDF("s", "e", "iname")
    val out = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      bucketWidth = 10L, maxBuckets = 100)
    assert(out.count() === 0) // 100k buckets > guard → dropped
  }
}
