package graft

import graft.operators.SaltedJoin

/** Salted join must produce exactly the rows of the plain join. */
class SaltedJoinSpec extends SparkSpec {

  test("salted join equals plain join, spread over salt buckets") {
    import spark.implicits._
    // skewed: key 1 has 200 of 220 rows
    val large = ((1 to 200).map(i => (1L, i.toLong)) ++ (1 to 20).map(i => (2L, 1000L + i)))
      .toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("sk", "name")

    val plain = large.join(small, $"k" === $"sk").select("k", "payload", "name")
    val salted = SaltedJoin.join(large, small, Seq("k" -> "sk"), saltFactor = 8,
      saltSource = Seq("payload")).select("k", "payload", "name")

    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("left join keeps unmatched large-side rows exactly once") {
    import spark.implicits._
    val large = Seq((1L, 10L), (9L, 20L)).toDF("k", "payload") // key 9 unmatched
    val small = Seq((1L, "one")).toDF("sk", "name")
    val out = SaltedJoin.join(large, small, Seq("k" -> "sk"), saltFactor = 4,
      saltSource = Seq("payload"), joinType = "left")
    assert(out.count() === 2)
    assert(out.filter($"k" === 9L && $"name".isNull).count() === 1)
  }
}
