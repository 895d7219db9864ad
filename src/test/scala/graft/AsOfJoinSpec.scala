package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin operator semantics: direction, strictness, tolerance, left join. */
class AsOfJoinSpec extends SparkSpec {

  import AsOfJoin.{Backward, Forward}

  private def frames() = {
    import spark.implicits._
    val trades = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 8L, 150L))
      .toDF("trade_id", "acct", "t")
    val quotes = Seq((10L, 7L, 90L), (11L, 7L, 100L), (12L, 7L, 180L), (13L, 9L, 10L))
      .toDF("quote_id", "q_acct", "q_t")
    (trades, quotes)
  }

  test("backward strict picks the latest strictly-earlier row per key") {
    val (trades, quotes) = frames()
    val out = AsOfJoin.join(trades, quotes, Seq("acct" -> "q_acct"), "t", "q_t",
      Backward, strict = true)
      .select("trade_id", "quote_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // trade1@100: quotes 90 (100 excluded by strict); trade2@200: quote 180; trade3: acct 8 has none
    assert(out === Set((1L, 10L), (2L, 12L)))
  }

  test("backward inclusive admits equal timestamps") {
    val (trades, quotes) = frames()
    val out = AsOfJoin.join(trades, quotes, Seq("acct" -> "q_acct"), "t", "q_t",
      Backward, strict = false)
      .select("trade_id", "quote_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 11L), (2L, 12L))) // trade1 now matches quote@100
  }

  test("forward picks the earliest later row") {
    val (trades, quotes) = frames()
    val out = AsOfJoin.join(trades, quotes, Seq("acct" -> "q_acct"), "t", "q_t",
      Forward, strict = true)
      .select("trade_id", "quote_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 12L))) // only trade1@100 has a later quote (180)
  }

  test("tolerance bounds the time gap") {
    val (trades, quotes) = frames()
    val out = AsOfJoin.join(trades, quotes, Seq("acct" -> "q_acct"), "t", "q_t",
      Backward, strict = true, tolerance = Some(lit(15L)))
      .select("trade_id", "quote_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L))) // trade2@200 vs quote@180 gap 20 > 15 → dropped
  }

  test("randomized equivalence with the naive formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    for (_ <- 1 to 3) {
      val trades = (1 to 60).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
        .toDF("trade_id", "acct", "t")
      val quotes = (1 to 80).map(i => (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
        .toDF("quote_id", "q_acct", "q_t")
      val out = AsOfJoin.join(trades, quotes, Seq("acct" -> "q_acct"), "t", "q_t",
        Backward, strict = true, tiebreak = Seq(col("quote_id").desc))
        .select("trade_id", "quote_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

      // naive per-trade scan
      val ts = trades.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val qs = quotes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val expected = ts.flatMap { case (tid, acct, t) =>
        val cands = qs.filter(q => q._2 == acct && q._3 < t)
        if (cands.isEmpty) None
        else Some(tid -> cands.maxBy(q => (q._3, q._1))._1)
      }.toMap
      assert(out === expected)
    }
  }

  test("left join keeps unmatched rows with null right columns") {
    val (trades, quotes) = frames()
    val out = AsOfJoin.join(trades, quotes, Seq("acct" -> "q_acct"), "t", "q_t",
      Backward, strict = true, joinType = "left")
      .orderBy("trade_id").collect()
    assert(out.length === 3)
    val t3 = out.find(_.getLong(0) == 3L).get
    assert(t3.isNullAt(t3.fieldIndex("quote_id")))
  }
}
