package graft

import graft.pipeline.CorpusClean

/** End-to-end cleaning composition: quality gate → exact dedup → near-dup. */
class CorpusCleanSpec extends SparkSpec {

  test("drops short docs, exact dups, and near-dups; keeps smallest ids") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // keeper
      (1L, "  ALPHA beta   gamma delta epsilon zeta "), // exact dup of 0 after norm
      (2L, "alpha beta gamma delta epsilon eta"), // near-dup of 0 (5/7 shingle overlap? verified below)
      (3L, "tiny doc"), // fails minTokens
      (4L, "one two three four five six seven eight")) // independent keeper
      .toDF("doc_id", "text")

    val out = CorpusClean.clean(docs, CorpusClean.Config(minTokens = 5, nearDupJaccard = 0.5))
      .select("doc_id").as[Long].collect().toSet

    assert(out.contains(0L))
    assert(!out.contains(1L), "exact dup must drop")
    assert(!out.contains(3L), "short doc must drop")
    assert(out.contains(4L))
    // doc 2 shares 3 of its 4 trigram shingles with doc 0 → jaccard 3/5 = 0.6 ≥ 0.5 → dropped
    assert(!out.contains(2L), "near-dup must drop")
  }

  test("clean is idempotent") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (4L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val once = CorpusClean.clean(docs)
    val twice = CorpusClean.clean(once.select("doc_id", "text"))
    assert(once.select("doc_id").collect().toSet === twice.select("doc_id").collect().toSet)
  }
}
