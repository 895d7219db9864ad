package graft

import org.apache.spark.sql.functions._

/** Round-16 curation widening (queries.Curation): structural invariants for
  * the three new keys over the tiny literal fixture — value-level parity is
  * the driver's DuckDB gate; what these pin is the declared semantics
  * (weights invert cluster sizes, the representative is a real argmax
  * member, the logistic keep decision derives from the rounded score).
  */
class CurationSpec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("dedup_soft_weights: c matches dedup_exact's cluster sizes and w = rd(1/c, 6)") {
    val soft = q("dedup_soft_weights").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // independent cluster sizes from the exact-dedup key (same md5(norm))
    val sizes = q("dedup_exact").collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (keeper, dupes)
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), md5(Tables.normText(col("text"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val byHash = Tables.t(spark, d, "documents")
      .select(md5(Tables.normText(col("text"))).as("h"))
      .groupBy("h").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(soft.nonEmpty)
    for ((id, c, w) <- soft) {
      assert(c === byHash(docs(id)), s"doc $id cluster size")
      assert(w === math.floor(1.0 / c * 1e6 + 0.5) / 1e6, s"doc $id weight")
    }
    // soft-dedup mass conservation: total weight of each cluster is ~1, so
    // the corpus's total weight equals its distinct-text count
    val totalW = soft.map(_._3).sum
    assert(math.abs(totalW - byHash.size) < 1e-3, s"Σw = $totalW vs ${byHash.size} clusters")
    val _ = sizes // dedup_exact consulted for schema stability only
  }

  test("dedup_cluster_rep: rep is a member with the max token count; sizes add up") {
    val labels = q("dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (doc_id, component)
    val ntok = Tables.t(spark, d, "documents").filter(col("doc_id") < 500)
      .select(col("doc_id"),
        size(array_distinct(split(Tables.normText(col("text")), " "))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val members = labels.groupBy(_._2).map { case (c, a) => (c, a.map(_._1).toSet) }
    val reps = q("dedup_cluster_rep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(reps.map(_._1).toSet === members.keySet, "one row per component")
    for ((comp, repId, repNtok, nDocs, totTok) <- reps) {
      val m = members(comp)
      assert(m.contains(repId), s"rep $repId must belong to component $comp")
      val maxTok = m.map(ntok).max
      assert(repNtok === maxTok, s"component $comp rep_ntok")
      // argmax tie-break: smallest doc_id among max-token members
      assert(repId === m.filter(ntok(_) == maxTok).min, s"component $comp tie-break")
      assert(nDocs === m.size.toLong, s"component $comp n_docs")
      assert(totTok === m.toSeq.map(ntok).sum, s"component $comp tot_tok")
    }
  }

  test("text_quality_logreg: scores in (0,1), keep == rounded score >= 0.5, total") {
    val rows = q("text_quality_logreg").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val nDocs = Tables.t(spark, d, "documents").count()
    assert(rows.length.toLong === nDocs)
    for ((id, score, keep) <- rows) {
      assert(score > 0.0 && score < 1.0, s"doc $id sigmoid range")
      assert(keep === (score >= 0.5), s"doc $id keep must derive from the rounded score")
    }
  }

  test("text_quality_logreg separates: both classes present on the real corpus") {
    // the tiny literal fixture's docs are uniformly short (all drop); the
    // threshold path is proven non-vacuous on the driver corpus (~30%
    // kept at sf0.001) — assume-gated like the ANN recall harnesses
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val rows = SparkEntry.queries("text_quality_logreg")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getBoolean(2))
    assert(rows.contains(true) && rows.contains(false),
      "logreg gate should keep some docs and drop some docs on the real corpus")
  }
}
