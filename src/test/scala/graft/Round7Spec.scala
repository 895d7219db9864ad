package graft

import org.apache.spark.sql.functions._

/** Round-7 hardening tests (ADVICE r6 items). */
class Round7Spec extends SparkSpec {

  // ---- ConnectedComponents: out-of-set edges ignored (ADVICE r6) ----

  test("ConnectedComponents ignores edges whose endpoints are not vertices") {
    import spark.implicits._
    val vertices = Seq(1L, 2L, 3L, 4L).toDF("id")
    // 1-2 is in-set; 3-99 and 99-4 reference the non-vertex 99 — under the
    // restored contract they must be ignored, NOT allowed to merge 3 and 4
    // through the phantom id (and 99 must not appear in the output)
    val edges = Seq((1L, 2L), (3L, 99L), (99L, 4L)).toDF("src", "dst")
    val got = graft.operators.ConnectedComponents.labels(vertices, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L)))
  }

  test("ConnectedComponents iterateAll path also ignores out-of-set edges") {
    import spark.implicits._
    val vertices = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 50L)).toDF("src", "dst")
    val got = graft.operators.ConnectedComponents
      .labels(vertices, edges, iterateAll = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  // ---- AsOfSkew: opt-in id-based leftover probe (ADVICE r6) ----

  test("AsOfSkew leftIdCol probe is row-identical to the all-column probe") {
    val probes = spark.range(0, 40)
      .selectExpr("id as p_id", "id % 3 as user_id", "id * 600000000L + 1L as p_ts")
    val quotes = spark.range(0, 20)
      .selectExpr("id + 10000 as v_id", "id % 3 as v_user", "id * 990000000L as v_ts")
    def run(idCol: Option[String]) = graft.operators.AsOfSkew.join(
      probes, quotes, keys = Seq("user_id" -> "v_user"),
      leftTime = "p_ts", rightTime = "v_ts",
      tiebreak = "v_id", bucketWidth = 3600L * 1000000L, leftIdCol = idCol)
      .select("p_id", "v_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val slim = run(Some("p_id"))
    assert(slim.nonEmpty && slim.toSeq === run(None).toSeq)
  }

  test("AsOfSkew leftIdCol lets a map-typed left column through the probe") {
    // the default all-column probe cannot key a MapType with <=>; the
    // id-keyed probe must not care what the other columns are
    val probes = spark.range(0, 30)
      .selectExpr("id as p_id", "id % 3 as user_id", "id * 600000000L + 1L as p_ts",
        "map('k', cast(id as string)) as props")
    val quotes = spark.range(0, 15)
      .selectExpr("id + 10000 as v_id", "id % 3 as v_user", "id * 990000000L as v_ts")
    val salted = graft.operators.AsOfSkew.join(
      probes, quotes, keys = Seq("user_id" -> "v_user"),
      leftTime = "p_ts", rightTime = "v_ts",
      tiebreak = "v_id", bucketWidth = 3600L * 1000000L, leftIdCol = Some("p_id"))
    val plain = graft.plans.AsOfJoinNative.join(
      probes.drop("props"), quotes, keys = Seq("user_id" -> "v_user"),
      leftTime = "p_ts", rightTime = "v_ts", strict = true, tiebreak = Seq("v_id"))
    val s1 = salted.select("p_id", "v_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val s2 = plain.select("p_id", "v_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(s1.nonEmpty && s1.toSeq === s2.toSeq)
  }

  test("AsOfSkew rejects a leftIdCol that is not a left column") {
    val l = spark.range(0, 5).selectExpr("id as p_id", "id as user_id", "id as p_ts")
    val r = spark.range(0, 5).selectExpr("id as v_id", "id as v_user", "id as v_ts")
    val e = intercept[IllegalArgumentException] {
      graft.operators.AsOfSkew.join(
        l, r, keys = Seq("user_id" -> "v_user"),
        leftTime = "p_ts", rightTime = "v_ts", tiebreak = "v_id",
        bucketWidth = 10L, leftIdCol = Some("nope"))
    }
    assert(e.getMessage.contains("leftIdCol"))
  }

  // ---- CorpusClean: unsatisfiable threshold rejected (ADVICE r6) ----

  test("CorpusClean rejects a near-dup threshold above 1.0") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.CorpusClean.clean(
        docs, graft.pipeline.CorpusClean.Config(nearDupJaccard = 1.1))
    }
    assert(e.getMessage.contains("nearDupJaccard"))
  }
}
