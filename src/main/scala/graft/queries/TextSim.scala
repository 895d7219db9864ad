package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{normText, normTextSql, rd, rdSql, t}
import graft.operators.MinHashLsh

/** Round-7 text-similarity additions (SURVEY.md §2.16): token-sort
  * (bag-of-words) dedup and asymmetric n-gram containment — the
  * quote/subset detector exact Jaccard misses (a short doc fully contained
  * in a long one has low Jaccard but containment 1.0).
  *
  * Scale notes (100 TB):
  * - Token-sort dedup is the exact-dedup skeleton with a canonicalized
  *   fingerprint: only (16-byte md5, id) pairs shuffle, text never moves.
  * - Containment uses the shingle equi-join (blocking key = the shingle
  *   itself), the same discipline as text_contamination; at corpus scale,
  *   stop-shingles (document-frequency caps) bound the hot-shingle fan-out
  *   exactly like MinHashLsh.maxBucketSize bounds degenerate buckets.
  */
object TextSim {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Bag-of-words identity: docs whose normalized token MULTISET matches
    // after sorting collapse to one fingerprint — catches token-reordered
    // near-copies exact dedup misses (sentence shuffles, clause swaps).
    "dedup_token_sort" -> ((s, d) => {
      t(s, d, "documents")
        .select(
          col("doc_id"),
          md5(concat_ws(" ", array_sort(split(normText(col("text")), " ")))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dupes"))
        .select(col("keeper"), col("dupes"))
        .orderBy("keeper")
    }),

    // Directed 3-gram containment |A∩B| / |A| ≥ 0.3 within the doc_id<500
    // block (declared semantics, same block as dedup_jaccard): pairs where
    // most of A's shingles occur in B — subset/quotation detection.
    "text_ngram_containment" -> ((s, d) => {
      // DIAGONAL form: the shingle self-join keeps a = b pairs, so the
      // (a, a) count IS |A| — each doc intersected with itself — and one
      // window over a_id replays it onto that doc's pair rows. This
      // collapses the naive three-consumer shape (two join sides + a
      // per-doc count branch, i.e. three scan+shingle pipelines or a
      // materialization) to two, with no extra job. Hot-shingle join
      // fan-out is quadratic in shingle document-frequency — at corpus
      // scale a df cap drops stop-shingles first, the same guard family as
      // MinHashLsh.maxBucketSize.
      val sh = t(s, d, "documents")
        .filter(col("doc_id") < 500)
        .select(col("doc_id"),
          explode(MinHashLsh.shingles(split(normText(col("text")), " "), 3)).as("g3"))
      val b = sh.select(col("doc_id").as("b_id"), col("g3"))
      val agg = sh
        .join(b, Seq("g3"))
        .groupBy(col("doc_id").as("a_id"), col("b_id"))
        .agg(count(lit(1)).as("cnt"))
      val byA = Window.partitionBy("a_id")
      agg
        .withColumn("ns", max(when(col("a_id") === col("b_id"), col("cnt"))).over(byA))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("c", col("cnt").cast("double") / col("ns"))
        .filter(col("c") >= 0.3)
        .select(col("a_id"), col("b_id"), rd(col("c"), 4).as("containment"))
        .orderBy("a_id", "b_id")
    }))

  private val norm = normTextSql("text")

  val oracle: Map[String, String] = Map(
    "dedup_token_sort" ->
      s"""WITH d AS (SELECT doc_id,
         |                  md5(array_to_string(list_sort(string_split($norm, ' ')), ' ')) AS fp
         |           FROM documents)
         |SELECT min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS dupes
         |FROM d GROUP BY fp ORDER BY keeper""".stripMargin,
    "text_ngram_containment" ->
      s"""WITH tok AS (SELECT doc_id, string_split($norm, ' ') AS tk
         |             FROM documents WHERE doc_id < 500),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[(i + 1):(i + 3)], ' ') AS g3
         |       FROM tok, LATERAL (SELECT unnest(range(0, len(tk) - 2)) AS i)
         |       WHERE len(tk) >= 3),
         |n AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS isect
         |          FROM sh a JOIN sh b ON a.g3 = b.g3 AND a.doc_id <> b.doc_id
         |          GROUP BY 1, 2)
         |SELECT a_id, b_id, ${rdSql("CAST(isect AS DOUBLE) / na.ns", 4)} AS containment
         |FROM inter JOIN n na ON na.doc_id = a_id
         |WHERE CAST(isect AS DOUBLE) / na.ns >= 0.3
         |ORDER BY a_id, b_id""".stripMargin)
}
