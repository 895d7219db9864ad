package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry

/** Interleaved A/B benchmark — the only timing protocol on this host whose
  * deltas survive scrutiny: single-shot (and even per-run median) numbers
  * swing ±30%+ with ZERO code change (documented across rounds 3–5), so a
  * perf claim needs both forms measured in ONE session, ALTERNATING, so
  * drift hits both sides equally. Reports per-side medians + the ratio.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AbBench <a> <b> [reps]"
  *
  * Names resolve from SparkEntry.queries plus [[variants]] — reference
  * forms of optimized operators that are deliberately NOT part of the
  * declared surface (e.g. the banded-LSH corpus clean the set-fingerprint
  * fast path replaced). Row counts of both sides are asserted equal first:
  * a "speedup" that changes the answer is a bug, not a win.
  */
object AbBench {

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the buffered-median anomaly_mad form round 18 replaced (per-group
    // percentile buffers on |groups| final tasks, med→MAD re-scan): the
    // measured-slower, non-scalable side of the HistogramMedian rewrite;
    // row-identity pinned by Round18Spec
    "anomaly_mad_bufmedian" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{events, rd}
      val e = events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          floor(col("value") * 100 + 0.5).as("c"))
      val med = e.groupBy("event_type")
        .agg(median(col("c")).as("med"))
      val stats = e.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("med"))
        .agg(median(abs(col("c") - col("med"))).as("mad"))
      e.join(broadcast(stats), "event_type")
        .withColumn("mz",
          when(col("mad") > 0, lit(0.6745) * (col("c") - col("med")) / col("mad")))
        .filter(abs(col("mz")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"),
          rd(col("mz"), 4).as("mz"))
        .orderBy("event_id")
    }),
    // round-18 join-strategy A/B (guide §3.1): join_bloom_native with the
    // sort-merge preference dropped, so the planner may pick a shuffled
    // hash join for the runtime-filtered semi join (build = the pruned
    // orders side) instead of sorting both shuffled sides. Size-guarded by
    // the planner itself — at 100 TB an oversized build side falls back to
    // SMJ — so it is scale-adaptive, not a local-core-count tune.
    "join_bloom_native_shj" -> ((s0, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{moneySumCents, t}
      val s = s0.newSession()
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      val sel = t(s, d, "orders")
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"))
      t(s, d, "lineitem")
        .join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          moneySumCents(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    }),
    // agg_approx_topk decomposition (round 13, VERDICT r12 item 8 — the one
    // mildly superlinear sf1→sf3 survivor at 3.45×): which stage scales
    // badly, the explode fan-out or the sketch merge?
    // (a) tokenize+explode alone (count(*) sink keeps the fan-out but
    //     no sketch); (b) the exact groupBy+top-10 twin; (c) the sketch at
    //     the 10k default maxItemsTracked (10× the declared 1000)
    // text_tfidf before the round-13 df-as-plain-count rewrite: the
    // original countDistinct(doc_id) document-frequency aggregation
    "text_tfidf_countdistinct" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, rd, t}
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(normText(col("text")), " ").as("tk"))
      val terms = docs
        .select(col("doc_id"), size(col("tk")).as("len"), explode(col("tk")).as("token"))
      val tf = terms.groupBy("doc_id", "token", "len").agg(count(lit(1)).as("cnt"))
      val dfreq = tf.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn(
          "tfidf",
          rd((col("cnt").cast("double") / col("len")) *
            log(col("n_docs").cast("double") / col("df")), 6))
        .select(col("doc_id"), col("token"), col("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
        .limit(20)
    }),
    // the split + 2x SetHashSum dedup_token_sort stage the round-19 fused
    // TokenHashSums kernel replaced — row-identical (bit-equal sums)
    "dedup_token_sort_splitsum" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      def fpc(tk: org.apache.spark.sql.Column, seed: Long) =
        org.apache.spark.sql.GraftSqlShim.column(
          graft.plans.SetHashSum(
            org.apache.spark.sql.GraftSqlShim.expression(tk), seed))
      val toks = graft.Tables.spaceSplit(normText(col("text")))
      t(s, d, "documents")
        .select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"), fpc(col("tk"), 42L).as("fp1"), fpc(col("tk"), 7L).as("fp2"))
        .groupBy(col("fp1"), col("fp2"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dupes"))
        .select(col("keeper"), col("dupes"))
        .orderBy("keeper")
    }),
    // the agg+join-back cohort_retention form round 19 replaced with the
    // min-over-user window (sf10 interleaved 3.40 vs 4.78 s) — retained
    // measured twin, row-identical
    "cohort_retention_aggjoin" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{events, rd}
      val weekUs = 86400000000L
      val ev = events(s, d).select(col("user_id"), col("ts_us"))
      val firstEv = ev.groupBy("user_id").agg(min(col("ts_us")).as("first_ts"))
      val act = ev.join(firstEv, "user_id")
        .select(
          col("user_id"),
          expr(s"(first_ts div $weekUs) div 7").as("cw"),
          (expr(s"(ts_us div $weekUs) div 7") -
            expr(s"(first_ts div $weekUs) div 7")).as("week_n"))
        .distinct()
      val sizes = act.filter(col("week_n") === 0)
        .groupBy("cw").agg(count(lit(1)).as("cohort_size"))
      act.join(broadcast(sizes), "cw")
        .groupBy(col("cw").as("cohort_week"), col("week_n"))
        .agg(
          count(lit(1)).as("active_users"),
          rd(count(lit(1)).cast("double") / first(col("cohort_size")), 4)
            .as("retention"))
        .orderBy("cohort_week", "week_n")
    }),
    // the split+size+KeepInSet checkpoint stage the round-19 fused
    // MatchTokens kernel replaced in rank_bm25 — full query, old stage
    "rank_bm25_splitks" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.GraftSqlShim
      import graft.Tables.{normText, rd, t}
      val terms = graft.queries.Selection.Bm25Terms
      val docs = t(s, d, "documents")
        .select(col("doc_id"), graft.Tables.spaceSplit(normText(col("text"))).as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
          GraftSqlShim.column(graft.plans.KeepInSet(
            GraftSqlShim.expression(col("w")), terms)).as("mtoks"))
        .localCheckpoint()
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("mtoks")).as("token"))
        .groupBy(col("doc_id"), col("dl"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df), "token")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
        .withColumn("s",
          col("idf") * (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") /
              (col("tot_dl").cast("double") / col("n_docs").cast("double")))))
      val termCols = terms.map(tm =>
        coalesce(max(when(col("token") === tm, col("s"))), lit(0.0)))
      scored
        .groupBy(col("doc_id"))
        .agg(termCols.reduce(_ + _).as("score0"), count(lit(1)).as("n_terms"))
        .select(col("doc_id"), col("n_terms"), rd(col("score0"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),
    // the UNPARTITIONED-edge-checkpoint pagerank form round 19 replaced:
    // every one of the 5 rounds re-shuffles + re-sorts the edge list for
    // its join (the declared key now pre-partitions/pre-sorts sym by src
    // before the checkpoint) — results identical (exact integer arithmetic)
    "graph_pagerank_unpart" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val e = graft.queries.Graphs.copurchaseEdgesShared(s, d)
      val sym = e.union(e.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .localCheckpoint()
      val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("dg"))
        .localCheckpoint()
      val n = math.max(deg.count(), 1L)
      val S = 1000000000000L
      val damp = (15L * S / 100L) / n
      var pr = deg.select(col("node"), col("dg"), lit(S / n).as("prf"))
      var i = 0
      while (i < 5) {
        val contrib = sym
          .join(pr, col("node") === col("src"))
          .groupBy(col("dst"))
          .agg(sum(expr("prf div dg")).as("cs"))
        pr = deg
          .join(contrib, col("node") === col("dst"), "left")
          .select(
            col("node"), col("dg"),
            expr(s"${damp}L + (85L * coalesce(cs, 0L)) div 100L").as("prf"))
          .localCheckpoint(eager = false)
        i += 1
      }
      pr.select(col("node").as("part_id"),
          expr(s"(prf * ${n}L) div 1000000L").as("pr_scaled_e6"))
        .orderBy("part_id")
    }),
    // same A/B for LPA (rounds join on dst)
    "graph_community_lpa_unpart" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val e = graft.queries.Graphs.copurchaseEdgesShared(s, d)
      val sym = e.union(e.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .localCheckpoint()
      var lab = sym.groupBy(col("src").as("node")).agg(min(col("dst")).as("lab"))
        .localCheckpoint(eager = false)
      var i = 1
      while (i < 3) {
        lab = sym
          .join(lab, col("node") === col("dst"))
          .groupBy(col("src"), col("lab"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("src"))
          .agg(max(struct(col("cnt"), (-col("lab")).as("neg"))).as("m"))
          .select(col("src").as("node"), (-col("m.neg")).as("lab"))
          .localCheckpoint(eager = false)
        i += 1
      }
      lab.select(col("node"), col("lab").as("community")).orderBy("node")
    }),
    // the interpreted slice/cast/concat_ws/xxhash64 band-hash chain the
    // round-19 BandHashes kernel replaced — bit-identical banding
    // (BandHashParitySpec), measured side of the kernel A/B
    "dedup_minhash_exprband" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, rd, spaceSplit, t}
      val docs = t(s, d, "documents")
        .select(col("doc_id"), spaceSplit(normText(col("text"))).as("tokens"))
      graft.operators.MinHashLsh
        .nearDupPairs(docs, "doc_id", "tokens", threshold = 0.8, bandKernel = false)
        .select(col("a_id"), col("b_id"), rd(col("jaccard"), 4).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),
    // the WINDOW text_novelty form round 19 replaced (Exchange(g3) + full
    // sort of every (doc, shingle) row + near-27M per-doc partial
    // exchange) — the measured-slower side of the min-aggregate rewrite
    // (sf10 interleaved 8.19 vs 6.83 s), row-identical
    "text_novelty_window" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, spaceSplit, t}
      val g = t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.operators.MinHashLsh.shingles(
            spaceSplit(normText(col("text"))), 3)).as("g3"))
      g.withColumn(
          "first_doc",
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("g3")))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_shingles"),
          round(avg((col("first_doc") === col("doc_id")).cast("double")), 4).as("novelty"))
        .orderBy("doc_id")
    }),
    // round-19 candidate: aggregate-FIRST with NO checkpoint — map-side
    // partial aggregation compresses the first exchange to distinct
    // (doc, token) pairs (the r18 §10 negative paid a checkpoint
    // materialization for this; here both the len-window branch and the
    // dfreq branch consume the SAME (doc_id, token) exchange, so
    // ReusedExchange keeps the scan single). Costs one extra exchange of
    // the pair frame (window needs doc_id clustering the (d,t) hash does
    // not provide).
    "text_tfidf_aggfirst_nockpt" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import graft.Tables.{normText, rd, spaceSplit, t}
      val docs0 = t(s, d, "documents")
      val terms = docs0.select(
        col("doc_id"), explode(spaceSplit(normText(col("text")))).as("token"))
      val tf = terms.groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nDocs = docs0.agg(count(lit(1)).as("n_docs"))
      tf.withColumn("len", sum(col("cnt")).over(Window.partitionBy("doc_id")))
        .join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn(
          "tfidf",
          rd((col("cnt").cast("double") / col("len")) *
            log(col("n_docs").cast("double") / col("df")), 6))
        .select(col("doc_id"), col("token"), col("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
        .limit(20)
    }),
    // text_tfidf stage probes (round 13): where do the seconds go?
    // tokenize+explode alone, the (doc,token) aggregate alone, +df counts
    // round-18 SpaceSplit kernel A/B: the tokenize half of every text key.
    // Identical chain (scan → normText → tokenize → explode → count),
    // differing ONLY in the split implementation — builtin StringSplit
    // (UTF-16 round trip, per-token String alloc) vs the byte-slice kernel.
    "toksplit_builtin" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      t(s, d, "documents")
        .select(explode(split(normText(col("text")), " ")).as("token"))
        .agg(count(lit(1)).as("n"))
    }),
    "toksplit_kernel" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, spaceSplit, t}
      t(s, d, "documents")
        .select(explode(spaceSplit(normText(col("text")))).as("token"))
        .agg(count(lit(1)).as("n"))
    }),
    // same A/B through a hash aggregate consumer (the text_bigrams shape):
    // measures the kernel's zero-copy slices surviving into shuffle write
    "toksplit_agg_builtin" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      t(s, d, "documents")
        .select(explode(split(normText(col("text")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("s"), count(lit(1)).as("v"))
    }),
    "toksplit_agg_kernel" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, spaceSplit, t}
      t(s, d, "documents")
        .select(explode(spaceSplit(normText(col("text")))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("s"), count(lit(1)).as("v"))
    }),
    // round-18 tfidf A/B: aggregate-FIRST (map-side combine shrinks the
    // exchange to distinct (doc,token) pairs) with a localCheckpoint
    // barrier so the tf frame's two consumers (len window + df aggregate +
    // join) can't re-run the scan — the r13 objection to groupBy-first was
    // the duplicated scan, which the checkpoint removes
    "text_tfidf_tfckpt" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import graft.Tables.{normText, rd, spaceSplit, t}
      val docs0 = t(s, d, "documents")
      val tf = docs0
        .select(col("doc_id"), explode(spaceSplit(normText(col("text")))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val byDoc = Window.partitionBy("doc_id")
      val nDocs = docs0.agg(count(lit(1)).as("n_docs"))
      tf.withColumn("len", sum(col("cnt")).over(byDoc))
        .join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn(
          "tfidf",
          rd((col("cnt").cast("double") / col("len")) *
            log(col("n_docs").cast("double") / col("df")), 6))
        .select(col("doc_id"), col("token"), col("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
        .limit(20)
    }),
    "text_tfidf_explode_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
        .agg(count(lit(1)).as("n"))
    }),
    "text_tfidf_tf_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n"))
    }),
    "text_tfidf_df_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .groupBy("token").agg(count(lit(1)).as("df"))
        .agg(sum(col("df")).as("n"))
    }),
    "text_tfidf_join_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      tf.join(dfreq, "token").agg(sum(col("cnt") * col("df")).as("n"))
    }),
    "text_tfidf_tf_len" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(normText(col("text")), " ").as("tk"))
      docs.select(col("doc_id"), size(col("tk")).as("len"), explode(col("tk")).as("token"))
        .groupBy("doc_id", "token", "len").agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n"))
    }),
    "text_tfidf_tf_len_pre" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(normText(col("text")), " ").as("tk"))
      docs.select(col("doc_id"), size(col("tk")).as("len"), col("tk"))
        .select(col("doc_id"), col("len"), explode(col("tk")).as("token"))
        .groupBy("doc_id", "token", "len").agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n"))
    }),
    "text_tfidf_tf_len_first" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(normText(col("text")), " ").as("tk"))
      docs.select(col("doc_id"), size(col("tk")).as("len"), col("tk"))
        .select(col("doc_id"), col("len"), explode(col("tk")).as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("cnt"), first(col("len")).as("len"))
        .agg(sum(col("cnt") + col("len")).as("n"))
    }),
    "text_tfidf_scores_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.queries.Quality.tfidfScoresForBench(graft.Tables.t(s, d, "documents"))
        .agg(count(lit(1)).as("n"), sum(col("tfidf")).as("s"))
    }),
    "text_tfidf_join_hash" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      tf.join(dfreq.hint("shuffle_hash"), "token").agg(sum(col("cnt") * col("df")).as("n"))
    }),
    "agg_approx_topk_explode_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.Tables.t(s, d, "documents")
        .select(explode(split(graft.Tables.normText(col("text")), " ")).as("token"))
        .agg(count(lit(1)).as("n"))
    }),
    "agg_approx_topk_exact" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.Tables.t(s, d, "documents")
        .select(explode(split(graft.Tables.normText(col("text")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("est_count"))
        .orderBy(col("est_count").desc, col("token")).limit(10)
    }),
    "agg_approx_topk_10k" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.Tables.t(s, d, "documents")
        .select(explode(split(graft.Tables.normText(col("text")), " ")).as("token"))
        .agg(expr("approx_top_k(token, 10, 10000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.*"))
        .toDF("token", "est_count")
        .orderBy(col("est_count").desc, col("token"))
    }),
    // pipeline_corpus_clean before the Jaccard-1.0 set-fingerprint fast
    // path: full MinHash signature + banding + bucket join + verify
    "pipeline_corpus_clean_lsh" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.pipeline.CorpusClean
        .clean(
          graft.Tables.t(s, d, "documents").select(col("doc_id"), col("text")),
          graft.pipeline.CorpusClean.Config(
            minTokens = 5, maxPunctRatio = 0.3, nearDupJaccard = 1.0,
            maxBucketSize = Int.MaxValue, forceLsh = true))
        .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"))
        .orderBy("doc_id")
    }),
    // pipeline_corpus_clean before the round-15 fused fingerprint kernel:
    // the composed split → ngrams(distinct) → 2×set_hash_sum cascade the
    // ShingleSetHash kernel is bit-identical to; output identical to the
    // declared key
    "pipeline_corpus_clean_ngramfp" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.pipeline.CorpusClean
        .clean(
          graft.Tables.t(s, d, "documents").select(col("doc_id"), col("text")),
          graft.pipeline.CorpusClean.Config(
            minTokens = 5, maxPunctRatio = 0.3, nearDupJaccard = 1.0,
            maxBucketSize = Int.MaxValue, fusedFp = false))
        .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"))
        .orderBy("doc_id")
    }),
    // pipeline_corpus_clean before the round-15 slim checkpoint: the
    // normalize+hash checkpoint carried `text` through the pruning barrier
    // (~2× corpus bytes materialized for a column no dedup stage reads);
    // output identical to the declared key (doc_id + n_tok)
    "pipeline_corpus_clean_fatckpt" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.normText
      import graft.operators.MinHashLsh
      val docs = graft.Tables.t(s, d, "documents").select(col("doc_id"), col("text"))
      val quality = docs
        .withColumn("norm", normText(col("text")))
        .withColumn("n_tok", size(split(col("norm"), " ")))
        .withColumn(
          "punct_ratio",
          length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")).cast("double") /
            greatest(length(col("text")), lit(1)).cast("double"))
        .filter(col("n_tok") >= 5 && col("punct_ratio") <= 0.3)
        .drop("punct_ratio")
      val hashed = quality.withColumn("h", md5(col("norm"))).localCheckpoint()
      val keeperIds = hashed.select(col("doc_id"), col("h"))
        .groupBy("h").agg(min(col("doc_id")).as("doc_id")).drop("h")
      val keepers = hashed.join(keeperIds, Seq("doc_id"), "left_semi").drop("h")
      val sh = keepers.select(
        col("doc_id"),
        MinHashLsh.shingles(split(col("norm"), " "), shingleSize = 3).as("sh"))
      def fpc(seed: Long) = org.apache.spark.sql.GraftSqlShim.column(
        graft.plans.SetHashSum(
          org.apache.spark.sql.GraftSqlShim.expression(col("sh")), seed))
      val fp = sh.filter(size(col("sh")) > 0)
        .select(col("doc_id"), fpc(42L).as("fp1"), fpc(7L).as("fp2"))
      val keepIds = fp.groupBy("fp1", "fp2").agg(min(col("doc_id")).as("doc_id"))
        .drop("fp1", "fp2")
      val shingleless = sh.filter(size(col("sh")) === 0).select(col("doc_id"))
      keepers.join(keepIds.union(shingleless), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"))
        .orderBy("doc_id")
    }),
    // dedup_components before the edge-induced-subgraph restriction:
    // every round iterates ALL vertices, not just docs with a near-dup
    // round-18 lazy-vs-eager fixpoint checkpoint A/B: the shipped form
    // materializes each round inside its convergence-sum job (1 action per
    // round); this twin is the pre-r18 eager form (2 actions per round)
    "dedup_components_eagerckpt" -> ((s, d) =>
      graft.queries.ScaleOps.dedupComponents(s, d, iterateAll = false, eagerCkpt = true)),
    "dedup_components_allv" -> ((s, d) =>
      graft.queries.ScaleOps.dedupComponents(s, d, iterateAll = true)),
    // round-19 double-propagation NEGATIVE: two hops per convergence
    // action measured SLOWER at sf10 (3.24 vs 2.75) and sf0.1 (2.80 vs
    // 2.43) — clique-ish near-dup graphs converge in 2-3 single-step
    // actions, so the second hop is waste; lever retained for
    // high-diameter graphs
    "dedup_components_doublestep" -> ((s, d) =>
      graft.queries.ScaleOps.dedupComponents(s, d, iterateAll = false, doubleStep = true)),
    // graph_triangles with DEGREE-ordered orientation (Schank–Wagner):
    // edges point from the (degree, id)-smaller endpoint, so wedge fan-out
    // is bounded by oriented out-degree ≤ O(√E) even with hub nodes; the
    // closing probe canonicalizes back to the id-oriented edge list
    "graph_triangles_degree" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val e = graft.queries.Graphs.copurchaseEdges(s, d).localCheckpoint()
      val sym = e.union(e.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      val deg = sym.groupBy(col("a_id").as("node")).agg(count(lit(1)).as("dg"))
      val withDeg = e
        .join(deg.select(col("node").as("a_id"), col("dg").as("da")), "a_id")
        .join(deg.select(col("node").as("b_id"), col("dg").as("db")), "b_id")
      // orient by (deg, id): src is the smaller endpoint under that order
      def key(dg: String, id: String) =
        struct(col(dg).as("d"), col(id).as("i"))
      val o = withDeg.select(
        when(key("da", "a_id") < key("db", "b_id"),
          struct(col("a_id").as("s"), col("b_id").as("t"), key("db", "b_id").as("tk")))
          .otherwise(
            struct(col("b_id").as("s"), col("a_id").as("t"), key("da", "a_id").as("tk"))).as("x"))
        .select(col("x.s").as("s"), col("x.t").as("t"), col("x.tk").as("tk"))
        .localCheckpoint()
      val o2 = o.select(col("s").as("s2"), col("t").as("t2"), col("tk").as("tk2"))
      val wedges = o.join(o2, col("s") === col("s2") && col("tk") < col("tk2"))
      val closing = e.select(
        least(col("a_id"), col("b_id")).as("ca"),
        greatest(col("a_id"), col("b_id")).as("cb"))
      wedges
        .join(closing,
          least(col("t"), col("t2")) === col("ca") &&
            greatest(col("t"), col("t2")) === col("cb"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
    }),
    // skyline_pareto before the two-pass rewrite: the single global prefix
    // window — one task sorts and scans the whole part table
    "skyline_pareto_window" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.queries.WindowOps.skylineWindow(
        graft.Tables.t(s, d, "part")
          .select(col("p_partkey"), col("p_retailprice"), col("p_size")))
        .orderBy("p_partkey")
    }),
    // doc_pack_sequences before the two-pass rewrite: one prefix-sum window
    // per language — each language serializes onto one task
    "doc_pack_sequences_window" -> ((s, d) =>
      graft.queries.TrainPrep.packWindow(s, d)),
    // round-9 auto-crossover twins: the FORCED branches of the three
    // prefix-scan queries, so AbBench can show the auto form matches the
    // better twin at both scales (the declared query picks by estimated
    // input size)
    "doc_pack_sequences_blocked" -> ((s, d) =>
      graft.queries.TrainPrep.packBlocked(s, d)),
    "skyline_pareto_blocked" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.queries.WindowOps.skylineTwoPass(
        graft.Tables.t(s, d, "part")
          .select(col("p_partkey"), col("p_retailprice"), col("p_size")))
        .orderBy("p_partkey")
    }),
    "agg_weighted_median_window" -> ((s, d) =>
      graft.queries.Analytics.weightedMedian(s, d, force = Some(false))),
    "agg_weighted_median_blocked" -> ((s, d) =>
      graft.queries.Analytics.weightedMedian(s, d, force = Some(true))),
    // the retired round-9 blocked form: full two-pass PrefixScan running
    // weight for every row (whole-data shuffle-sort) + separate totals
    // scan — what the round-15 median-block refinement replaced
    "agg_weighted_median_scan2" -> ((s, d) =>
      graft.queries.Analytics.weightedMedian(s, d, force = Some(true), scan2 = true)),
    // the round-19 log-block A/B reference: the blocked branch with the
    // min/max pre-pass buckets (three scans) the per-row log-scale block id
    // (two scans) replaced — row-identical by construction
    "agg_weighted_median_mmblock" -> ((s, d) =>
      graft.queries.Analytics.weightedMedian(s, d, force = Some(true), mmBlocks = true)),
    // dedup_embedding_ann WITH a localCheckpoint on the bucketed index (the
    // round-9 review suggestion): measured SLOWER at both scales — 1.37× at
    // sf0.1, 1.50× at the proxy — because materializing the
    // nTables-replicated fat-vec index costs more than re-running the
    // codegen'd plane kernel for each of the three consumers
    "dedup_embedding_ann_ckpt" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.rd
      val emb = graft.Tables.t(s, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.operators.AnnDedup
        .pairs(emb, threshold = 0.45, dim = 64,
          nTables = graft.queries.Extras.AnnDedupTables,
          maxBucketSize = graft.queries.Extras.AnnDedupCap, reuseIndex = true)
        .select(col("a_id"), col("b_id"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),
    // dedup_embedding_ann the pre-round-9 way: broadcast all-pairs kernel
    // over the WHOLE table (maxBuildRows lifted for the A/B), then keep the
    // pairs that collide in ≥1 LSH table — same output as the bucketed
    // operator wherever the bucket-size cap doesn't bind (it never does on
    // the test corpora), so AbBench's row-equality gate holds while the
    // candidate-generation cost is what differs
    "dedup_embedding_ann_bruteforce" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.rd
      val emb = graft.Tables.t(s, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      val npl = graft.operators.AnnDedup.adaptivePlanes(emb.count())
      val all = graft.operators.CosinePairs
        .allPairs(s, emb, threshold = 0.45, maxBuildRows = 1000000)
      val bks = emb.select(col("id"),
        graft.operators.AnnLsh.tableBuckets(col("vec"), npl, 64,
          graft.queries.Extras.AnnDedupTables).as("bks"))
      all
        .join(bks.select(col("id").as("a_id"), col("bks").as("ba")), "a_id")
        .join(bks.select(col("id").as("b_id"), col("bks").as("bb")), "b_id")
        .filter(arrays_overlap(col("ba"), col("bb")))
        .select(col("a_id"), col("b_id"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),
    // dedup_semantic with QUADRATIC candidate generation: the same
    // |rank gap| ≤ W candidate set built by a full within-cluster
    // self-join + rank filter (N²/k intermediate matches) instead of the
    // declared exploded equi-join on (cid, rank+j) (2W per vector) —
    // row-identical, so the ratio is purely the candidate-generation cost
    "dedup_semantic_quadratic" -> ((s, d) =>
      graft.queries.Corpus.semanticNn(s, d, quadratic = true)),
    // round-18 rank_bm25 A/B (VERDICT r17 item 8): the declared form
    // tokenizes the corpus TWICE (stats needs dl over all docs; tf needs
    // the tokens). This twin tokenizes ONCE and localCheckpoints a SLIM
    // frame — (doc_id, dl, tokens FILTERED to the 3 query terms) — that
    // both branches consume; the checkpoint is ~24 B + matching tokens per
    // doc, not the full token arrays. Output identical by construction
    // (same algebra off the same per-doc quantities).
    // the RECOMPUTE form rank_bm25 shipped with before round 18 (stats and
    // tf branches each tokenize the corpus) — the measured-slower side of
    // the VERDICT r17 item-8 A/B (8.91 vs 7.63 s at sf10), row-identity
    // pinned by Round18Spec
    "rank_bm25_recompute" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, rd, t}
      val terms = graft.queries.Selection.Bm25Terms
      val docs = t(s, d, "documents")
        .select(col("doc_id"), graft.Tables.spaceSplit(normText(col("text"))).as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("dl"), col("w"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("token"))
        .filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("dl"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(dfq), "token")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
        .withColumn("s",
          col("idf") * (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") /
              (col("tot_dl").cast("double") / col("n_docs").cast("double")))))
      val termCols = terms.map(tm =>
        coalesce(max(when(col("token") === tm, col("s"))), lit(0.0)))
      scored
        .groupBy(col("doc_id"))
        .agg(termCols.reduce(_ + _).as("score0"), count(lit(1)).as("n_terms"))
        .select(col("doc_id"), col("n_terms"), rd(col("score0"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),
    "rank_bm25_slimckpt" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, rd, t}
      val terms = graft.queries.Selection.Bm25Terms
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(normText(col("text")), " ").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
          filter(col("w"), tk => tk.isin(terms: _*)).as("mtoks"))
        .localCheckpoint()
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("mtoks")).as("token"))
        .groupBy(col("doc_id"), col("dl"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(dfq), "token")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
        .withColumn("s",
          col("idf") * (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") /
              (col("tot_dl").cast("double") / col("n_docs").cast("double")))))
      val termCols = terms.map(tm =>
        coalesce(max(when(col("token") === tm, col("s"))), lit(0.0)))
      scored
        .groupBy(col("doc_id"))
        .agg(termCols.reduce(_ + _).as("score0"), count(lit(1)).as("n_terms"))
        .select(col("doc_id"), col("n_terms"), rd(col("score0"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),
    // round-10 coreset A/B: the recompute FPS form the incremental state
    // frame replaced — every round re-derives min-distance against the
    // WHOLE selected set (k-row fan-out + groupBy), O(K²·n·dim) total
    // distance work vs the declared form's O(K·n·dim)
    "sample_coreset_recompute" -> ((s, d) =>
      graft.queries.Corpus.coresetFps(s, d, recompute = true)),
    // round-15 coreset A/B: the per-round center fetch back against the
    // embeddings SOURCE (scan + fixed-point transform per round) that the
    // state-checkpoint fetch replaced
    "sample_coreset_embfetch" -> ((s, d) =>
      graft.queries.Corpus.coresetFps(s, d, centerFromEmb = true)),
    // round-16 coreset A/B (VERDICT r15 item 4): the round-10/15
    // incremental per-round-cluster-pass form the certificate-batched
    // driver FPS replaced
    "sample_coreset_incremental" -> ((s, d) =>
      graft.queries.Corpus.coresetFps(s, d, incremental = true)),
    // round-16 unigram-LM A/B (VERDICT r15 item 5): the broadcast-join
    // scoring pass (still the declared path for vocab > VocabLitMax) vs
    // the literal-map per-row fold
    "text_unigram_lm_join" -> ((s, d) =>
      graft.queries.Pipeline3.unigramLm(s, d, forceJoin = true)),
    // round-18 SumMapVals reference: the ORIGINAL literal-map fold
    // (interpreted ArrayAggregate + linear element_at probes) the native
    // kernel replaced in the declared key — row-identity pinned by
    // Round18Spec, speed measured here
    "text_unigram_lm_litmap_fold" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val toksC = split(normText(col("text")), " ")
      val toksDf = t(s, d, "documents")
        .select(col("doc_id"), explode(toksC).as("token"))
      val counts = toksDf.groupBy("token").agg(count(lit(1)).as("cnt"))
      val head = counts.limit(graft.queries.Pipeline3.VocabLitMax + 1).collect()
      require(head.length <= graft.queries.Pipeline3.VocabLitMax,
        "litmap fold twin needs the literal-map regime")
      val total = head.map(_.getLong(1)).sum
      val logp = head.map(r =>
        r.getString(0) -> math.log(r.getLong(1).toDouble / total)).toMap
      t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), toksC.as("w"))
        .withColumn("m", typedlit(logp))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_toks"),
          round(expr("aggregate(w, 0.0D, (acc, tk) -> acc + element_at(m, tk))")
            / size(col("w")), 4).as("lm_score"))
        .orderBy("doc_id")
    }),
    // round-16 novelty NEGATIVE twin: fingerprint-keyed hash-agg +
    // join-back — 2.72x slower than the declared window form at sf10
    // (double kernel pass + two 27M-row shuffles vs one exchange+sort)
    "text_novelty_aggjoin" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val g = t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.operators.MinHashLsh.shingles(
            split(normText(col("text")), " "), 3)).as("g3"))
        .select(col("doc_id"),
          xxhash64(col("g3")).as("h1"), xxhash64(col("g3"), lit(1)).as("h2"))
      val firsts = g.groupBy(col("h1"), col("h2"))
        .agg(min(col("doc_id")).as("first_doc"))
      g.join(firsts, Seq("h1", "h2"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_shingles"),
          round(avg((col("first_doc") === col("doc_id")).cast("double")), 4).as("novelty"))
        .orderBy("doc_id")
    }),
    // round-16 funnel A/B (VERDICT r15 item 8): the CHECKPOINTED chain —
    // measured 1.17x SLOWER than the declared recompute form at sf10
    // (materializing the per-user stage frames costs more than the
    // pushdown-cheap filtered scans it saves)
    "funnel_conversion_ckpt" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.events
      val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts_us"))
      val fv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("fv"))
        .localCheckpoint(eager = false)
      val fc = ev.filter(col("event_type") === "click")
        .join(fv, "user_id").filter(col("ts_us") > col("fv"))
        .groupBy("user_id").agg(min(col("ts_us")).as("fc"))
        .localCheckpoint(eager = false)
      val fp = ev.filter(col("event_type") === "purchase")
        .join(fc, "user_id").filter(col("ts_us") > col("fc"))
        .groupBy("user_id").agg(min(col("ts_us")).as("fp"))
      def stage(idx: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"), col("n_users"))
      stage(1, "view", fv)
        .unionByName(stage(2, "click_after_view", fc))
        .unionByName(stage(3, "purchase_after_click", fp))
        .orderBy("stage_idx")
    }),
    // round-10 basket-cap A/B (VERDICT r9 item 5): the declared
    // slice-before-fanout co-purchase edge build vs a row-identical twin
    // that fans out the FULL basket then filters pairs to the capped set —
    // on a mega-basket corpus the ratio is exactly the C(k,2)/C(64,2)
    // quadratic work the cap removes
    "copurchase_edges" -> ((s, d) =>
      graft.queries.Graphs.copurchaseEdges(s, d).orderBy("a_id", "b_id")),
    "copurchase_edges_postfilter" -> ((s, d) =>
      graft.queries.Graphs.copurchaseEdgesPostFilter(s, d).orderBy("a_id", "b_id")),
    // text_bigrams before the round-13 prefilter removal: size(toks)>=2
    // re-evaluates the normText+split chain once more per doc
    "text_bigrams_prefilter" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val toks = split(normText(col("text")), " ")
      val bigrams = org.apache.spark.sql.GraftSqlShim.column(
        graft.plans.NGrams(
          org.apache.spark.sql.GraftSqlShim.expression(toks), 2, distinct = false))
      t(s, d, "documents")
        .filter(size(toks) >= 2)
        .select(explode(bigrams).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    }),
    // text_unigram_lm before the round-13 localCheckpoint: counts branch
    // and probe branch each re-run scan+normText+explode
    "text_unigram_lm_twopass" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val toksDf = t(s, d, "documents")
        .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
      val counts = toksDf.groupBy("token").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      toksDf
        .join(broadcast(counts), "token")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          round(avg(log(col("cnt").cast("double") / col("total"))), 4).as("lm_score"))
        .orderBy("doc_id")
    }),
    // text_top_terms with the BUILTIN normalize chain — the A/B reference
    // for the round-13 NormText kernel (the declared key now runs the
    // one-pass kernel via Tables.normText)
    "text_top_terms_builtin_norm" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normTextBuiltin, t}
      t(s, d, "documents")
        .select(explode(split(normTextBuiltin(col("text")), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),
    // pipeline_corpus_clean stage probe (round 13): the normalize + quality
    // + hash + localCheckpoint stage alone — how much of the pipeline's
    // total is the checkpoint materializing text+norm (~2x corpus bytes)?
    "corpus_clean_ckpt_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val normalized = docs
        .withColumn("norm", normText(col("text")))
        .withColumn("n_tok", size(split(col("norm"), " ")))
        .withColumn(
          "punct_ratio",
          length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")).cast("double") /
            greatest(length(col("text")), lit(1)).cast("double"))
      val quality = normalized
        .filter(col("n_tok") >= 5 && col("punct_ratio") <= 0.3)
        .drop("punct_ratio")
      quality.withColumn("h", md5(col("norm"))).localCheckpoint()
        .agg(count(lit(1)).as("n"))
    }),
    // same stage but the checkpoint holds only the slim columns the
    // dedup machinery consumes — text excluded (the declared key prunes
    // text from the OUTPUT, but a checkpoint is a pruning barrier: the
    // current form materializes it anyway)
    "corpus_clean_ckpt_slim" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val normalized = docs
        .withColumn("norm", normText(col("text")))
        .withColumn("n_tok", size(split(col("norm"), " ")))
        .withColumn(
          "punct_ratio",
          length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")).cast("double") /
            greatest(length(col("text")), lit(1)).cast("double"))
      val quality = normalized
        .filter(col("n_tok") >= 5 && col("punct_ratio") <= 0.3)
        .select(col("doc_id"), col("norm"), col("n_tok"))
      quality.withColumn("h", md5(col("norm"))).localCheckpoint()
        .agg(count(lit(1)).as("n"))
    }),
    // round-15 stage probe: slim checkpoint + exact dedup (keeper groupBy +
    // semi join) but NO shingle/fingerprint stage — the delta against
    // corpus_clean_ckpt_slim is the exact-dedup cost, the delta against the
    // full pipeline is the shingle+fingerprint+final-join cost
    "corpus_clean_exact_only" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val quality = docs
        .withColumn("norm", normText(col("text")))
        .withColumn("n_tok", size(split(col("norm"), " ")))
        .withColumn(
          "punct_ratio",
          length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")).cast("double") /
            greatest(length(col("text")), lit(1)).cast("double"))
        .filter(col("n_tok") >= 5 && col("punct_ratio") <= 0.3)
      val slim = quality.select(col("doc_id"), col("norm"), col("n_tok"))
        .withColumn("h", md5(col("norm"))).localCheckpoint()
      val keeperIds = slim.select(col("doc_id"), col("h"))
        .groupBy("h").agg(min(col("doc_id")).as("doc_id")).drop("h")
      slim.join(keeperIds, Seq("doc_id"), "left_semi").drop("h")
        .agg(count(lit(1)).as("n"))
    }),
    // dedup_token_sort before the round-13 multiset-hash rewrite: per-doc
    // array_sort + concat_ws + md5 canonical fingerprint
    "dedup_token_sort_sorted" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, t}
      t(s, d, "documents")
        .select(
          col("doc_id"),
          md5(concat_ws(" ", array_sort(split(normText(col("text")), " ")))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dupes"))
        .select(col("keeper"), col("dupes"))
        .orderBy("keeper")
    }),
    // text_ngram_containment before the diagonal rewrite: three consumers
    // of the shingle frame (both join sides + the per-doc count branch),
    // each re-running scan+normalize+explode — the form that grew 8.6× on
    // the 10× proxy while the diagonal stays flat
    "text_ngram_containment_naive" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, rd, t}
      val sh = t(s, d, "documents")
        .filter(col("doc_id") < 500)
        .select(col("doc_id"),
          explode(graft.operators.MinHashLsh
            .shingles(split(normText(col("text")), " "), 3)).as("g3"))
      val n = sh.groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val b = sh.select(col("doc_id").as("b_id"), col("g3"))
      sh.join(b, Seq("g3"))
        .filter(col("doc_id") =!= col("b_id"))
        .groupBy(col("doc_id").as("a_id"), col("b_id"))
        .agg(count(lit(1)).as("isect"))
        .join(n.withColumnRenamed("doc_id", "a_id"), "a_id")
        .withColumn("c", col("isect").cast("double") / col("ns"))
        .filter(col("c") >= 0.3)
        .select(col("a_id"), col("b_id"), rd(col("c"), 4).as("containment"))
        .orderBy("a_id", "b_id")
    }),

    // round-16 money-sum A/B (VERDICT r15 item 2): the r15 DECIMAL(30,8)
    // accumulation forms of the two heaviest cent-grained join keys, to
    // measure what the long-cents rewrite buys back. NOTE: row counts
    // match but the aggregate VALUE is the same too (MoneySumSpec) — the
    // A/B is purely execution cost.
    "join_salted_decimal" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{moneySum, t}
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"))
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.SaltedJoin
        .join(li, ord,
          keys = Seq("l_orderkey" -> "o_orderkey"),
          saltFactor = 4,
          saltSource = Seq("l_linenumber", "l_partkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),
    "join_bucketed_decimal" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.moneySum
      graft.operators.BucketedJoin.joined(s, d)
        .groupBy(col("l_returnflag"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag", "o_orderpriority")
    }),

    // round-16 fingerprint-shuffle A/B (VERDICT r15 item 3): the r15
    // raw-STRING-keyed forms of text_seg_dedup / dedup_substring_spans,
    // vs the 128-bit two-seed xxhash64 fingerprint keys now declared.
    "text_seg_dedup_str" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.t
      val segs = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(1, (size(w) + 4) div 5)," +
              " i -> array_join(slice(w, (i - 1) * 5 + 1, 5), ' '))"))
            .as(Seq("seg_no", "seg")))
      val boiler = segs
        .groupBy(col("seg"))
        .agg(countDistinct(col("doc_id")).as("dc"))
        .filter(col("dc") >= 2)
        .select(col("seg"), lit(1).as("is_b"))
      segs.join(boiler, Seq("seg"), "left")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_segs"),
          count(col("is_b")).as("n_boiler"),
          array_join(expr(
            "transform(sort_array(collect_list(CASE WHEN is_b IS NULL THEN" +
              " struct(seg_no, seg) END)), p -> p.seg)"), " ").as("clean_text"))
        .orderBy("doc_id")
    }),
    "dedup_substring_spans_str" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{rd, t}
      val grams = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          explode(org.apache.spark.sql.GraftSqlShim.column(graft.plans.NGrams(
            org.apache.spark.sql.GraftSqlShim.expression(col("w")),
            8, distinct = false))).as("gram"))
      val dup = grams
        .groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("dc"))
        .filter(col("dc") >= 2)
        .select(col("gram"), lit(1).as("is_d"))
      val stats = grams.join(dup, Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("g"), count(col("is_d")).as("dup"))
      t(s, d, "documents").select(col("doc_id"))
        .join(stats, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("g"), lit(0L)).as("n_grams"),
          coalesce(col("dup"), lit(0L)).as("n_dup"),
          when(coalesce(col("g"), lit(0L)) > 0,
            rd(col("dup").cast("double") / col("g"), 6)).as("dup_ratio"))
        .orderBy("doc_id")
    }),
    // sim_ann_pq with the RETIRED closure-UDF ADC scorer (round 17, VERDICT
    // r16 item 1): the A/B baseline for the native AdcScore codegen kernel.
    // Same adaptive ladder, same candidates (Round17Spec pins them
    // bit-identical) — only the per-row scoring kernel differs.
    "sim_ann_pq_udf_scored" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{rd, t}
      import graft.operators.AnnPq
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val n = emb.count()
      val (m, kSub) = if (n < AnnPq.BigCorpus) (8, 32) else (16, 256)
      val rerank = math.max(128L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
      val books = AnnPq.fitCodebooks(emb, m, kSub, iters = 5,
        sampleCap = math.max(4096, 16 * kSub))
      val coded = emb
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id"), AnnPq.encoder(books)(col("vec")).as("codes"))
      val scored = coded
        .crossJoin(broadcast(q.select(col("qid"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          AnnPq.adcScorerUdf(q, books)(col("codes"), col("qid")).as("score"))
      val cands = AnnPq.topRerank(scored, rerank)
      AnnPq.exactRerank(cands, emb, q, 5)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    }),
    // sim_ann_ivfpq with by_residual=true codebooks (round 17, VERDICT r16
    // item 3): the FAISS-default residual coding at the SAME code budget,
    // coarse width, probe list, and re-rank as the shipped direct flavor —
    // the measured answer to whether residual coding buys recall per byte
    // here or the direct flavor's cell-independence is free.
    "sim_ann_ivfpq_residual" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{rd, t}
      import graft.operators.{AnnIvf, AnnIvfPq, AnnPq}
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val n = emb.count()
      val lists = math.min(AnnIvf.listsFor(n), AnnIvf.MaxLists)
      val (m, kSub) = if (n < AnnPq.BigCorpus) (8, 32) else (16, 256)
      val rerank = math.max(128L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
      AnnIvfPq.topKResidual(emb, q, k = 5, nLists = lists,
        nProbe = math.max(1, lists / 2), m = m, kSub = kSub, rerank = rerank)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    }),
    // punct-feature kernel A/B (round 17): the noop-sink bench exposed the
    // quality-feature pass at ~56 s/500k docs at sf10, with the
    // length(regexp_replace(text, CLASS, "")) punct counter as a main line
    // (regex engine per code point + a stripped copy allocated per row just
    // for its length). Pair sinks into ONE aggregate over the ratio so the
    // count() protocol cannot prune the work under test.
    "tq_punct_regex" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.t
      t(s, d, "documents")
        .select((length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")).cast("double") /
          greatest(length(col("text")), lit(1)).cast("double")).as("p"))
        .agg(count(lit(1)).as("n"), round(sum(col("p")), 2).as("sp"))
    }),
    "tq_punct_kernel" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.t
      t(s, d, "documents")
        .select((graft.Tables.punctCount(col("text")).cast("double") /
          greatest(length(col("text")), lit(1)).cast("double")).as("p"))
        .agg(count(lit(1)).as("n"), round(sum(col("p")), 2).as("sp"))
    }),
    // the WHOLE quality-feature pass, old punct form — the end-to-end twin
    // for the kernel swap under a work-preserving aggregate sink
    "text_quality_agg_regex" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, rd, t}
      val toks = split(normText(col("text")), " ")
      val nTok = size(toks).cast("double")
      val chars = length(regexp_replace(normText(col("text")), " ", "")).cast("double")
      val punct = length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")).cast("double") /
        greatest(length(col("text")), lit(1)).cast("double")
      val stop = graft.queries.Extras.markerHits(toks, graft.queries.Extras.enStop)
        .cast("double") / greatest(nTok, lit(1.0))
      val quality = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - punct) + lit(0.3) * stop
      t(s, d, "documents")
        .select(rd(quality, 4).as("q"), rd(chars / greatest(nTok, lit(1.0)), 4).as("a"))
        .agg(count(lit(1)).as("n"), round(sum(col("q")) + sum(col("a")), 2).as("sq"))
    }),
    "text_quality_agg_kernel" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{normText, rd, t}
      val toks = split(normText(col("text")), " ")
      val nTok = size(toks).cast("double")
      val chars = length(regexp_replace(normText(col("text")), " ", "")).cast("double")
      val punct = graft.Tables.punctCount(col("text")).cast("double") /
        greatest(length(col("text")), lit(1)).cast("double")
      val stop = graft.queries.Extras.markerHits(toks, graft.queries.Extras.enStop)
        .cast("double") / greatest(nTok, lit(1.0))
      val quality = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - punct) + lit(0.3) * stop
      t(s, d, "documents")
        .select(rd(quality, 4).as("q"), rd(chars / greatest(nTok, lit(1.0)), 4).as("a"))
        .agg(count(lit(1)).as("n"), round(sum(col("q")) + sum(col("a")), 2).as("sq"))
    }),
    // ADC KERNEL isolation at q=100 (round 17): the end-to-end key at q=10
    // is encode-dominated (the native-vs-UDF ratio read 0.97× — the swap
    // invisible exactly as predicted), so this pair multiplies the ADC work
    // ×10 and sinks into ONE aggregate — no rerank windows, no re-rank
    // join — to measure the scoring kernel itself. Same encode cost both
    // sides; only the per-row scorer differs.
    "adc_scan_native_q100" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.t
      import graft.operators.AnnPq
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val books = AnnPq.fitCodebooks(emb, 16, 256, iters = 5, sampleCap = 4096)
      val coded = emb
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id"), AnnPq.encoder(books)(col("vec")).as("codes"))
      coded.crossJoin(broadcast(q.select(col("qid"))))
        .select(AnnPq.adcScorer(q, books)(col("codes"), col("qid")).as("score"))
        .agg(sum(col("score")).as("s")) // sum, NOT count: count would let Catalyst prune the kernel away
    }),
    "adc_scan_udf_q100" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.t
      import graft.operators.AnnPq
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val books = AnnPq.fitCodebooks(emb, 16, 256, iters = 5, sampleCap = 4096)
      val coded = emb
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id"), AnnPq.encoder(books)(col("vec")).as("codes"))
      coded.crossJoin(broadcast(q.select(col("qid"))))
        .select(AnnPq.adcScorerUdf(q, books)(col("codes"), col("qid")).as("score"))
        .agg(sum(col("score")).as("s"))
    }),
    // the direct-coded flavor at the SAME flat coarse quantizer as the
    // residual twin above — the fair A/B pair past the clamp, where the
    // declared sim_ann_ivfpq now dispatches two-level
    "sim_ann_ivfpq_flat" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.Tables.{rd, t}
      import graft.operators.{AnnIvf, AnnIvfPq, AnnPq}
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val n = emb.count()
      val lists = math.min(AnnIvf.listsFor(n), AnnIvf.MaxLists)
      val (m, kSub) = if (n < AnnPq.BigCorpus) (8, 32) else (16, 256)
      val rerank = math.max(128L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
      AnnIvfPq.topK(emb, q, k = 5, nLists = lists,
        nProbe = math.max(1, lists / 2), m = m, kSub = kSub, rerank = rerank)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    })
  )

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AbBench <queryA> <queryB> [reps]")
    val Seq(nameA, nameB) = args.take(2).toSeq
    val reps = if (args.length > 2) args(2).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries ++ variants
    val fa = all.getOrElse(nameA, sys.error(s"unknown query $nameA"))
    val fb = all.getOrElse(nameB, sys.error(s"unknown query $nameB"))

    def time(f: (SparkSession, String) => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // warmup both sides once (codegen + scan caches), equally
    val (_, na) = time(fa)
    val (_, nb) = time(fb)
    require(na == nb, s"row-count mismatch: $nameA=$na vs $nameB=$nb — not comparable")

    val ta = new Array[Double](reps)
    val tb = new Array[Double](reps)
    var r = 0
    while (r < reps) {
      ta(r) = time(fa)._1
      tb(r) = time(fb)._1
      r += 1
    }
    def med(xs: Array[Double]) = xs.sorted.apply((xs.length - 1) / 2)
    val (ma, mb) = (med(ta), med(tb))
    def fmt(xs: Array[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"a":"$nameA","b":"$nameB","rows":$na,"reps":$reps,""" +
      s""""median_a":$ma,"median_b":$mb,"ratio_a_over_b":${ma / mb},""" +
      s""""times_a":${fmt(ta)},"times_b":${fmt(tb)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
