package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{normText, normTextSql, rd, t}
import graft.operators.{AnnIvf, AnnLsh, MinHashLsh, SimHash}

/** Extended LLM-pipeline operators beyond SURVEY.md §2 (builder prompt:
  * SimHash, embedding-cosine near-dup, ANN, language-ID, quality scoring,
  * token counting, fingerprinting, multimodal binary plumbing). Declared in
  * SURVEY.md §2.12; deterministic ones carry DuckDB oracles, approximate
  * ones (`sim_ann_lsh`) are oracle-less with a measurable exact twin.
  */
object Extras {

  type Q = (SparkSession, String) => DataFrame

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "of", "and", "is", "not"),
    "es" -> Seq("el", "la", "y", "es", "no"),
    "fr" -> Seq("le", "la", "et", "est", "ne"),
    "zh" -> Seq("的", "是", "不", "了", "我"))

  // shared with Curation's logistic quality gate so the stop feature can
  // never drift between the two keys
  private[graft] val enStop = langMarkers.toMap.apply("en")

  /** Char-trigram profiles (high-frequency trigrams per language). */
  private val triProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("sch", "der", "ein", "ich", "und", "cht"),
    "en" -> Seq("the", "ing", "and", "ion", "ent", "hat"),
    "es" -> Seq("que", "ado", "los", "nte", "ara", "del"),
    "fr" -> Seq("les", "ent", "des", "ait", "eur", "que"),
    "zh" -> Seq("的", "是", "不", "了", "我", "在"))

  /** Marker/profile hit count via the codegen'd `count_in_set` kernel
    * (round 12) — the `size(filter(toks, t -> array_contains(set, t)))`
    * higher-order form it replaces is an interpreted CodegenFallback (and
    * null-parity is preserved: NULL toks → SQL NULL in both forms).
    */
  private[graft] def markerHits(toks: Column, set: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlShim.column(graft.plans.CountInSet(
      org.apache.spark.sql.GraftSqlShim.expression(toks), set))

  /** Non-space character count of a normText-normalized string, as DOUBLE —
    * the arithmetic twin of `length(regexp_replace(norm, " ", ""))` (round
    * 18): normText guarantees single interior spaces and no edge spaces, so
    * #spaces = #tokens − 1 exactly and the per-row regex pass (plus its
    * full string copy) collapses to `length(norm) − (size(toks) − 1)`.
    * Identical integer values (CharsNoSpaceParitySpec pins it, incl. empty /
    * whitespace-only / unicode / NULL — both forms are NULL on NULL text);
    * the DuckDB oracle keeps its own `length(replace(norm, ' ', ''))`
    * spelling, which computes the same number.
    */
  private[graft] def charsNoSpace(norm: Column, toks: Column): Column =
    (length(norm) - (size(toks) - lit(1))).cast("double")

  val queries: Map[String, Q] = Map(
    // n-gram/stopword language ID: per-language marker hits, argmax with
    // alphabetical tiebreak. One scan, no shuffle before the final sort.
    "text_langid" -> ((s, d) => {
      val toks = graft.Tables.spaceSplit(normText(col("text")))
      val scored = t(s, d, "documents").select(
        col("doc_id") +:
          langMarkers.map { case (l, set) => markerHits(toks, set).as(s"s_$l") }: _*)
      val best = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
      val predicted = langMarkers
        .foldLeft(when(lit(false), lit(""))) { case (acc, (l, _)) =>
          acc.when(col(s"s_$l") === best, lit(l))
        }
      scored
        .withColumn("predicted", coalesce(predicted, lit("und")))
        .orderBy("doc_id")
    }),

    // Character-trigram language ID — the n-gram variant of text_langid:
    // score = trigrams of the normalized text found in each language's
    // profile set, argmax with alphabetical tiebreak. Round 12: the
    // extraction rides the native `char_ngrams` kernel and each profile
    // score the `count_in_set` kernel — the prior higher-order form
    // (`transform(sequence(...), i -> substring(norm, i, 3))` + five
    // interpreted `filter`s) re-scanned the string from byte 0 at every
    // position (O(len²) per doc, recomputed per profile) and serialized
    // into a multi-minute single-task straggler at the sf3 rung. Both
    // kernels are bit-parity twins of the expression forms (spec-pinned in
    // Round12Spec), so the oracle is unchanged.
    "text_langid_ngram" -> ((s, d) => {
      import org.apache.spark.sql.GraftSqlShim.{column => gcol, expression => gexpr}
      val tri = graft.plans.CharNGrams(gexpr(normText(col("text"))), 3)
      val scored = t(s, d, "documents")
        .select(
          col("doc_id") +: triProfiles.map { case (l, set) =>
            gcol(graft.plans.CountInSet(tri, set)).as(s"g_$l")
          }: _*)
      val best = greatest(triProfiles.map { case (l, _) => col(s"g_$l") }: _*)
      val predicted = triProfiles
        .foldLeft(when(lit(false), lit(""))) { case (acc, (l, _)) =>
          acc.when(col(s"g_$l") === best, lit(l))
        }
      scored
        .withColumn("predicted", coalesce(predicted, lit("und")))
        .orderBy("doc_id")
    }),

    // Quality scoring: length/punctuation/stopword signals → composite in
    // [0,1]. All per-row double math — parity via the floor-round.
    "text_quality" -> ((s, d) => {
      val toks = graft.Tables.spaceSplit(normText(col("text")))
      val nTok = size(toks).cast("double")
      val chars = charsNoSpace(normText(col("text")), toks)
      // \p classes: non-ASCII letters are NOT punctuation. The DuckDB oracle
      // uses the SAME Unicode classes since round 17 (it carried an
      // ASCII-only '[a-z0-9\s]' before — latent divergence on accented/CJK
      // text); PunctParitySpec exhibits the old divergence and pins the
      // aligned classes cross-engine on non-ASCII literals.
      val punct = graft.Tables.punctCount(col("text")).cast("double") / // native kernel (round 17)
        greatest(length(col("text")), lit(1)).cast("double")
      val stop = markerHits(toks, enStop).cast("double") / greatest(nTok, lit(1.0))
      val quality = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - punct) + lit(0.3) * stop
      // ORDER-FIRST (round 18): the contract ORDER BY under a materializing
      // sink made RangePartitioning's boundary sampler re-evaluate the whole
      // feature chain (sf10 noop: 9.5 s unsorted → 35.1 s sorted). Sorting
      // the slim (doc_id, text) scan FIRST and projecting features after
      // keeps the sampler on the cheap scan and runs the features exactly
      // once, post-shuffle; a narrow projection preserves the total order,
      // and under the count() protocol EliminateSorts still prunes the sort.
      t(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tok"),
          rd(chars / greatest(nTok, lit(1.0)), 4).as("avg_tok_len"),
          rd(punct, 4).as("punct_ratio"),
          rd(stop, 4).as("stop_ratio"),
          rd(quality, 4).as("quality"))
    }),

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (alnum runs | single non-alnum marks) — both codegen'd.
    "text_tokencount" -> ((s, d) => {
      t(s, d, "documents")
        .select(
          col("doc_id"),
          when(trim(col("text")) === "", 0L)
            .otherwise(size(split(trim(col("text")), "\\s+")).cast("long")).as("ws_tokens"),
          size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
            .cast("long").as("bpe_tokens"))
        .orderBy("doc_id")
    }),

    // Document fingerprint: min-hash over 3-token shingles (winnowing-style
    // representative hash) — an 8-byte-per-doc identity for fast pre-dedup.
    "text_fingerprint" -> ((s, d) => {
      val sh = MinHashLsh.shingles(graft.Tables.spaceSplit(normText(col("text"))), 3)
      t(s, d, "documents")
        .select(
          col("doc_id"),
          size(sh).cast("long").as("n_shingles"),
          array_min(transform(sh, x => md5(x))).as("fp"))
        .orderBy("doc_id")
    }),

    // SimHash near-dup pairs via the exact 4-band pigeonhole join
    // (operators.SimHash scaladoc; Manku et al. WWW'07).
    "dedup_simhash" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(col("doc_id") < 500)
        .select(col("doc_id").as("id"), graft.Tables.spaceSplit(normText(col("text"))).as("toks"))
      val sigs = SimHash.signatures(docs, "id", "toks")
      SimHash.nearPairs(sigs, maxHamming = 3)
        .orderBy("a_id", "b_id")
    }),

    // Embedding-cosine similarity pairs (the embedding face of near-dup).
    // Blocked to vec_id<2000; threshold 0.45 fits this corpus (max pairwise
    // cos ≈ 0.51 — random vectors have no true dups, the operator pattern is
    // the deliverable).
    "dedup_embedding" -> ((s, d) => {
      // all-pairs numeric kernel → broadcast + mapPartitions JVM loop
      // (operators.CosinePairs scaladoc: measured 30–75 s as expressions,
      // ~1 s as a kernel; identical IEEE op order keeps oracle parity)
      val emb = t(s, d, "embeddings")
        .filter(col("vec_id") < 2000)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.operators.CosinePairs.allPairs(s, emb, threshold = 0.45)
        .select(col("a_id"), col("b_id"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // LSH-BUCKETED embedding near-dup over the WHOLE table (round 9): the
    // 100 TB path that retires CosinePairs' maxBuildRows broadcast cap. The
    // declared semantics are the blocked-pair list — "collides in ≥1 of 8
    // tables AND cos ≥ 0.45" — so the oracle is EXACT: it embeds the same
    // ±1 plane literals and mirrors the adaptive plane count from count(*)
    // (operators.AnnDedup scaladoc; integer ladder, no float-log boundary).
    "dedup_embedding_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.operators.AnnDedup
        .pairs(emb, threshold = 0.45, dim = 64, nTables = AnnDedupTables,
          maxBucketSize = AnnDedupCap)
        .select(col("a_id"), col("b_id"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // Bucketed ANN (random-hyperplane LSH, multi-probe) — the scale path
    // whose exactness baseline is sim_knn_cosine. Approximate ⇒ oracle-less.
    "sim_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      // 6 planes × 8 OR-tables: tuned so recall@5 vs sim_knn_cosine stays
      // ≥ 0.8 on this corpus (Round5Spec harness); nPlanes grows with log n
      // at scale, nTables buys recall linearly in index size
      AnnLsh.topK(emb, q, k = 5, nPlanes = 6, dim = 64, nTables = 8)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    }),

    // IVF ANN (seeded k-means coarse quantizer, nProbe cells per query) —
    // the FAISS-style scale path beside the LSH one. Approximate ⇒
    // oracle-less; recall is measured against sim_knn_cosine in tests.
    "sim_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      // adaptive quantizer width (AnnIvf.listsFor ≈ √n, nProbe = half the
      // cells): the probed fraction stays 1/2 at every corpus size while
      // cell granularity tracks n — recall@5 ≥ 0.8 is spec-pinned at five
      // rungs (sf0.01 → sf10, Round5/8/11/12 specs); a FIXED nLists=16 was
      // measured decaying 0.88 → 0.80 across the same ladder
      AnnIvf.topKAdaptive(emb, q, k = 5)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    }),

    // PQ ANN (product quantization + ADC scan, exact re-rank) — the THIRD
    // ANN family (round 16): LSH prunes by hash bucket, IVF by coarse cell;
    // PQ compresses every vector to m=8 code bytes and scans the
    // compressed domain, the memory-bound regime's answer (the coded 100 TB
    // table is ~1.5 TB). Approximate ⇒ oracle-less; recall vs
    // sim_knn_cosine is spec-pinned (AnnPqSpec), and every reported cosine
    // is EXACT (re-rank kernel = the brute-force twin's).
    "sim_ann_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      // adaptive code budget (AnnPq.topKAdaptive): 8×32 codes below 1M
      // vectors, 16×256 + √n re-rank above — the measured rung ladder
      // (recall@5 = 1.000 at sf0.01 AND at the 4.2M rung; a FIXED 8×32
      // was measured collapsing 1.000 → 0.14 at 4.2M, AnnPq scaladoc)
      graft.operators.AnnPq.topKAdaptive(emb, q, k = 5)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    }),

    // IVF-PQ ANN — the composition of the two (FAISS IndexIVFPQ, the
    // standard billion-scale architecture): the coarse quantizer PRUNES to
    // nProbe cells, the PQ codes make what's scanned 64× narrower — the
    // only family member with BOTH the candidate cut and the bandwidth
    // cut. Approximate ⇒ oracle-less; recall gate beside the parents'.
    "sim_ann_ivfpq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      graft.operators.AnnIvfPq.topKAdaptive(emb, q, k = 5)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    }),

    // PERSISTED ANN index, build-once-serve-many (round 18): the first call
    // per (session, sfDir) fits + encodes ONCE into a parquet index
    // (partitioned by cell so serving PRUNES unprobed cells at the file
    // level); every later call is the serve-only path — no fit, no encode.
    // The fits are deterministic, so the served rows are BIT-IDENTICAL to
    // sim_ann_ivfpq's fresh-fit answer (Round18Spec pins it at sf0.01 and
    // the 4.2M rung). Approximate ⇒ oracle-less, same recall pins as the
    // in-memory key it persists.
    "sim_ann_index_serve" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      graft.operators.AnnIndex.servedFromCache(emb, q, 5, d)
        .select(col("qid"), col("rnk"), col("nid"), rd(col("cos"), 4).as("cos_sim"))
        .orderBy("qid", "rnk")
    }),

    // Multimodal binary column with a REAL javax.imageio decode: committed
    // png/jpg/bmp payloads (fixtures/media_images.parquet, see
    // tools.GenMediaFixture) → true width/height/format + a checksum over
    // every decoded RGB sample, per-partition with no shuffle. The oracle
    // reads the fixture's round-trip-precomputed exp_* columns, so a
    // hash-match proves the pixels were actually decoded. JPEG is lossy and
    // its decoded samples are decoder-version-specific (the committed
    // exp_pixsum is pinned to the fixture-generation JDK), so the
    // cross-engine gate masks pix_sum on jpeg rows IN BOTH ENGINES — the
    // pixel-level proof rides the bit-exact png/bmp rows, jpeg still proves
    // the real decode via dims + sniffed format.
    "multimodal_binary" -> ((s, _) => {
      graft.multimodal.Binary
        .decodeImages(s, s.read.parquet(graft.multimodal.Binary.MediaFixturePath))
        .toDF()
        .withColumn("pix_sum",
          when(col("format") === "jpeg", lit(null).cast("long")).otherwise(col("pix_sum")))
        .orderBy("doc_id")
    }),

    // Multimodal audio with a REAL javax.sound.sampled WAV decode (round 9,
    // retiring the md5 stand-in stubs): committed RIFF/WAVE payloads
    // (fixtures/media_audio.parquet, see tools.GenAudioFixture) → true
    // sample-rate/channels/bit-depth/frame-count/µs-duration + a checksum
    // over every decoded PCM sample, per-partition with no shuffle. The
    // oracle reads the fixture's round-trip-precomputed exp_* columns, so a
    // hash-match proves the samples were actually parsed; PCM is lossless,
    // so nothing needs the jpeg-style mask.
    "multimodal_audio" -> ((s, _) => {
      graft.multimodal.Binary
        .decodeAudios(s, s.read.parquet(graft.multimodal.Binary.AudioFixturePath))
        .toDF()
        .orderBy("doc_id")
    }),

    // Windowed Σ|sample| energies over the REAL decoded PCM — the
    // per-window flatMap fan-out a frame/feature-extraction stage runs
    // (one file row → N window rows inside the partition, no shuffle).
    "multimodal_audio_windows" -> ((s, _) => {
      graft.multimodal.Binary
        .audioWindows(s, s.read.parquet(graft.multimodal.Binary.AudioFixturePath))
        .toDF()
        .orderBy("doc_id", "win_idx")
    }),

    // Strided frame sampling over REAL multi-frame containers: committed
    // animated GIFs (fixtures/media_frames.parquet, see tools.GenVideoFixture
    // — the one multi-frame format the JDK can decode) → frame count from
    // the container directory, every FrameStride-th frame decoded to true
    // dims + a full-pixel checksum. The video "decode → keyframe-sample →
    // per-frame features" path on real frames; a proprietary-codec
    // deployment swaps only decodeFrames' body, never the Spark plan. GIF's
    // LZW is lossless, so the round-trip exp_* oracle needs no jpeg-style
    // masking.
    "multimodal_frames" -> ((s, _) => {
      graft.multimodal.Binary
        .sampleFrames(s, s.read.parquet(graft.multimodal.Binary.VideoFixturePath))
        .toDF()
        .orderBy("doc_id", "frame_idx")
    }),

    // Perceptual-hash image dedup (round 11): REAL decode → deterministic
    // integer 8×8 average-hash → 4×16-bit band pigeonhole join (exact for
    // hamming ≤ 3, the operators.SimHash design) — the image-corpus
    // near-dup pass next to the text family's dedup_simhash. The oracle
    // computes the SAME pair set from the fixture's round-trip-recorded
    // exp_ahash, so a hash-match proves the pixels were decoded AND hashed
    // identically; the fixture commits 6 engineered near-dup pairs plus 12
    // mutually-distant bases, exercising both sides of the threshold.
    "multimodal_phash_dedup" -> ((s, _) => {
      val sigs = graft.multimodal.Binary
        .imageHashes(s, s.read.parquet(graft.multimodal.Binary.PhashFixturePath))
        .toDF()
      graft.multimodal.Binary.phashPairs(sigs, maxHamming = 3)
        .orderBy("a_id", "b_id")
    }),

    // Corrupt-blob decode audit (round 13, VERDICT r12 item 6): the flagged
    // imageHashStatus path run END-TO-END through the oracle gate over a
    // fixture that commits garbage/truncated/empty payloads next to real
    // PNGs. A hash-match proves corrupt rows SURVIVE with decode_ok=false
    // and a null hash — flagged for a quarantine table, not thrown, not
    // silently dropped — while good rows still decode to their recorded
    // pixels. At corpus scale this is the ingest-audit frame every curation
    // run writes before routing; decode happens per-partition, no shuffle.
    "multimodal_decode_audit" -> ((s, _) => {
      graft.multimodal.Binary
        .imageHashStatus(s, s.read.parquet(graft.multimodal.Binary.DecodeAuditFixturePath))
        .toDF()
        .orderBy("doc_id")
    })
  )

  /** dedup_embedding_ann parameters, shared by query + oracle generator. */
  private[graft] val AnnDedupTables = 8
  private[graft] val AnnDedupCap = 256L

  /** The dedup_embedding_ann oracle, GENERATED so the SQL carries the exact
    * same ±1 hyperplane literals the LshBuckets kernel uses (prefix
    * property: the adaptive plane count selects the first npl of each
    * table's MaxPlanes-plane set, chosen by the same integer ladder on
    * count(*)). list_inner_product is the same left-to-right IEEE fold as
    * the kernel, so every sign bit — and thus every bucket — matches
    * bit-identically.
    */
  private def annDedupOracleSql: String = {
    import graft.operators.{AnnDedup, AnnLsh}
    val ladder = (AnnDedup.MinPlanes until AnnDedup.MaxPlanes)
      .map(k => s"WHEN q <= ${1L << k} THEN $k").mkString(" ")
    val bk = (0 until AnnDedupTables).map { tbl =>
      val bits = AnnLsh.planes(AnnDedup.MaxPlanes, 64, tbl).zipWithIndex.map {
        case (p, k) =>
          s"(CASE WHEN $k < (SELECT npl FROM np) AND " +
            s"list_inner_product(vec, [${p.mkString(", ")}]) > 0 " +
            s"THEN ${1L << k} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $tbl AS tbl, $bits AS bucket FROM e"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |np AS (SELECT CASE $ladder ELSE ${AnnDedup.MaxPlanes} END AS npl
       |       FROM (SELECT (greatest(count(*), 1) + ${AnnDedup.TargetBucket - 1})
       |                      // ${AnnDedup.TargetBucket} AS q FROM e)),
       |bk AS ($bk),
       |sz AS (SELECT tbl, bucket FROM bk GROUP BY tbl, bucket
       |       HAVING count(*) <= $AnnDedupCap),
       |okb AS (SELECT bk.vec_id, bk.tbl, bk.bucket FROM bk JOIN sz USING (tbl, bucket)),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |         FROM okb a JOIN okb b
       |           ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |p AS (SELECT a_id, b_id,
       |             list_inner_product(ea.vec, eb.vec)
       |               / (sqrt(list_inner_product(ea.vec, ea.vec))
       |                  * sqrt(list_inner_product(eb.vec, eb.vec))) AS cos
       |      FROM cand JOIN e ea ON ea.vec_id = cand.a_id
       |                JOIN e eb ON eb.vec_id = cand.b_id)
       |SELECT a_id, b_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos_sim
       |FROM p WHERE cos >= 0.45 ORDER BY a_id, b_id""".stripMargin
  }

  private val norm = normTextSql("text")
  private val bpePattern = "[a-z0-9]+|[^a-z0-9\\s]"

  private[queries] def hitsSql(set: Seq[String]): String =
    s"len(list_filter(string_split($norm, ' '), t -> list_contains([${set.map("'" + _ + "'").mkString(", ")}], t)))"

  val oracle: Map[String, String] = Map(
    "text_langid" -> {
      val scores = langMarkers.map { case (l, set) => s"CAST(${hitsSql(set)} AS BIGINT) AS s_$l" }
      val best = s"greatest(${langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")})"
      val cases = langMarkers
        .map { case (l, _) => s"WHEN s_$l = $best THEN '$l'" }
        .mkString(" ")
      s"""WITH scored AS (
         |  SELECT doc_id, ${scores.mkString(",\n         ")}
         |  FROM documents)
         |SELECT *, CASE $cases ELSE 'und' END AS predicted
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    "text_langid_ngram" -> {
      val scores = triProfiles.map { case (l, set) =>
        s"CAST(len(list_filter(tg, t -> list_contains([${set.map("'" + _ + "'").mkString(", ")}], t))) AS BIGINT) AS g_$l"
      }
      val best = s"greatest(${triProfiles.map { case (l, _) => s"g_$l" }.mkString(", ")})"
      val cases = triProfiles
        .map { case (l, _) => s"WHEN g_$l = $best THEN '$l'" }
        .mkString(" ")
      s"""WITH n AS (SELECT doc_id, $norm AS norm FROM documents),
         |tri AS (SELECT doc_id,
         |               [substr(norm, CAST(i AS INT), 3) FOR i IN range(1, length(norm) - 1)] AS tg
         |        FROM n),
         |scored AS (
         |  SELECT doc_id, ${scores.mkString(",\n         ")}
         |  FROM tri)
         |SELECT *, CASE $cases ELSE 'und' END AS predicted
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    "text_quality" ->
      s"""WITH x AS (
         |  SELECT doc_id,
         |         CAST(len(string_split($norm, ' ')) AS DOUBLE) AS n_tok,
         |         CAST(length(replace($norm, ' ', '')) AS DOUBLE) AS chars,
         |         CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\t\\n\\x0B\\f\\r ]', '', 'g')) AS DOUBLE)
         |           / greatest(length(text), 1) AS punct,
         |         CAST(${hitsSql(enStop)} AS DOUBLE) / greatest(len(string_split($norm, ' ')), 1) AS stop
         |  FROM documents)
         |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |       floor(chars / greatest(n_tok, 1.0) * 10000.0 + 0.5) / 10000.0 AS avg_tok_len,
         |       floor(punct * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
         |       floor(stop * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
         |       floor((0.4 * least(n_tok / 100.0, 1.0) + 0.3 * (1.0 - punct) + 0.3 * stop)
         |             * 10000.0 + 0.5) / 10000.0 AS quality
         |FROM x ORDER BY doc_id""".stripMargin,
    "text_tokencount" ->
      s"""SELECT doc_id,
         |       CASE WHEN trim(text) = '' THEN 0
         |            ELSE CAST(len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS BIGINT)
         |       END AS ws_tokens,
         |       CAST(len(regexp_extract_all(lower(text), '$bpePattern')) AS BIGINT) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""WITH tk AS (SELECT doc_id, string_split($norm, ' ') AS tk FROM documents),
         |sh AS (SELECT doc_id,
         |              list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
         |                             FOR i IN range(1, len(tk) - 1)]) AS sh
         |       FROM tk)
         |SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
         |       list_min(list_transform(sh, s -> md5(s))) AS fp
         |FROM sh ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($norm, ' ')) AS tok
         |  FROM documents WHERE doc_id < 500),
         |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
         |bits AS (SELECT doc_id, j,
         |                sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |         FROM h CROSS JOIN (SELECT unnest(range(60)) AS j) GROUP BY doc_id, j),
         |sig AS (SELECT doc_id,
         |               CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
         |                             ELSE 0 END) AS BIGINT) AS simhash
         |        FROM bits GROUP BY doc_id),
         |bands AS (SELECT doc_id, simhash, k, (simhash >> CAST(15 * k AS INT)) & 32767 AS v
         |          FROM sig CROSS JOIN (SELECT unnest(range(4)) AS k)),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |                a.simhash AS sa, b.simhash AS sb
         |         FROM bands a JOIN bands b ON a.k = b.k AND a.v = b.v AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY a_id, b_id""".stripMargin,
    "dedup_embedding_ann" -> annDedupOracleSql,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 2000),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |             list_inner_product(a.v, b.v)
        |               / (sqrt(list_inner_product(a.v, a.v))
        |                  * sqrt(list_inner_product(b.v, b.v))) AS cos
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |FROM p WHERE cos >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,
    "multimodal_binary" ->
      s"""SELECT doc_id, CAST(octet_length(payload) AS BIGINT) AS byte_len,
         |       exp_width AS width, exp_height AS height,
         |       exp_format AS format,
         |       CASE WHEN exp_format = 'jpeg' THEN NULL ELSE exp_pixsum END AS pix_sum
         |FROM read_parquet('${graft.multimodal.Binary.MediaFixturePath}/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // band extraction mirrors the engine bit-for-bit: >> then & 65535 is
    // shift-semantics-proof (arithmetic vs logical shift only differ in the
    // masked-away high bits)
    "multimodal_phash_dedup" ->
      s"""WITH s AS (SELECT doc_id, exp_ahash AS h
         |           FROM read_parquet('${graft.multimodal.Binary.PhashFixturePath}/*.parquet')),
         |bands AS (SELECT doc_id, h, k, (h >> (16 * k)) & 65535 AS bv
         |          FROM s, LATERAL (SELECT unnest(range(0, 4)) AS k)),
         |p AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |             bit_count(xor(a.h, b.h)) AS hamming
         |      FROM bands a JOIN bands b
         |        ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming
         |FROM p WHERE hamming <= 3
         |ORDER BY a_id, b_id""".stripMargin,
    "multimodal_decode_audit" ->
      s"""SELECT doc_id, exp_ahash AS ahash, exp_decode_ok AS decode_ok
         |FROM read_parquet('${graft.multimodal.Binary.DecodeAuditFixturePath}/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "multimodal_audio" ->
      s"""SELECT doc_id, CAST(octet_length(payload) AS BIGINT) AS byte_len,
         |       exp_rate AS sample_rate, exp_channels AS channels,
         |       exp_bits AS bits, exp_n_frames AS n_frames,
         |       exp_duration_us AS duration_us, exp_pcm_sum AS pcm_sum
         |FROM read_parquet('${graft.multimodal.Binary.AudioFixturePath}/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "multimodal_audio_windows" -> {
      val wf = graft.multimodal.Binary.AudioWindowFrames
      s"""SELECT doc_id, CAST(i - 1 AS BIGINT) AS win_idx,
         |       CAST(least($wf, exp_n_frames - (i - 1) * $wf) * exp_channels AS BIGINT)
         |         AS n_samples,
         |       exp_win_energy[CAST(i AS INT)] AS energy
         |FROM read_parquet('${graft.multimodal.Binary.AudioFixturePath}/*.parquet'),
         |     LATERAL (SELECT unnest(range(1, len(exp_win_energy) + 1)) AS i)
         |ORDER BY doc_id, win_idx""".stripMargin
    },
    "multimodal_frames" ->
      s"""SELECT doc_id, exp_frame_idx[CAST(i AS INT)] AS frame_idx,
         |       exp_n_frames AS n_frames, exp_width AS width,
         |       exp_height AS height, exp_pix_sum[CAST(i AS INT)] AS pix_sum
         |FROM read_parquet('${graft.multimodal.Binary.VideoFixturePath}/*.parquet'),
         |     LATERAL (SELECT unnest(range(1, len(exp_frame_idx) + 1)) AS i)
         |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
