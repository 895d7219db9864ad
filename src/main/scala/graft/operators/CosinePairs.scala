package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** All-pairs cosine similarity over a bounded vector set — the exact
  * "embedding near-dup" kernel.
  *
  * This is the one operator family where `mapPartitions` beats every
  * expression formulation (SURVEY.md preference order (d), justified): an
  * all-pairs numeric kernel evaluates 10⁸+ multiply-adds, and both
  * higher-order lambdas (interpreted closures) and 64-term unrolled
  * expressions (megamorphic codegen) measured 30–75 s for 2M pairs, vs
  * ~1 s for a tight JVM double loop.
  *
  * Parity: the inner loop accumulates `acc += a(i)*b(i)` left-to-right —
  * the same IEEE op order as the SQL `aggregate` fold and DuckDB's
  * sequential `list_inner_product`, so results hash-match the oracle.
  *
  * Scale design: the build side is explicitly BOUNDED (the caller blocks it,
  * here vec_id<2000 ≈ 1 MB) and broadcast; the probe side streams through
  * partitions without shuffle. For unbounded all-pairs at 100 TB the
  * pattern generalizes to grid tiling (repartition both sides into P
  * range-blocks, join the P² block pairs) or, preferably, ANN pre-filtering
  * (operators.AnnLsh) so the exact kernel only runs inside buckets.
  */
object CosinePairs {

  /** Pairs (a_id < b_id) with cosine ≥ threshold. Input df: (id, vec).
    *
    * `maxBuildRows` is a fail-fast ceiling on the collected+broadcast build
    * side (mirrors AnnIvf.sampleCap): an unblocked call at scale must throw
    * loudly, not OOM the driver silently. The collect itself is bounded by
    * `limit(maxBuildRows + 1)`, so even an oversized input pulls at most one
    * row past the cap before the require fires.
    */
  def allPairs(
      spark: SparkSession,
      df: DataFrame,
      threshold: Double,
      maxBuildRows: Int = 100000): DataFrame = {
    import spark.implicits._
    // same input contract as AnnLsh/AnnIvf: vectors are non-null — cosine
    // with a null vector is undefined, and a bare NPE from the kernel loop
    // is not an error message (NullCorpusSpec pins the refusal)
    val rows = df.selectExpr(
        "id",
        "CASE WHEN vec IS NOT NULL THEN vec ELSE " +
          "raise_error('CosinePairs: null vector (ANN/cosine input contract: " +
          "filter null embeddings upstream)') END AS vec")
      .as[(Long, Array[Double])]
    val capped = rows.limit(maxBuildRows + 1).collect()
    require(
      capped.length <= maxBuildRows,
      s"CosinePairs.allPairs build side exceeds maxBuildRows=$maxBuildRows " +
        "rows; block the input (e.g. by id range) or pre-filter with an ANN " +
        "operator (AnnLsh/AnnIvf) so the exact kernel only runs inside buckets")
    val build = capped.sortBy(_._1)
    val norms = build.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((build, norms))

    // fan the probe side out across cores — the O(n²/2) kernel below is CPU
    // bound and a one-file scan arrives as a single partition
    rows
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (b, bn) = bc.value
        it.flatMap { case (aId, av) =>
          var s = 0.0
          var i = 0
          while (i < av.length) { s += av(i) * av(i); i += 1 }
          val an = math.sqrt(s)
          b.indices.iterator.flatMap { j =>
            val (bId, bv) = b(j)
            if (bId <= aId) None
            else {
              var dot = 0.0
              var k = 0
              while (k < av.length) { dot += av(k) * bv(k); k += 1 }
              val cos = dot / (an * bn(j))
              if (cos >= threshold) Some((aId, bId, cos)) else None
            }
          }
        }
      }
      .toDF("a_id", "b_id", "cos")
  }
}
