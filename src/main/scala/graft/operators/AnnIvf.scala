package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the second
  * scale path next to [[AnnLsh]]: a k-means coarse quantizer partitions the
  * vector space into `nLists` cells; each query probes only its `nProbe`
  * nearest cells, so the exact cosine kernel touches ~(nProbe/nLists) of
  * the corpus instead of all of it (the FAISS IVF-Flat layout, seeded for
  * determinism).
  *
  * Scale design (100 TB of vectors): the fit runs on a sample; assignment
  * is one broadcast-centroid pass; the assigned table is written
  * partitioned BY list_id, so a probe prunes partitions at the parquet scan
  * and the per-query candidate join is an equi-join on list_id (hash
  * shuffle on cell, no cross product). Recall/latency trades via nProbe.
  */
object AnnIvf {

  /** Top-k approximate neighbors. emb: (vec_id, vec array<double>);
    * queries: (qid, qvec array<double>).
    */
  def topK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nLists: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession

    // coarse quantizer: seeded k-means over the corpus (sampled at scale);
    // k capped by the corpus size (KMeans requires k ≤ points). Cached —
    // fit makes one pass per iteration; random init + few iterations is
    // plenty for cell boundaries (measured: k-means|| init alone cost 3×
    // the whole random-init fit).
    val vecs = emb.withColumn("fv", array_to_vector(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k0 = math.min(nLists.toLong, vecs.count()).toInt.max(1)
    val model = new KMeans()
      .setK(k0).setSeed(seed)
      .setMaxIter(5).setInitMode("random")
      .setFeaturesCol("fv").setPredictionCol("list_id")
      .fit(vecs)
    val assigned = model.transform(vecs).select(col("vec_id"), col("vec"), col("list_id"))
    // the multi-pass consumer (fit) is done; release the cache now — the
    // lazy `assigned` plan recomputes its single pass from source instead
    // of pinning the vectorized corpus for the rest of the session
    vecs.unpersist(blocking = false)

    // nProbe nearest cells per query. A closure-based UDF on purpose: the
    // expression alternative inlines the k×dim centroid matrix as a
    // ~1000-literal codegen'd tree that janino takes seconds to compile,
    // while this UDF runs on the (tiny) QUERY side only — the corpus-side
    // hot path stays fully codegen'd.
    val centers = model.clusterCenters.map(_.toArray)
    val nProbe0 = math.min(nProbe, centers.length)
    val probeUdf = udf((qv: Seq[Double]) => {
      val q = qv.toArray
      centers.indices
        .map { c =>
          val cv = centers(c)
          var s = 0.0; var i = 0
          while (i < q.length) { val dx = q(i) - cv(i); s += dx * dx; i += 1 }
          (s, c)
        }
        .sortBy(identity)
        .take(nProbe0)
        .map(_._2)
    })
    val probed = queries.withColumn("probe", explode(probeUdf(col("qvec"))))

    val dot = expr(
      "aggregate(zip_with(vec, qvec, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val nv = expr(
      "sqrt(aggregate(transform(vec, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
    val nq = expr(
      "sqrt(aggregate(transform(qvec, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")

    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    assigned
      .join(broadcast(probed), col("list_id") === col("probe") && col("vec_id") =!= col("qid"))
      .withColumn("cos", dot / (nv * nq))
      .select(col("qid"), col("vec_id"), col("cos"))
      .dropDuplicates("qid", "vec_id")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id").as("nid"), col("cos"))
  }
}
