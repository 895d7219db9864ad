package graft

/** Shared brute-force top-5 ground truth at the embedding-only rungs
  * (/tmp/emb4m, /tmp/emb16m): every big-rung ANN recall gate (two-level
  * IVF in Round13Spec, the PQ family in AnnPqSpec, the 16M ladder in
  * Round17Spec) compares against the SAME exact result, so each rung's
  * brute-force pass (42M cosines at 4.2M vectors, 160M at 16M) runs once
  * per suite JVM instead of once per gate.
  *
  * The cache is keyed on the corpus DIRECTORY (ADVICE r16): a
  * path-agnostic singleton would silently serve 4.2M ground truth to a
  * 16M gate — exactly the stale-comparison bug the advisor flagged.
  */
object Emb4mExact {

  private val cached = scala.collection.mutable.Map.empty[String, Map[Long, Set[Long]]]

  def top5(spark: org.apache.spark.sql.SparkSession,
           dir: String = "/tmp/emb4m"): Map[Long, Set[Long]] = synchronized {
    cached.getOrElseUpdate(dir, {
      SparkEntry.queries("sim_knn_cosine")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, a) => (q, a.map(_._2).toSet) }
    })
  }
}
