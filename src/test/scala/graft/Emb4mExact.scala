package graft

/** Shared brute-force top-5 ground truth at the 4.2M-vector rung
  * (/tmp/emb4m): both big-rung ANN recall gates (two-level IVF in
  * Round13Spec, PQ in AnnPqSpec) compare against the SAME exact result, so
  * the 42M-cosine brute-force pass runs once per suite JVM instead of once
  * per gate.
  */
object Emb4mExact {

  private var cached: Option[Map[Long, Set[Long]]] = None

  def top5(spark: org.apache.spark.sql.SparkSession): Map[Long, Set[Long]] = synchronized {
    cached.getOrElse {
      val m = SparkEntry.queries("sim_knn_cosine")(spark, "/tmp/emb4m")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, a) => (q, a.map(_._2).toSet) }
      cached = Some(m)
      m
    }
  }
}
