package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the ANN index amortization: fresh-fit query vs build-once vs
  * serve-only, same corpus, same query batch (round 18 BASELINE row).
  * Verification infrastructure — NOT part of the engine.
  * Usage: runMain graft.tools.ProbeAnnIndex <embDir> <indexDir> [reps]
  */
object ProbeAnnIndex {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-probe-ann-index")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = if (args.length > 2) args(2).toInt else 3

    val emb = graft.Tables.t(spark, args(0), "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val fresh = (1 to reps).map(_ =>
      time(graft.operators.AnnIvfPq.topKAdaptive(emb, q, 5).count()))
    val build = time(graft.operators.AnnIndex.buildAdaptive(emb, args(1)))
    val serve = (1 to reps).map(_ =>
      time(graft.operators.AnnIndex.serve(spark, args(1), emb, q, 5).count()))
    println(s"""{"metric":"ann_index","emb":"${args(0)}","reps":$reps,""" +
      s""""fresh_fit_query_sec":${med(fresh)},"build_once_sec":$build,""" +
      s""""serve_only_sec":${med(serve)},""" +
      s""""fresh_all":[${fresh.mkString(",")}],"serve_all":[${serve.mkString(",")}]}""")
    spark.stop()
  }
}
