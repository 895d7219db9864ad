package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnose IVF-PQ's 16M recall gap (round 18, VERDICT r17 item 6):
  * recall@5 at /tmp/emb16m read 0.940 while its parents read 0.980. Two
  * candidate remedies at comparable extra cost, measured against the same
  * brute-force ground truth with per-variant wall clock:
  *
  *   base     — the shipped rule: √½ probe per level, rerank ⌈√n⌉
  *   subwide  — probe wider inside probed L1 cells (subProbeFrac 0.71→0.85,
  *              probed fraction ½ → ~0.60): recovers neighbors lost to
  *              CELL-BOUNDARY pruning
  *   rerank2x — same probing, rerank 2·⌈√n⌉: recovers neighbors that ARE
  *              probed but sunk below the re-rank cut by QUANTIZATION noise
  *
  * Whichever restores ≥ 0.96 ships (or the measured negative is recorded).
  * Verification infrastructure — NOT part of the engine.
  * Usage: runMain graft.tools.ProbeIvfPq16m [embDir]
  */
object ProbeIvfPq16m {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/emb16m"
    val spark = SparkSession.builder()
      .appName("graft-probe-ivfpq16m")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val n = emb.count()
    val p = graft.operators.AnnIvfPq.paramsFor(n)
    require(p.twoLevel, s"n=$n sits below the clamp; this probe targets the two-level path")
    println(s"n=$n l1=${p.l1} k2=${p.k2} m=${p.m} kSub=${p.kSub} rerank=${p.rerank}")

    val t0 = System.nanoTime()
    val exact = graft.SparkEntry.queries("sim_knn_cosine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (qq, a) => (qq, a.map(_._2).toSet) }
    println(f"ground truth: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (qq, a) => (qq, a.map(_._2).toSet) }
      val rs = exact.map { case (qq, ex) =>
        approx.getOrElse(qq, Set.empty[Long]).intersect(ex).size / ex.size.toDouble
      }
      rs.sum / rs.size
    }
    def run(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      val r = recallOf(df)
      println(f"""{"variant":"$name","recall5":$r%.3f,"wall_sec":${(System.nanoTime() - t) / 1e9}%.1f}""")
    }

    run("base")(graft.operators.AnnIvfPq.topK2Level(emb, q, 5,
      l1 = p.l1, k2 = p.k2, m = p.m, kSub = p.kSub, rerank = p.rerank))
    run("subwide")(graft.operators.AnnIvfPq.topK2Level(emb, q, 5,
      l1 = p.l1, k2 = p.k2, m = p.m, kSub = p.kSub, rerank = p.rerank,
      subProbeFrac = 0.85))
    run("rerank2x")(graft.operators.AnnIvfPq.topK2Level(emb, q, 5,
      l1 = p.l1, k2 = p.k2, m = p.m, kSub = p.kSub, rerank = 2 * p.rerank))
    spark.stop()
  }
}
