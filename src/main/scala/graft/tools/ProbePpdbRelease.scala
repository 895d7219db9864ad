package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Release-scale PPDB measurements (round 18, VERDICT r17 item 7) over the
  * ~GB synthetic multi-file .gz pack (tools/gen_ppdb_release.py):
  *
  *   1. raw-gz parse+aggregate — the one-glob scan; gzip is unsplittable so
  *      parallelism = file count (printed as the scan's task count)
  *   2. V2 pushdown — the same aggregate through format("ppdb") with a
  *      selective filter: the reader's pushdown skips feature tokenization
  *      for non-matching rows, measured against the no-filter scan
  *   3. convert-once amortization — ingest to zstd parquet, then the same
  *      aggregate off parquet: the per-query saving that pays back the
  *      one-time conversion
  *
  * Verification infrastructure — NOT part of the engine.
  * Usage: runMain graft.tools.ProbePpdbRelease [releaseDir] [outDir]
  */
object ProbePpdbRelease {
  def main(args: Array[String]): Unit = {
    val rel = if (args.nonEmpty) args(0) else "/tmp/ppdb_gb"
    val out = if (args.length > 1) args(1) else "/tmp/ppdb_gb_parquet"
    val spark = SparkSession.builder()
      .appName("graft-probe-ppdb-release")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val glob = s"$rel/*.txt.gz"
    val nFiles = new java.io.File(rel).listFiles().count(_.getName.endsWith(".txt.gz"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def j(name: String, sec: Double, extra: String = ""): Unit =
      println(f"""{"metric":"ppdb_release","step":"$name","sec":$sec%.2f$extra}""")

    // 1. raw gz: one glob scan, parse + aggregate; tasks = file count
    val raw = graft.ppdb.Ppdb.parse(spark, glob)
    val nPart = raw.rdd.getNumPartitions
    val ((nRows, avgScore), tRaw) = time {
      val r = raw.agg(count(lit(1)), avg(col("ppdb2score"))).head()
      (r.getLong(0), r.getDouble(1))
    }
    j("parse_gz_agg", tRaw,
      s""","rows":$nRows,"tasks":$nPart,"files":$nFiles,"lines_per_sec":${(nRows / tRaw).toLong}""")

    // 2. V2 pushdown: selective filter vs full through format("ppdb")
    val v2 = spark.read.format("ppdb").load(glob)
    val (_, tV2Full) = time(v2.agg(count(lit(1))).head())
    val (nSel, tV2Sel) = time(
      v2.filter(col("lhs") === "[JJ]" && col("ppdb2score") > 5.5)
        .agg(count(lit(1))).head().getLong(0))
    j("v2_full_agg", tV2Full)
    j("v2_pushdown_agg", tV2Sel, s""","selected":$nSel""")

    // 3. convert once, query parquet many times
    val (_, tConvert) = time(
      graft.sources.PpdbRelease.ingest(spark, glob, out,
        numPartitions = math.max(8, nFiles)))
    val pq = graft.sources.PpdbRelease.readIngested(spark, out)
    val (_, tPq1) = time(pq.agg(count(lit(1)), avg(col("ppdb2score"))).head())
    val (_, tPq2) = time(pq.filter(col("lhs") === "[JJ]" && col("ppdb2score") > 5.5)
      .agg(count(lit(1))).head())
    j("convert_once", tConvert)
    j("parquet_agg", tPq1, f""","amortize_after":${tConvert / math.max(0.01, tRaw - tPq1)}%.1f""")
    j("parquet_pushdown_agg", tPq2)
    spark.stop()
  }
}
