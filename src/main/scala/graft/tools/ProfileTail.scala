package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.normText
import graft.operators.MinHashLsh

/** Scratch stage-profiler for the true-sf1 variety tail (VERDICT r10 item 1):
  * times each stage of pipeline_corpus_clean / text_bigrams / stream_dedup /
  * dedup_exact in isolation so the growing stage is measured, not guessed.
  * Not part of any gate; run via
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileTail"`.
  */
object ProfileTail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()

    def time(name: String)(f: => Long): Unit = {
      // median of 3
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[profile] $name%-40s ${med}%8.3f s  rows=${ts.head._2}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // ── pipeline_corpus_clean stages ──
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
    time("pcc.normalize+quality")(quality.count())

    val hashed = quality.withColumn("h", md5(col("norm")))
    val keeperIds = hashed
      .select(col("doc_id"), col("h"))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id")).drop("h")
    time("pcc.exact-dedup-ids")(keeperIds.count())

    time("pcc.localCheckpoint") {
      hashed.join(keeperIds, Seq("doc_id"), "left_semi").drop("h").localCheckpoint().count()
    }
    val keepers = hashed.join(keeperIds, Seq("doc_id"), "left_semi").drop("h").localCheckpoint()

    val sh = keepers.select(
      col("doc_id"),
      MinHashLsh.shingles(split(col("norm"), " "), shingleSize = 3).as("sh"))
    // .head on the 1-row aggregate forces the projected expressions —
    // .count() would let Catalyst prune them away and time only the scan
    time("pcc.shingles")({ sh.select(sum(size(col("sh")))).head(); 1L })
    val fp = sh
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), md5(concat_ws("  ", array_sort(col("sh")))).as("fp"))
    time("pcc.fingerprint(sort+md5)")({ fp.select(sum(length(col("fp")))).head(); 1L })
    val keepIds = fp.groupBy("fp").agg(min(col("doc_id")).as("doc_id")).drop("fp")
    time("pcc.fp-groupBy")(keepIds.count())
    time("pcc.final-semijoin") {
      keepers.join(keepIds, Seq("doc_id"), "left_semi").count()
    }
    time("pcc.END-TO-END")(graft.SparkEntry.queries("pipeline_corpus_clean")(spark, sfDir).count())

    // ── text_bigrams ──
    time("bigrams.END-TO-END")(graft.SparkEntry.queries("text_bigrams")(spark, sfDir).count())
    val tkc = split(normText(col("text")), " ")
    time("bigrams.tokenize")(docs.select(sum(size(tkc))).count())
    val bigrams = zip_with(
      slice(tkc, lit(1), size(tkc) - 1),
      slice(tkc, lit(2), size(tkc) - 1),
      (x, y) => concat(x, lit(" "), y))
    val bg = docs.filter(size(tkc) >= 2).select(explode(bigrams).as("bigram"))
    time("bigrams.explode")(bg.count())
    time("bigrams.groupBy+topk") {
      bg.groupBy("bigram").agg(count(lit(1)).as("n")).orderBy(col("n").desc, col("bigram")).limit(20).count()
    }

    // ── stream_dedup / dedup_exact end-to-end for the record ──
    time("stream_dedup.END-TO-END")(graft.SparkEntry.queries("stream_dedup")(spark, sfDir).count())
    time("dedup_exact.END-TO-END")(graft.SparkEntry.queries("dedup_exact")(spark, sfDir).count())

    spark.stop()
  }
}
