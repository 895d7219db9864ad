package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the round-7 graph queries' edge build — which of
  * (distinct, pair join, support filter, iteration rounds) carries the
  * cost. Run: `sbt "runMain graft.tools.Prof7 /root/testdata/sf0.1"`.
  */
object Prof7 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val op = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    time("distinct (ok,pk)") { op.count() }
    val b = op.select(col("ok").as("ok2"), col("pk").as("pk2"))
    val pairs = op.join(b, col("ok") === col("ok2") && col("pk") < col("pk2"))
      .groupBy(col("pk").as("a_id"), col("pk2").as("b_id"))
      .agg(count(lit(1)).as("support"))
    time("pair groupBy (all supports)") { pairs.count() }
    val e = pairs.filter(col("support") >= 2).select(col("a_id"), col("b_id"))
    time("edges support>=2") { e.count() }
    val ec = e.localCheckpoint()
    time("recount checkpointed edges") { ec.count() }
    val sym = ec.union(ec.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .select(col("a_id").as("src"), col("b_id").as("dst")).localCheckpoint()
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("dg")).localCheckpoint()
    val n = deg.count()
    var pr = deg.select(col("node"), col("dg"), lit(1.0 / n).as("pr"))
    val t0 = System.nanoTime()
    (0 until 5).foreach { _ =>
      val contrib = sym.join(pr, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("pr") / col("dg")).as("cs"))
      pr = deg.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("dg"),
          (lit(0.15 / n) + lit(0.85) * coalesce(col("cs"), lit(0.0))).as("pr"))
        .localCheckpoint(eager = false)
    }
    time("5 pagerank rounds (lazy)") { pr.count() }
    spark.stop()
  }
}
