package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan + stage profile of one declared query at an arbitrary sfDir.
  * Run: `sbt "runMain graft.tools.Prof7b <query> <sfDir>"`.
  */
object Prof7b {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    val df = (graft.SparkEntry.queries ++ AbBench.variants)(name)(spark, d)
    val t0 = System.nanoTime()
    df.count()
    println(f"[prof] $name cold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    df.count()
    println(f"[prof] $name warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
