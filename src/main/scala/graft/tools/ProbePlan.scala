package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one declared query — plan-audit
  * probe (e.g. verifying the round-18 order-first rewrite keeps the
  * expensive projection ABOVE the sort so the range-boundary sampler only
  * sees the slim scan). Verification infrastructure — NOT part of the
  * engine. Usage: runMain graft.tools.ProbePlan <sfDir> <key>
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-probe-plan")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    println(s"=== ${args(1)} ===")
    df.explain("formatted")
    spark.stop()
  }
}
