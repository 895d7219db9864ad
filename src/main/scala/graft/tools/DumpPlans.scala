package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the formatted physical plan of every declared query to one file
  * per key — the round-18 plan-audit corpus (plans/r18/<key>_<suffix>.txt).
  * Session config mirrors graft.Bench (local[cpus], shuffle.partitions =
  * cpus) so the dumped plans are the plans the bench actually runs.
  * Verification infrastructure — NOT part of the engine.
  *
  * Usage: runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> [keys]
  *   keys: optional comma-separated subset (default: all declared queries)
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val only = if (args.length > 3)
      Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-dump-plans")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    var nOk = 0
    var nErr = 0
    // AbBench twins resolve too (round 19): plan-diff evidence for an A/B
    // pair needs the reference form's plan, not just the declared key's
    (graft.SparkEntry.queries ++ AbBench.variants).toSeq.sortBy(_._1)
      .filter { case (n, _) => only.fold(graft.SparkEntry.queries.keySet)(identity).contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df  = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(mode)
          Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          nOk += 1
        } catch { case e: Throwable =>
          nErr += 1
          System.err.println(s"[dump-plans] $name FAILED: $e")
        }
      }
    println(s"[dump-plans] wrote $nOk plans to $outDir (suffix=$suffix, failed=$nErr)")
    spark.stop()
  }
}
