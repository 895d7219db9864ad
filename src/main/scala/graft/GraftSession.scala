package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory — the engine's recommended configuration in one
  * place, so library users get the same semantics the verification gates run
  * under.
  *
  * What it pins and why:
  *  - UTC session timezone: event-time parity (all oracle checks assume it);
  *  - shuffle partitions sized to the parallelism (not Spark's default 200 —
  *    at local/cluster-small scale, 200 tiny partitions just add scheduling
  *    overhead; at real scale, set explicitly per job);
  *  - AQE on (default in 4.x, pinned here against env drift): runtime
  *    coalescing, skew-join splitting, broadcast demotion;
  *  - nanosAsLong: legacy-generation events files (INT64 TIMESTAMP(NANOS))
  *    read as raw ns longs instead of throwing; harmless on the current
  *    timestamp[us] files (Tables.events adapts to either schema);
  *  - the graft extension functions (ppdb_split) registered.
  */
object GraftSession {

  /** Local session with `cores` threads (tests, notebooks, single node). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()

  /** Apply the engine configuration to any builder (cluster submits). */
  def configure(b: SparkSession.Builder, parallelism: Int): SparkSession.Builder =
    b.appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
}
