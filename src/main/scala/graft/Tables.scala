package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata (TESTDATA.md): one parquet file per table
  * under `$sfDir/`. All queries go through here so scan behavior (vectorized
  * parquet reader, pushdown, pruning) is uniform.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS), which Spark 4.1.2
    * rejects with PARQUET_TYPE_ILLEGAL (SURVEY.md §1.2). Read ns as raw long
    * via `spark.sql.legacy.parquet.nanosAsLong` and derive `ts_us` (BIGINT
    * µs, integer floor-div) — exactly the µs value DuckDB sees when it
    * truncates ns→µs on read (validated: both engines agree). Every
    * event-time comparison/ordering/output in the engine uses `ts_us`, never
    * raw ns, so oracle parity holds at µs precision.
    *
    * The conf is set inside this reader because the driver's Verify/Bench
    * sessions do not set it (SURVEY.md §5.3); it is runtime-settable.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events").withColumn("ts_us", expr("ts div 1000"))
  }

  /** Normalized document text: lower → trim → collapse internal whitespace.
    * Twin of the DuckDB oracle `regexp_replace(trim(lower(text)), '\s+', ' ', 'g')`.
    */
  def normText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Oracle-side twin of [[normText]]. */
  def normTextSql(c: String): String =
    s"regexp_replace(trim(lower($c)), '\\s+', ' ', 'g')"

  /** Parity-safe rounding for PER-ROW doubles: floor(x·10ⁿ + 0.5)/10ⁿ.
    *
    * Spark's `round` rounds the shortest decimal representation
    * (BigDecimal.valueOf → HALF_UP) while DuckDB rounds the binary value, so
    * a product that prints as 38969.325 rounds to .33 on one engine and .32
    * on the other. This formula is the same IEEE op sequence on both
    * engines, hence bit-identical when the operands are bit-identical (true
    * for all per-row expressions). Aggregate outputs keep builtin `round` —
    * their operands already differ by summation order across engines, so no
    * rounding scheme removes that (tolerance comes from the round digits).
    */
  def rd(c: org.apache.spark.sql.Column, digits: Int): org.apache.spark.sql.Column = {
    val m = math.pow(10, digits)
    floor(c * m + 0.5) / m
  }

  /** Oracle-side twin of [[rd]]. */
  def rdSql(x: String, digits: Int): String = {
    val m = math.pow(10, digits)
    s"floor(($x) * $m + 0.5) / $m"
  }
}
