package graft.ppdb

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native parser for the public PPDB release format — the reference's
  * (mauryquijada/ppdb-parser) core capability, re-expressed as a declarative
  * DataFrame pipeline instead of a line-at-a-time loop.
  *
  * Format (Ganitkevitch, Van Durme, Callison-Burch, "PPDB: The Paraphrase
  * Database", NAACL-HLT 2013; Pavlick et al., ACL 2015 for PPDB 2.0):
  * gzipped flat text, one rule per line, ` ||| `-delimited:
  * {{{
  *   LHS ||| phrase ||| paraphrase ||| key=value ... ||| i-j i-j ... ||| EntailmentLabel
  * }}}
  *
  * Scale design (100 TB): gzip is a NON-SPLITTABLE codec — Spark schedules
  * exactly one task per .gz file. PPDB releases ship as many files, so a
  * directory glob parallelizes per-file; after the one-pass parse the plan
  * should `repartition(n)` and persist to parquet/zstd so the gzip scan is
  * never paid twice (SURVEY.md §2.1). The split/extract below is a pure
  * Catalyst projection: whole-stage-codegen'd, no UDFs, columns prune.
  */
object Ppdb {
  val FixturePath = "/root/repo/fixtures/ppdb_sample.txt.gz"

  /** Typed record for the Dataset surface. */
  case class PpdbRule(
      lhs: String,
      phrase: String,
      paraphrase: String,
      features: Map[String, Double],
      alignment: Seq[(Int, Int)],
      entailment: String)

  /** Raw 6-field parse plus the PPDB2.0Score ranking key (ACL 2015) widened
    * to a double column — the one feature the reference ranks lookups by.
    *
    * The split stays on the built-in regex `split`: SURVEY.md §4 flagged a
    * custom one-pass splitter as the only candidate native expression "if
    * bench demands it" — it was built ([[graft.plans.PpdbSplitLine]],
    * `ppdb_split` via GraftExtensions), measured on 240k lines, and the
    * warm JVM regex on a literal pattern was ~equal-or-faster, so the
    * built-in wins on simplicity. The custom expression remains as the
    * engine's documented Catalyst extension surface.
    */
  def parse(spark: SparkSession, path: String = FixturePath): DataFrame = {
    val f = split(col("value"), " \\|\\|\\| ")
    spark.read
      .text(path)
      .select(
        f.getItem(0).as("lhs"),
        f.getItem(1).as("phrase"),
        f.getItem(2).as("paraphrase"),
        f.getItem(3).as("features_raw"),
        f.getItem(4).as("alignment"),
        f.getItem(5).as("entailment"))
      .withColumn(
        "ppdb2score",
        element_at(str_to_map(col("features_raw"), lit(" "), lit("=")), "PPDB2.0Score")
          .cast("double"))
  }

  /** Fully-typed surface: features as Map[String,Double], alignment as
    * (src,tgt) int pairs. `Dataset[PpdbRule]` for callers that want
    * compile-time schemas; the DataFrame from [[parse]] for SQL.
    */
  def rules(spark: SparkSession, path: String = FixturePath): Dataset[PpdbRule] = {
    import spark.implicits._
    parse(spark, path)
      .select(
        col("lhs"),
        col("phrase"),
        col("paraphrase"),
        transform_values(
          str_to_map(col("features_raw"), lit(" "), lit("=")),
          (_, v) => v.cast("double")).as("features"),
        transform(
          split(col("alignment"), " "),
          p =>
            struct(
              split(p, "-").getItem(0).cast("int").as("_1"),
              split(p, "-").getItem(1).cast("int").as("_2"))).as("alignment"),
        col("entailment"))
      .as[PpdbRule]
  }

  /** Widen chosen feature keys from the dynamic map into typed double
    * columns (the "hot scoring keys" layout from SURVEY.md §1.1): map access
    * per row is fine for ad-hoc queries, but a scoring pipeline that touches
    * the same keys everywhere wants real columns — they prune, push down,
    * and store column statistics in parquet. Column name = key with
    * non-alphanumerics underscored (`p(e|f)` → `p_e_f_`).
    */
  def withFeatureColumns(df: DataFrame, keys: Seq[String]): DataFrame = {
    val m = str_to_map(col("features_raw"), lit(" "), lit("="))
    keys.foldLeft(df) { (acc, k) =>
      acc.withColumn(k.replaceAll("[^A-Za-z0-9]", "_"), element_at(m, k).cast("double"))
    }
  }

  /** DuckDB-side twin of [[parse]] as a CTE named `ppdb` (oracle recipe
    * validated: 1-byte sentinel delimiter that never occurs, so each line
    * lands whole in `column0`; gzip decompression is automatic).
    */
  /** DuckDB twin of `parse` over any path/glob (read_csv accepts globs, so
    * the multi-file pack oracles through the same CTE).
    */
  def oracleCte(path: String): String =
    s"""WITH ppdb AS (
       |  SELECT f[1] AS lhs, f[2] AS phrase, f[3] AS paraphrase,
       |         f[4] AS features_raw, f[5] AS alignment, f[6] AS entailment,
       |         CAST(regexp_extract(f[4], 'PPDB2\\.0Score=([-+]?[0-9.]+([eE][-+]?[0-9]+)?)', 1) AS DOUBLE) AS ppdb2score
       |  FROM (SELECT string_split(column0, ' ||| ') AS f
       |        FROM read_csv('$path',
       |                      delim=e'\\x01', header=false, quote='', escape='',
       |                      columns={'column0': 'VARCHAR'}))
       |)""".stripMargin

  val OracleCte: String = oracleCte(FixturePath)

  /** 4-part .gz pack of the same rules (FIXTURES.md): gzip is unsplittable,
    * so this glob's scan parallelism = 4 — one task per part.
    */
  val MultiFixtureDir = "/root/repo/fixtures/ppdb_multi"

  /** Release-size ladder (round 11): S ⊂ M ⊂ L ⊂ XL packs, each the top-k
    * score-ranked prefix of the rule list — the shape real PPDB releases
    * ship in (score-pruned pack sizes S→XXXL).
    */
  val ReleaseDir = "/root/repo/fixtures/ppdb_release"

  /** [[parse]] plus per-file lineage: `pack` is the release-size tag cut
    * from the source FILE NAME via the `_metadata` hidden column (the
    * engine's per-file lineage surface, same mechanism as `scan_metadata`).
    * One glob scan; every pack parses in the same job, one task per .gz.
    */
  def parseWithPack(spark: SparkSession, dir: String = ReleaseDir): DataFrame = {
    val f = split(col("value"), " \\|\\|\\| ")
    spark.read
      .text(s"$dir/*.txt.gz")
      .select(
        regexp_extract(col("_metadata.file_name"), "ppdb-2\\.0-([a-z]+)\\.txt\\.gz", 1)
          .as("pack"),
        f.getItem(0).as("lhs"),
        f.getItem(1).as("phrase"),
        f.getItem(2).as("paraphrase"),
        f.getItem(3).as("features_raw"),
        f.getItem(5).as("entailment"))
      .withColumn(
        "ppdb2score",
        element_at(str_to_map(col("features_raw"), lit(" "), lit("=")), "PPDB2.0Score")
          .cast("double"))
  }

  /** DuckDB twin of [[parseWithPack]]: `filename=true` is read_csv's
    * per-file lineage column, mirroring Spark's `_metadata.file_name`.
    */
  def oracleCteWithPack(dir: String = ReleaseDir): String =
    s"""WITH ppdb AS (
       |  SELECT regexp_extract(fn, 'ppdb-2\\.0-([a-z]+)\\.txt\\.gz', 1) AS pack,
       |         f[1] AS lhs, f[2] AS phrase, f[3] AS paraphrase,
       |         f[4] AS features_raw, f[6] AS entailment,
       |         CAST(regexp_extract(f[4], 'PPDB2\\.0Score=([-+]?[0-9.]+([eE][-+]?[0-9]+)?)', 1) AS DOUBLE) AS ppdb2score
       |  FROM (SELECT string_split(column0, ' ||| ') AS f, filename AS fn
       |        FROM read_csv('$dir/*.txt.gz',
       |                      delim=e'\\x01', header=false, quote='', escape='',
       |                      filename=true,
       |                      columns={'column0': 'VARCHAR'}))
       |)""".stripMargin
}
