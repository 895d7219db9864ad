package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (Charikar 2002; the banded candidate
  * scheme follows Manku, Jain, Das Sarma, "Detecting Near-Duplicates for Web
  * Crawling", WWW 2007).
  *
  * A 60-bit signature per document: each token hashes to 60 bits (first 15
  * hex chars of md5 — chosen over xxhash64 so the DuckDB oracle can compute
  * the identical value); bit j of the signature is the sign of
  * Σ_tokens (2·bit_j(h) − 1). Near-dups have small Hamming distance.
  *
  * Candidate generation is exact, not probabilistic: the 60 bits split into
  * 4 bands of 15; by pigeonhole, any pair with Hamming ≤ 3 agrees on at
  * least one whole band, so joining on (band_idx, band_value) finds ALL such
  * pairs while only materializing bucket collisions — the published
  * web-scale design. Shuffle bytes are (id, 8-byte signature), never text.
  */
object SimHash {

  val Bits = 60
  val Bands = 4
  val BandBits: Int = Bits / Bands // 15

  /** (id, simhash) signatures from a token-array column. Pure relational
    * formulation (explode → two partial-aggregating groupBys) so the same
    * SQL runs on any engine and all arithmetic is exact integer math.
    */
  def signatures(df: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    // fan out before the token×60-bit explode (a one-file scan would run it
    // on a single core); partitioning by id also pre-aligns both groupBys
    val par = df.sparkSession.sparkContext.defaultParallelism
    val toks = df.repartition(par, col(idCol))
      .select(col(idCol).as("id"), explode(col(tokensCol)).as("tok"))
    val hashed = toks.select(
      col("id"),
      conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val bitSums = hashed
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(Bits - 1))).as("j"))
      .groupBy("id", "j")
      .agg(
        sum(
          when(expr("(shiftright(h, j) & 1) = 1"), 1L).otherwise(-1L)).as("s"))
    bitSums
      .groupBy("id")
      .agg(
        sum(
          when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
          .as("simhash"))
  }

  /** All pairs (a_id < b_id) with Hamming(simhash) ≤ maxHamming, found via
    * the 4-band pigeonhole join. Requires maxHamming < Bands.
    */
  def nearPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < Bands, s"pigeonhole needs maxHamming < $Bands bands")
    val mask = (1L << BandBits) - 1L
    val banded = sigs.select(
      col("id"), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), k -> shiftright(simhash, $BandBits * k) & ${mask}L)")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")

    val a = banded.select(
      col("band_idx"), col("band_val"), col("id").as("a_id"), col("simhash").as("a_sig"))
    val b = banded.select(
      col("band_idx").as("bk"), col("band_val").as("bv"),
      col("id").as("b_id"), col("simhash").as("b_sig"))

    a.join(b, col("band_idx") === col("bk") && col("band_val") === col("bv") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_sig ^ b_sig)").cast("long").as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }
}
