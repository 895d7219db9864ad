package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix aggregate (running max / running sum) — the
  * two-pass parallel scan that replaces a single unpartitioned window.
  *
  * `Window.orderBy(...)` with no partition key sorts the whole input on ONE
  * task: invisible at test scale, fatal at 100 TB. The textbook fix is the
  * two-pass prefix scan:
  *
  *   1. split the data into ORDER-ALIGNED blocks (the block key must be
  *      monotone in the window order and equal order keys must share a
  *      block); compute each block's local exclusive prefix aggregate — one
  *      window per (partition, block), all blocks in parallel;
  *   2. aggregate one total per block, prefix-scan those totals (a window
  *      over #blocks rows — smaller than the data by the block size), and
  *      broadcast-join the per-block offsets back. Merging the local prefix
  *      with the offset of all earlier blocks gives the exact global value.
  *
  * The input is scanned twice (offsets pass + local pass) — for a scan-cheap
  * source that beats caching or checkpointing it (measured repeatedly in
  * this repo: recompute < checkpoint at both test scales). The offset frame
  * is rows/blockSize: pick block granularity so it stays broadcastable
  * (at 100 TB: ~2^20-row blocks → a few thousand offset rows); a second
  * scan level over the offset frame drops in if one level ever isn't
  * enough.
  */
object PrefixScan {

  /** Adds `out` = exclusive prefix aggregate of `value` over
    * (PARTITION BY partitionCols ORDER BY order), computed blockwise in
    * parallel. `out` is null for a row with no earlier rows — callers
    * choose identity handling through `merge`.
    *
    * @param block monotone-in-`order` block id evaluated against `df`; rows
    *              with equal order keys MUST map to one block (derive it
    *              from the leading order expression)
    * @param agg   the associative aggregate (`max`, `sum`, ...) — applied to
    *              local windows, block totals, and the offset scan alike
    * @param merge combines (local prefix, earlier-block offset), either of
    *              which is null at a block/partition head — e.g. `greatest`
    *              for max, null-coalescing `+` for sum
    */
  def exclusive(
      df: DataFrame,
      partitionCols: Seq[String],
      block: Column,
      order: Seq[Column],
      value: Column,
      agg: Column => Column,
      merge: (Column, Column) => Column,
      out: String): DataFrame = {
    val blk = "__ps_blk"
    val keyed = df.withColumn(blk, block)
    val grpCols = (partitionCols :+ blk).map(col)
    val wLocal = Window.partitionBy(grpCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // pass 2: one total per block, then the SAME exclusive scan over the
    // tiny block-summary frame (per partition key, ordered by block id)
    val wOff = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(blk))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the merge join is NULL-SAFE (<=>): window partitioning groups NULL
    // keys into their own partition, so a NULL partition/block key must
    // match its offset row too — a plain equi-join would silently drop
    // those rows and diverge from the single-window form
    val joinKeys = partitionCols :+ blk
    val offsets = keyed.groupBy(grpCols: _*).agg(agg(value).as("__ps_tot"))
      .withColumn("__ps_off", agg(col("__ps_tot")).over(wOff))
      .select(joinKeys.map(k => col(k).as(s"__ps_r_$k")) :+ col("__ps_off"): _*)
    val cond = joinKeys.map(k => col(k) <=> col(s"__ps_r_$k")).reduce(_ && _)
    keyed
      .withColumn("__ps_loc", agg(value).over(wLocal))
      .join(broadcast(offsets), cond)
      .withColumn(out, merge(col("__ps_loc"), col("__ps_off")))
      .drop(joinKeys.map(k => s"__ps_r_$k") ++ Seq(blk, "__ps_loc", "__ps_off"): _*)
  }
}
