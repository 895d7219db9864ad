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
  * is rows/blockSize, and pass 2 broadcasts it — so block granularity must
  * GROW with the input. [[idBlockWidth]] derives it from the input's
  * estimated size (offset frame capped at ~16k rows at any scale); callers
  * with fixed value-range blocks (skyline, weighted median) are bounded by
  * their block-count constant instead. A second scan level over the offset
  * frame drops in if one level ever isn't enough.
  */
object PrefixScan {

  /** Row count below which the single-window form beats the two-pass scan.
    * Measured in BASELINE.md (round 8): at sf0.1 (~60k docs / 600k items)
    * the blockwise scan pays a 2.3–2.9× constant (two source scans + the
    * offset join); the crossover where one-task serialization overtakes it
    * sits around ~2M rows. The boundary region is flat — both forms are
    * within a small constant of each other for an order of magnitude around
    * it — so an order-of-magnitude row estimate is enough to choose.
    */
  val CrossoverRows: Long = 2000000L

  /** Catalyst's row estimate for a frame, without running a job: the
    * optimized plan's `rowCount` when the source provides one, else
    * `sizeInBytes` over an assumed bytes-per-row. File sources report bytes
    * (scaled by column pruning), not rows, so the fallback is order-of-
    * magnitude only — which is all the crossover choice needs (see
    * [[CrossoverRows]]); both candidate forms are row-identical, so a bad
    * estimate costs a constant, never correctness.
    *
    * assumedRowBytes is calibrated against the COMPRESSED, column-PRUNED
    * scan bytes the crossover callers actually see (round 15, measured on
    * the weighted-median 3-column lineitem projection): 8 B/row puts the
    * estimate at 0.6×/1.04×/1.12× of the true 0.6M/6M/60M rung counts,
    * where the previous 32 B/row sat ~4× UNDER — late enough that a 6M-row
    * input still chose the one-task-per-group single-window branch (A/B:
    * window 8.1 s vs blocked 6.9 s there). An OVER-estimate merely engages
    * the blocked branch early (measured ≤1.2× warm constant near the
    * boundary); an UNDER-estimate delays the scale-safe branch — so the
    * assumed bytes/row errs low.
    */
  def estimatedRows(df: DataFrame, assumedRowBytes: Long = 8L): Long = {
    val st = df.queryExecution.optimizedPlan.stats
    st.rowCount
      .map(_.min(BigInt(Long.MaxValue)).toLong)
      .getOrElse {
        val est = st.sizeInBytes / BigInt(assumedRowBytes)
        est.min(BigInt(Long.MaxValue)).max(BigInt(1)).toLong
      }
  }

  /** Block width for dense-id range blocks (`id div width`), derived from
    * the input's estimated size so the pass-2 offset frame stays
    * broadcastable at ANY input scale: width = max(minWidth,
    * ceil(estRows / maxBlocks)), so the offset frame holds ≤ ~maxBlocks
    * rows (16k × ~50 B ≈ 1 MB — comfortably under any broadcast limit)
    * instead of growing as rows/constant. Contract: ids must be dense-ish —
    * the block count is idRange/width, so a caller with ids far sparser
    * than their row count should size the width from the id RANGE instead.
    */
  def idBlockWidth(
      df: DataFrame,
      minWidth: Long = 256L,
      maxBlocks: Long = 1L << 14): Long = {
    val rows = estimatedRows(df)
    math.max(minWidth, (rows + maxBlocks - 1) / maxBlocks)
  }

  /** The single-window twin of [[exclusive]]: same semantics, one window —
    * the right form BELOW [[CrossoverRows]], where the two-pass constant
    * outweighs one-task serialization. `merge` sees a null offset (no
    * earlier blocks exist), so identity handling matches [[exclusive]].
    */
  def single(
      df: DataFrame,
      partitionCols: Seq[String],
      order: Seq[Column],
      value: Column,
      agg: Column => Column,
      merge: (Column, Column) => Column,
      out: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(out, merge(agg(value).over(w), lit(null)))
  }

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
