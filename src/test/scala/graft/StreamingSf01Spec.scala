package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingJobs

/** TRUE Structured Streaming at the driver's bench scale (VERDICT r10
  * item 6): the sf0.1 events table (100k rows) is laid out as a
  * time-ordered multi-file landing zone and replayed as a REAL multi-batch
  * file-source stream (maxFilesPerTrigger throttling); the streaming
  * tumbling and merging-session aggregations must then agree with their
  * batch twins over the same rows. This is the scale rung above
  * StreamingSpec's fixture-sized gates: cross-batch state (windows and
  * sessions spanning trigger boundaries) and watermark advancement are
  * exercised over the full sf0.1 event history.
  *
  * Landing layout: events sorted by ts and cut into 8 contiguous slices
  * (one parquet file each, written in order) + a far-future one-row
  * sentinel file (user_id = -1, real max ts + 400 days) written LAST. The
  * slices are event-time-ordered, so the 10-minute watermark never drops a
  * real row; the sentinel advances the final watermark past every real
  * session, flushing append-mode session state (it is filtered from every
  * comparison).
  */
class StreamingSf01Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"

  private lazy val landing: String = {
    val land = java.nio.file.Files.createTempDirectory("land-sf01").toString
    val src = spark.read.parquet(s"$sfDir/events.parquet")
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val sliced = src.withColumn("slice", ntile(8).over(w)).localCheckpoint()
    (1 to 8).foreach { i =>
      sliced.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.mode("append").parquet(land)
    }
    sliced.filter(col("slice") === 1).drop("slice").limit(1)
      .withColumn("ts", col("ts") + expr("INTERVAL 400 DAYS"))
      .withColumn("user_id", lit(-1L))
      .coalesce(1).write.mode("append").parquet(land)
    land
  }

  private def runStream(
      out: org.apache.spark.sql.DataFrame, name: String, mode: OutputMode): Int = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(300000)
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
  }

  test("multi-batch file stream: tumbling windows match the batch twin over sf0.1") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val stream = StreamingJobs.eventsFileStream(spark, landing, maxFilesPerTrigger = 2)
    val batches = runStream(StreamingJobs.tumbling(stream), "sf01tumb", OutputMode.Update)
    assert(batches >= 3, s"expected a genuinely multi-batch run, got $batches batches")
    // update mode re-emits a window each batch it changes; n only grows, so
    // the final state of each key is its max-n row
    val got = spark.table("sf01tumb")
      .groupBy(col("ws"), col("event_type"))
      .agg(max(struct(col("n"), col("sum_v"))).as("m"))
      .select(col("ws"), col("event_type"), col("m.n").as("n"), col("m.sum_v").as("sum_v"))
    val expected = SparkEntry.queries("stream_tumbling")(spark, sfDir)
    val maxWs = expected.agg(max(unix_micros(col("ws")))).head().getLong(0)
    val gotReal = got.filter(unix_micros(col("ws")) <= maxWs) // drop the sentinel's window
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sortBy(_.toString)
    val exp = expected
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sortBy(_.toString)
    assert(gotReal.length === exp.length, "window count differs from the batch twin")
    assert(gotReal.toSeq === exp.toSeq)
    // sums agree to rounding (streaming side is unrounded; summation order differs)
    val gotSums = spark.table("sf01tumb")
      .groupBy(col("ws"), col("event_type"))
      .agg(max(struct(col("n"), col("sum_v"))).as("m"))
      .filter(unix_micros(col("ws")) <= maxWs)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getStruct(2).getDouble(1))).toMap
    val expSums = expected.collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(3))).toMap
    expSums.foreach { case (k, v) =>
      assert(math.abs(gotSums(k) - v) < 1e-4, s"sum_v diverged for $k")
    }
  }

  test("multi-batch file stream: sliding windows match the batch twin over sf0.1") {
    // round 16, the 5th end-to-end gate: the OVERLAPPING-window aggregation
    // (1h windows sliding by 30min — every event lives in exactly 2
    // windows) replayed multi-batch. The batch twin (`stream_sliding`)
    // buckets via explicit epoch arithmetic, the streaming side via the
    // builtin window(…, '1 hour', '30 minutes'); both are epoch-aligned,
    // so (window-start epoch, event_type, n) must agree key-for-key.
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val stream = StreamingJobs.eventsFileStream(spark, landing, maxFilesPerTrigger = 2)
    val batches = runStream(StreamingJobs.sliding(stream), "sf01slide", OutputMode.Update)
    assert(batches >= 3, s"expected a genuinely multi-batch run, got $batches batches")
    val expected = SparkEntry.queries("stream_sliding")(spark, sfDir)
    val maxWs = expected.agg(max(col("ws_epoch"))).head().getLong(0)
    // update mode re-emits a window each batch it changes; final state of a
    // key is its max-n row (the tumbling-gate reading)
    val got = spark.table("sf01slide")
      .select(expr("unix_micros(ws) div 1000000").as("ws_epoch"),
        col("event_type"), col("n"), col("sum_v"))
      .groupBy(col("ws_epoch"), col("event_type"))
      .agg(max(struct(col("n"), col("sum_v"))).as("m"))
      .filter(col("ws_epoch") <= maxWs) // drop the sentinel's windows
      .select(col("ws_epoch"), col("event_type"), col("m.n").as("n"), col("m.sum_v").as("sum_v"))
    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_.toString)
    val expRows = expected.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_.toString)
    assert(gotRows.length === expRows.length, "window count differs from the batch twin")
    assert(gotRows.toSeq === expRows.toSeq)
    // sums agree to rounding (streaming side is an unrounded double sum)
    val gotSums = got.collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getDouble(3))).toMap
    expected.collect().foreach { r =>
      val k = (r.getLong(0), r.getString(1))
      assert(math.abs(gotSums(k) - r.getDouble(3)) < 1e-4, s"sum_v diverged for $k")
    }
  }

  test("multi-batch file stream: watermarked stream-stream join matches the batch twin over sf0.1") {
    // VERDICT r11 item 8: the view→purchase interval join (both sides
    // watermarked, event time bounded on BOTH ends so state stores evict)
    // replayed as a real multi-batch stream must produce exactly the pairs
    // the batch twin (`stream_join`) counts. Views from early batches must
    // match purchases arriving several batches later — cross-batch join
    // state is the thing under test. The sentinel row is one event of one
    // type for user -1, so it can contribute no pair; it only flushes
    // nothing here (inner joins emit on match, not on watermark) but keeps
    // the landing layout shared across the suite's three gates.
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val stream = StreamingJobs.eventsFileStream(spark, landing, maxFilesPerTrigger = 2)
    val batches = runStream(
      StreamingJobs.viewPurchaseJoin(stream), "sf01join", OutputMode.Append)
    assert(batches >= 3, s"expected a genuinely multi-batch run, got $batches batches")
    val got = spark.table("sf01join")
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val exp = SparkEntry.queries("stream_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.length === exp.length,
      s"user count differs: streaming ${got.length} vs batch ${exp.length}")
    assert(got.toSeq === exp.toSeq)
  }

  test("multi-batch file stream: watermarked dedup first-arrivals match the batch twin over sf0.1") {
    // VERDICT r15 item 7: stream_dedup's streaming face
    // (dropDuplicatesWithinWatermark) through the real file source. The
    // streaming operator keeps the first ARRIVAL per (user_id, event_type)
    // and re-admits a key once the watermark evicts its state, so over a
    // month of events it legitimately emits MORE rows than the batch
    // keep-first twin — the equality that must hold is on the GLOBAL first
    // event per key: the true first row is always an emission (state is
    // empty when it arrives), so min(struct(ts_us, event_id)) over the
    // streamed output must equal the batch twin row FOR EVERY KEY, and the
    // key sets must match. Determinism of "first arrival within a batch":
    // maxFilesPerTrigger=1 makes each micro-batch one single-partition
    // file whose rows are (ts, event_id)-sorted by the landing layout, so
    // same-key rows reach the dedup state in event-time order.
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val stream = StreamingJobs.eventsFileStream(spark, landing, maxFilesPerTrigger = 1)
    val deduped = StreamingJobs.dedupWithinWatermark(
      stream, keys = Seq("user_id", "event_type"))
    val batches = runStream(deduped, "sf01dedup", OutputMode.Append)
    assert(batches >= 5, s"expected a genuinely multi-batch run, got $batches batches")
    val got = spark.table("sf01dedup")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("tsx")).as("ts_us"), col("event_id"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts_us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts_us").as("ts_us"), col("m.event_id").as("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sorted
    val exp = SparkEntry.queries("stream_dedup")(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sorted
    assert(got.length === exp.length,
      s"key count differs: streaming ${got.length} vs batch ${exp.length}")
    assert(got.toSeq === exp.toSeq)
  }

  test("multi-batch file stream: merging session windows match the batch twin over sf0.1") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val stream = StreamingJobs.eventsFileStream(spark, landing, maxFilesPerTrigger = 2)
    val batches = runStream(StreamingJobs.sessions(stream), "sf01sess", OutputMode.Append)
    assert(batches >= 3, s"expected a genuinely multi-batch run, got $batches batches")
    // append mode emits a session once the watermark passes it; the sentinel
    // flushed everything real. Batch twin emits (user_id, session_start
    // micros, n_events).
    val got = spark.table("sf01sess")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), unix_micros(col("session_start")).as("session_start"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val exp = SparkEntry.queries("stream_session_window")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.length === exp.length,
      s"session count differs: streaming ${got.length} vs batch ${exp.length}")
    assert(got.toSeq === exp.toSeq)
    // and against the OTHER batch formulation (VERDICT r12 item 7):
    // stream_session's gaps-and-islands window form — three independent
    // computations (streaming merge-state, batch session_window, batch
    // windowed islands) landing on one fixpoint at sf0.1
    val islands = SparkEntry.queries("stream_session")(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq === islands.toSeq,
      "streaming sessions must also match the gaps-and-islands batch twin")
  }

  test("multi-batch file stream: windowed top-k matches the batch twin over sf0.1") {
    // VERDICT r16 item 8a: stream_topk_windowed's streaming face. Ranking
    // is not an incremental streaming operator — the production shape is
    // the watermarked windowed count agg emitting updates, with the top-k
    // rank applied downstream of the emission (foreachBatch / the serving
    // layer). The cross-batch part under test is the windowed counts; the
    // spec then applies the DECLARED key's exact rank to the final state
    // and requires row-for-row agreement with the batch key.
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    val stream = StreamingJobs.eventsFileStream(spark, landing, maxFilesPerTrigger = 2)
    val batches = runStream(StreamingJobs.tumbling(stream), "sf01topk", OutputMode.Update)
    assert(batches >= 3, s"expected a genuinely multi-batch run, got $batches batches")
    val expected = SparkEntry.queries("stream_topk_windowed")(spark, sfDir)
    val maxWs = expected.agg(max(unix_micros(col("ws")))).head().getLong(0)
    val finalCounts = spark.table("sf01topk")
      .groupBy(col("ws"), col("event_type"))
      .agg(max(col("n")).as("n")) // update mode: final state of a key = max-n row
      .filter(unix_micros(col("ws")) <= maxWs) // drop the sentinel's window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ws").orderBy(col("n").desc, col("event_type"))
    val got = finalCounts
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 2)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.toString)
    val exp = expected
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.toString)
    assert(got.length === exp.length, "top-k row count differs from the batch twin")
    assert(got.toSeq === exp.toSeq)
  }

  test("multi-batch file stream: stream_late_drop's watermark log matches MicroBatchExecution's") {
    // VERDICT r16 item 8b: stream_late_drop's streaming face. The batch key
    // MODELS the between-batch watermark update over a deterministic
    // arrival displacement (event_id % 100 == 7 arrives 1500 positions
    // late; micro-batch = arrival position div 1000). Here the same
    // displacement replays through the REAL file source — one landing file
    // per modeled batch, maxFilesPerTrigger=1 — into a watermarked
    // aggregation keyed on the event-time column itself (so lateness is
    // decided by ROW time, not window membership). Two exact pins:
    //
    //  1. THE DECLARED KEY'S WATERMARK LOG IS THE ENGINE'S: the
    //     `watermark_us` column (running max event time of PRIOR batches
    //     − 1h) must equal, batch for batch, the watermark
    //     MicroBatchExecution itself reports in each batch's progress
    //     (ms-truncated — EventTimeStatsAccum tracks µs/1000).
    //  2. THE DROP COUNTS, at the engine's own cadence: the value the
    //     engine FILTERS batch b with is the watermark PUBLISHED in batch
    //     b−1's progress (the post-batch update becomes effective one
    //     batch later — measured here: batch 2 dropped exactly the rows
    //     below max(batch 0) − 1h, not max(batch 1) − 1h). The spec
    //     recomputes the model at that cadence and requires EXACT
    //     per-batch equality with numRowsDroppedByWatermark. (Every ts in
    //     the corpus is distinct and no row sits on a ms boundary, so
    //     row-vs-key counting and ≤-vs-< edge semantics cannot blur this.)
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    // arrival-ordered landing: one file per modeled micro-batch b, written
    // in b order (the suite's landing layout discipline)
    val land = java.nio.file.Files.createTempDirectory("land-arrival").toString
    val src = spark.read.parquet(s"$sfDir/events.parquet")
    val withB = src.withColumn("b",
      expr("(event_id + if(event_id % 100 = 7, 1500, 0)) div 1000")).localCheckpoint()
    val bs = withB.select("b").distinct().orderBy("b").collect().map(_.getLong(0))
    bs.foreach { b =>
      withB.filter(col("b") === b).drop("b").coalesce(1).write.mode("append").parquet(land)
    }
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", bs.length + 16)
    val stream = StreamingJobs.eventsFileStream(spark, land, maxFilesPerTrigger = 1)
    val agg = stream
      .withWatermark("tsx", "1 hour") // = the key's LatenessUs
      .groupBy(col("tsx")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sf01late")
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
      .start()
    val progress = try {
      q.awaitTermination(300000)
      q.recentProgress.filter(_.numInputRows > 0)
        .map(p => (p.numInputRows,
          p.stateOperators.headOption.map(_.numRowsDroppedByWatermark).getOrElse(0L),
          java.time.Instant.parse(p.eventTime.get("watermark")).toEpochMilli))
        .toSeq
    } finally q.stop()
    assert(progress.length === bs.length,
      s"expected ${bs.length} data micro-batches, got ${progress.length}")

    val twin = SparkEntry.queries("stream_late_drop")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1) // (batch, n_events, n_late, watermark_us)

    // pin 1: per-batch arrivals + the watermark log itself
    assert(progress.map(_._1).toSeq === twin.map(_._2).toSeq,
      "per-batch input rows diverge from the declared key's batches")
    twin.zip(progress).foreach { case ((b, _, _, wUs), (_, _, wmMs)) =>
      val expectMs = if (wUs == -1L) 0L else wUs / 1000
      assert(wmMs === expectMs,
        s"batch $b: engine watermark ${wmMs}ms != declared key's ${wUs}us")
    }

    // pin 2: drops at the engine's one-batch publication lag, ms precision
    val rows = Tables.events(spark, sfDir)
      .select(expr("(event_id + if(event_id % 100 = 7, 1500, 0)) div 1000").as("b"),
        col("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byB = rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2)
    val maxMsThrough = byB.scanLeft(Long.MinValue) { (acc, rs) =>
      math.max(acc, rs.map(_._2 / 1000).max)
    } // maxMsThrough(i) = max event ms over batches < i
    val model = byB.zipWithIndex.map { case (rs, i) =>
      // filter watermark of batch i = the one PUBLISHED in batch i−1 =
      // running max through batch i−2, minus the delay
      val pub = if (i < 2) Long.MinValue else maxMsThrough(i - 1)
      if (pub == Long.MinValue) 0L
      else rs.count(_._2 <= (pub - 3600000L) * 1000).toLong
    }
    assert(progress.map(_._2).toSeq === model,
      "per-batch watermark drops diverge from the engine-cadence model")
    info(s"total late-dropped rows: engine=${progress.map(_._2).sum}, " +
      s"declared key (no publication lag)=${twin.map(_._3).sum}")
  }

  test("multi-batch file stream: the stream-stream join's two-sided state EVICTS (bounded state)") {
    // the 8th gate (round 18, VERDICT r17 item 5): the join RESULT parity
    // above proves correctness; this pins the BEHAVIOR that makes an
    // unbounded stream-stream join deployable — both sides' state stores
    // actually evict rows once the other side's watermark passes the join
    // bound, so state size tracks the watermark window, never the stream
    // history. Asserted from MicroBatchExecution's own StateOperatorProgress
    // across a 9-batch replay of a month of events:
    //   (a) rows ARE removed (numRowsRemoved > 0 — eviction really fires),
    //   (b) the state store NEVER holds the cumulative input (each batch
    //       advances the watermark days past the previous batch's rows, so
    //       peak state stays around a batch's worth, far under the total),
    //   (c) final state is a small tail, not the accumulated history.
    assume(new java.io.File(s"$sfDir/events.parquet").exists)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", 32)
    val stream = StreamingJobs.eventsFileStream(spark, landing, maxFilesPerTrigger = 1)
    val q = StreamingJobs.viewPurchaseJoin(stream).writeStream
      .format("memory").queryName("sf01joinstate")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val progress = try {
      q.awaitTermination(300000)
      q.recentProgress.filter(_.numInputRows > 0).toSeq
    } finally q.stop()
    assert(progress.length >= 5, s"expected a multi-batch run, got ${progress.length}")

    val stateTotals = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
    val removedTotal = progress.map(_.stateOperators.map(_.numRowsRemoved).sum).sum
    val inputTotal = progress.map(_.numInputRows).sum
    // (a) eviction fires at all
    assert(removedTotal > 0L, "watermark eviction never removed a state row")
    // (b) bounded: the join state must never approach the cumulative input —
    // each micro-batch spans days of event time while the join bound is 1h +
    // a 10-minute watermark, so retained rows are a fraction of one batch
    assert(stateTotals.max < inputTotal / 2,
      s"peak join state ${stateTotals.max} is not bounded vs $inputTotal input rows")
    // (c) the final state is the small live tail, not history
    assert(stateTotals.last < inputTotal / 4,
      s"final join state ${stateTotals.last} holds accumulated history ($inputTotal input rows)")
    info(s"join state across ${progress.length} batches: " +
      s"totals=${stateTotals.mkString(",")} removed=$removedTotal input=$inputTotal")
  }
}
