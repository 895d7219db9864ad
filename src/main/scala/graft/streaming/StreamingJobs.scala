package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming wiring of the §2.10 event-time operators
  * (SURVEY.md §2.10 "true streaming in design"): the same logic the batch
  * twins in [[graft.queries.Events]] declare, expressed over an unbounded
  * source with watermarks. Not oracle-checked (the driver gate verifies the
  * batch formulations); covered by StreamingSpec via MemoryStream.
  *
  * Scale notes: each aggregation keys its state by (window, event_type) or
  * (user, session) — state store shards by key hash across executors; the
  * 10-minute watermark bounds state size (late rows beyond it are dropped
  * and their windows evicted). Output mode `update` emits only changed
  * windows per micro-batch.
  */
object StreamingJobs {

  val WatermarkDelay = "10 minutes"

  /** File-source stream over an events parquet directory: the real
    * `readStream → transforms → writeStream` entry point. Streaming sources
    * don't infer schemas, so the `ts` type is pinned from a one-off batch
    * footer read of the same directory — the directory's files share one
    * schema across the two generations the testdata has shipped
    * (ns-as-BIGINT under the nanosAsLong conf, or `timestamp[us]`/NTZ), and
    * `tsx` (µs-precision event time, TimestampType) is derived to match,
    * mirroring `Tables.events`. A NOT-YET-POPULATED landing directory (no
    * files to peek) falls back to the current-generation pinned DDL instead
    * of erroring — the stream then starts empty and picks files up as they
    * land. At scale the directory is a landing zone new files roll into;
    * each micro-batch picks up only unseen files.
    */
  def eventsFileStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = scala.util.Try(spark.read.parquet(dir).schema).getOrElse(
      org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"))
    val reader = spark.readStream.schema(schema)
    // >0 throttles ingestion to N files per micro-batch — the lever that
    // turns a landed directory into a genuinely incremental multi-batch run
    val throttled =
      if (maxFilesPerTrigger > 0) reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    // Timezone-independent event time, mirroring Tables.events: an NTZ→LTZ
    // cast would shift by the session zone for a non-UTC library user.
    val tsx = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        expr("timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))")
      case _ => col("ts")
    }
    throttled
      .parquet(dir)
      .withColumn("tsx", tsx)
  }

  /** Tumbling 1-hour counts — streaming twin of `stream_tumbling`. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("tsx", WatermarkDelay)
      .groupBy(window(col("tsx"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))

  /** Sliding 1h/30min counts — streaming twin of `stream_sliding`. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("tsx", WatermarkDelay)
      .groupBy(window(col("tsx"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))

  /** 30-min-gap sessions via the built-in session window — streaming twin of
    * `stream_session` (whose batch form is gaps-and-islands).
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("tsx", WatermarkDelay)
      .groupBy(session_window(col("tsx"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming dedup bounded by the watermark — the streaming face of the
    * dedup operators: exact-key dedup whose state is evicted once the
    * watermark passes (SURVEY.md §2.10 late-data row).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("tsx", WatermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream interval join — purchases within 1 hour after
    * a view by the same user (streaming twin of the `stream_join` batch
    * query). Both sides carry a watermark and the join condition bounds
    * event time on BOTH ends, so each side's state store evicts rows once
    * the other side's watermark passes `v_ts + 1h` — bounded state, the
    * non-negotiable requirement for an unbounded join.
    */
  def viewPurchaseJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("tsx").as("v_ts"))
      .withWatermark("v_ts", WatermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("tsx").as("p_ts"))
      .withWatermark("p_ts", WatermarkDelay)
    views.join(
      purchases,
      expr("user_id = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"))
      .select(col("user_id"), col("v_ts"), col("p_ts"))
  }

  /** foreachBatch sink — the production escape hatch for sinks Structured
    * Streaming lacks natively (JDBC upserts, MERGE INTO, multi-table
    * fan-out). The batch id makes retries idempotent: a replayed micro-batch
    * overwrites its own output partition instead of appending duplicates
    * (checkpoint + deterministic per-batch target = effectively-once).
    */
  def foreachBatchParquet(events: DataFrame, outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write
          .mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")
      }

  // ── custom state: sessionization with flatMapGroupsWithState ───────────

  case class Ev(user_id: Long, tsUs: Long, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  val SessionGapUs: Long = 30L * 60L * 1000000L

  /** Shared per-batch fold of a user's (sorted) events into session state:
    * merge within the gap, emit + restart across it. Out-of-order events
    * that land inside an open session extend its bounds with min/max — a
    * plain `lastUs = e.tsUs` overwrite would let a late-but-valid event
    * REGRESS session_end (and the event-time timeout anchor) backwards.
    * Used by both [[sessionize]] and [[sessionizeWithTimeout]] so the twins
    * cannot diverge.
    */
  private def foldEvents(
      user: Long,
      sorted: Seq[Ev],
      init: Option[SessionState],
      out: scala.collection.mutable.Builder[SessionOut, Seq[SessionOut]]): Option[SessionState] = {
    var cur = init
    sorted.foreach { e =>
      cur match {
        case Some(st) if e.tsUs - st.lastUs <= SessionGapUs =>
          cur = Some(SessionState(
            math.min(st.startUs, e.tsUs), math.max(st.lastUs, e.tsUs), st.n + 1))
        case Some(st) =>
          out += SessionOut(user, st.startUs, st.lastUs, st.n)
          cur = Some(SessionState(e.tsUs, e.tsUs, 1))
        case None =>
          cur = Some(SessionState(e.tsUs, e.tsUs, 1))
      }
    }
    cur
  }

  /** Timeout-aware streaming sessionizer: like [[sessionize]], but ALSO
    * closes and emits a session when the event-time watermark passes its
    * last event + gap — so quiet users' sessions surface without waiting
    * for their next event (the part `NoTimeout` state machines can't do).
    * Requires the input watermarked on `tsx`; keyed state times out at
    * `lastUs + gap` via `GroupStateTimeout.EventTimeTimeout`.
    */
  def sessionizeWithTimeout(events: Dataset[Ev])(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("tsx", expr("timestamp_micros(tsUs)"))
      .withWatermark("tsx", WatermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = Seq.newBuilder[SessionOut]
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is closed by time
            val st = state.get
            out += SessionOut(user, st.startUs, st.lastUs, st.n)
            state.remove()
          } else {
            val cur = foldEvents(user, evs.toSeq.sortBy(_.tsUs), state.getOption, out)
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp((st.lastUs + SessionGapUs) / 1000L)
            }
          }
          out.result().iterator
      }
  }

  // ── transformWithState: the Spark 4 arbitrary-state API ────────────────

  case class UserTotal(user_id: Long, sum_value: Double, n_events: Long)

  /** Running per-user totals via `StatefulProcessor` — the current-generation
    * state API (transformWithState, Spark 4): typed named state cells
    * (`ValueState`) on the RocksDB store, explicit `TimeMode`, per-key
    * timers, TTL — replacing flatMapGroupsWithState's single opaque state
    * blob. Emits the updated running total for each user touched by a
    * micro-batch.
    */
  class RunningTotals extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserTotal] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}

    @transient private var totals: org.apache.spark.sql.streaming.ValueState[UserTotal] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[UserTotal] = Encoders.product[UserTotal]
      totals = getHandle.getValueState[UserTotal]("totals", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[UserTotal] = {
      val prev = Option(totals.get()).getOrElse(UserTotal(key, 0.0, 0L))
      var s = prev.sum_value
      var n = prev.n_events
      rows.foreach { e => s += e.value; n += 1 }
      val next = UserTotal(key, s, n)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Wire [[RunningTotals]] over a keyed event stream (requires the RocksDB
    * state store provider — transformWithState's backing store).
    */
  def runningTotals(events: Dataset[Ev])(implicit spark: SparkSession): Dataset[UserTotal] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotals,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** Custom per-key state machine (KeyValueGroupedDataset.flatMapGroupsWithState):
    * emits a session row whenever a gap > 30 min closes one. Demonstrates the
    * arbitrary-state API the built-in session_window can't cover (e.g.
    * emitting mid-session heartbeats or custom eviction policies).
    */
  def sessionize(events: Dataset[Ev])(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = Seq.newBuilder[SessionOut]
          val cur = foldEvents(user, evs.toSeq.sortBy(_.tsUs), state.getOption, out)
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
