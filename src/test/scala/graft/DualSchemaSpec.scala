package graft

import org.apache.spark.sql.functions._

/** VERDICT r9 item 3: the driver testdata regenerated events.ts from INT64
  * TIMESTAMP(NANOS) to `timestamp[us]` and every events query went red —
  * this spec pins BOTH reader paths so either schema regressing again fails
  * here first. It runs a representative slice of the events-key queries
  * (asof join, ordered window, gaps-and-islands session, tumbling window,
  * time-weighted avg, CDC latest, JSON extraction) against the µs fixture
  * ([[TestTables.dir]]) and the legacy ns fixture ([[TestTables.dirLegacyNs]])
  * and asserts row-identical results.
  */
class DualSchemaSpec extends SparkSpec {

  private val keys = Seq(
    "join_asof", "window_moving_avg", "stream_session", "stream_tumbling",
    "time_weighted_avg", "cdc_latest", "func_json", "window_lag_lead")

  test("Tables.events surfaces identical ts_us for both on-disk schemas") {
    val us = Tables.events(spark, TestTables.dir(spark))
    val ns = Tables.events(spark, TestTables.dirLegacyNs(spark))
    assert(us.schema("ts_us").dataType === org.apache.spark.sql.types.LongType)
    assert(ns.schema("ts_us").dataType === org.apache.spark.sql.types.LongType)
    val a = us.select("event_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = ns.select("event_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("events-key queries agree row-for-row across the two events schemas") {
    val dUs = TestTables.dir(spark)
    val dNs = TestTables.dirLegacyNs(spark)
    keys.foreach { k =>
      val us = SparkEntry.queries(k)(spark, dUs)
      val ns = SparkEntry.queries(k)(spark, dNs)
      assert(us.schema.fieldNames.toSeq === ns.schema.fieldNames.toSeq, s"$k schema")
      val cols = us.schema.fieldNames.map(col).toSeq
      val a = us.select(cols: _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = ns.select(cols: _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a === b, s"$k rows differ between µs and ns events schemas")
      assert(a.nonEmpty, s"$k returned no rows on the fixture")
    }
  }

  test("ts_us is timezone-independent for the NTZ schema (ADVICE r10)") {
    // a library user running a non-UTC session must see the same ts_us —
    // the old unix_micros(NTZ→LTZ cast) derivation shifted by the zone
    val d = TestTables.dir(spark)
    val utc = Tables.events(spark, d)
      .select("event_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val tokyo = Tables.events(spark, d)
        .select("event_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(tokyo === utc, "ts_us shifted under a non-UTC session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("eventsFileStream adapts tsx to either schema (batch-peeked footer)") {
    // the streaming reader peeks the footer for the ts type; both fixtures
    // must yield the same µs event-time under the UTC session
    for (d <- Seq(TestTables.dir(spark), TestTables.dirLegacyNs(spark))) {
      val sdf = graft.streaming.StreamingJobs.eventsFileStream(spark, s"$d/events.parquet")
      assert(sdf.isStreaming)
      assert(sdf.schema("tsx").dataType === org.apache.spark.sql.types.TimestampType)
    }
  }
}
