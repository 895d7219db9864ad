package graft

import java.nio.file.Files

import graft.sources.PpdbRelease

/** Ingestion path: gzip release → partitioned zstd parquet → pruned lookup. */
class PpdbReleaseSpec extends SparkSpec {

  test("ingest round-trips the release and lookup ranks correctly") {
    val out = Files.createTempDirectory("ppdb-ingest").toString + "/release"
    PpdbRelease.ingest(spark, graft.ppdb.Ppdb.FixturePath, out, numPartitions = 2)

    val ingested = PpdbRelease.readIngested(spark, out)
    assert(ingested.count() === 12)
    assert(ingested.columns.contains("ppdb2score"))

    val rows = PpdbRelease.lookup(spark, out, "happy").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("glad", "content", "cheerful"))
  }
}
