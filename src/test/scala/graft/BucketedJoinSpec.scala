package graft

import org.apache.spark.sql.functions._

import graft.operators.BucketedJoin

/** The promise of `join_bucketed` is physical, not logical: the same rows as
  * a plain join, through a SortMergeJoin with NO Exchange on either side
  * (both scans are bucket-co-located on the key at write time). Both halves
  * are pinned here — the plan shape and the row identity.
  */
class BucketedJoinSpec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)

  test("bucketed join plans a SortMergeJoin with no Exchange on either side") {
    val p = BucketedJoin.joined(spark, d).queryExecution.sparkPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed co-located join must not shuffle either side:\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"both scans should be bucketed reads:\n$p")
  }

  test("bucketed write lands at most one file per bucket (repartition aligned with bucket hash)") {
    val (liB, _) = BucketedJoin.tables(spark, d)
    val files = spark.table(liB).inputFiles
    assert(files.nonEmpty && files.length <= BucketedJoin.NBuckets)
    // bucket id is embedded in the file name (`..._00003.c000...`); one
    // file per bucket id proves the pre-write repartition used the same
    // hash as the bucket spec (an unaligned write sprays task×bucket files)
    val bucketIds = files.toSeq.map { f =>
      "_(\\d{5})\\.".r.findFirstMatchIn(f.split('/').last).map(_.group(1))
    }
    assert(bucketIds.forall(_.isDefined), s"unexpected file names: ${files.mkString(",")}")
    assert(bucketIds.distinct.length == files.length,
      s"multiple files share a bucket: ${files.mkString(",")}")
  }

  test("join_bucketed result is row-identical to the plain join aggregate") {
    val got = SparkEntry.queries("join_bucketed")(spark, d).collect().toSeq
    val want = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy("l_returnflag", "o_orderpriority")
      .collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
