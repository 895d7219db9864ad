package graft

import org.apache.spark.sql.functions._

import graft.ppdb.Ppdb

/** DataSourceV2 reader for the release format (`format("ppdb")`): the three
  * contracts the seam exists for — pruning inside the parser, one partition
  * per non-splittable member, and row parity with the projection-form parse.
  */
class PpdbV2Spec extends SparkSpec {

  test("short name resolves and the full typed schema comes back") {
    val df = spark.read.format("ppdb").load(Ppdb.FixturePath)
    assert(df.schema === graft.sources.ppdb.PpdbDataSource.Schema)
    assert(df.count() === 12)
  }

  test("column pruning reaches the reader: a phrase-only scan reads struct<phrase>") {
    val df = spark.read.format("ppdb").load(Ppdb.FixturePath).select("phrase")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    assert(scans.head.scan.readSchema() ===
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("phrase",
          org.apache.spark.sql.types.StringType))),
      "pruned single-column schema must reach the reader")
    assert(df.distinct().count() === 7)
  }

  test("one InputPartition per gz member of a multi-file release") {
    val df = spark.read.format("ppdb").load(Ppdb.MultiFixtureDir)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 12)
  }

  test("rows match the projection-form parse field for field") {
    val v2 = spark.read.format("ppdb").load(Ppdb.FixturePath)
      .select(col("lhs"), col("phrase"), col("paraphrase"),
        col("features"), col("alignment"), col("entailment"), col("ppdb2score"))
      .orderBy("phrase", "paraphrase")
      .collect()
    val proj = Ppdb.rules(spark)
      .toDF()
      .join(
        Ppdb.parse(spark).select(col("phrase").as("p2"), col("paraphrase").as("pp2"),
          col("ppdb2score")),
        col("phrase") === col("p2") && col("paraphrase") === col("pp2"))
      .select(col("lhs"), col("phrase"), col("paraphrase"),
        col("features"), col("alignment"), col("entailment"), col("ppdb2score"))
      .orderBy("phrase", "paraphrase")
      .collect()
    assert(v2.length === proj.length)
    v2.zip(proj).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getString(1) === b.getString(1))
      assert(a.getString(2) === b.getString(2))
      assert(a.getMap[String, Double](3) === b.getMap[String, Double](3))
      // alignment structs: compare as (src, tgt) pairs (field names differ
      // only if the schemas drifted — the values are the contract)
      assert(a.getSeq[org.apache.spark.sql.Row](4).map(r => (r.getInt(0), r.getInt(1))) ===
        b.getSeq[org.apache.spark.sql.Row](4).map(r => (r.getInt(0), r.getInt(1))))
      assert(a.getString(5) === b.getString(5))
      assert(a.getDouble(6) === b.getDouble(6))
    }
  }

  test("phrase equality pushes into the reader and returns exactly the lookup rows") {
    val df = spark.read.format("ppdb").load(Ppdb.FixturePath)
      .filter(col("phrase") === "happy")
      .select("paraphrase")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val pushed = scans.head.scan.asInstanceOf[graft.sources.ppdb.PpdbScan].pushedForTest
    assert(pushed.contains(org.apache.spark.sql.sources.EqualTo("phrase", "happy")),
      s"phrase equality must reach the reader; pushed=${pushed.mkString(",")}")
    assert(df.collect().map(_.getString(0)).sorted === Array("cheerful", "content", "glad"))
  }

  test("score threshold pushes into the reader and prunes exactly (round 12)") {
    val df = spark.read.format("ppdb").load(Ppdb.FixturePath)
      .filter(col("ppdb2score") >= 4.0)
      .select("phrase", "paraphrase", "ppdb2score")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val pushed = scans.head.scan.asInstanceOf[graft.sources.ppdb.PpdbScan].pushedForTest
    assert(pushed.exists {
      case org.apache.spark.sql.sources.GreaterThanOrEqual("ppdb2score", _) => true
      case _ => false
    }, s"score threshold must reach the reader; pushed=${pushed.mkString(",")}")
    val rows = df.collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getDouble(2) >= 4.0))
    // parity with the projection-form parse under the same predicate
    val twin = Ppdb.parse(spark).filter(col("ppdb2score") >= 4.0).count()
    assert(rows.length.toLong === twin)
  }

  test("a line with no PPDB2.0Score token fails a pushed threshold (SQL null semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("ppdbv2ns").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/x.txt"),
      ("[X] ||| a ||| b ||| p(e|f)=1.0 ||| 0-0 ||| Equivalence\n" +
        "[X] ||| c ||| d ||| PPDB2.0Score=4.5 p(e|f)=1.0 ||| 0-0 ||| Equivalence\n")
        .getBytes("UTF-8"))
    val rows = spark.read.format("ppdb").load(s"$dir/x.txt")
      .filter(col("ppdb2score") >= 0.0).select("phrase").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("c"))
  }

  test("glob paths plan one partition per matched member (Hadoop listing, round 12)") {
    val df = spark.read.format("ppdb").load(s"${Ppdb.MultiFixtureDir}/*.txt.gz")
    assert(df.rdd.getNumPartitions === 4)
    // full row parity with the projection-form glob parse
    val v2 = df.select("lhs", "phrase", "paraphrase", "entailment")
      .orderBy("phrase", "paraphrase").collect().toSeq
    val proj = Ppdb.parse(spark, s"${Ppdb.MultiFixtureDir}/*.txt.gz")
      .select("lhs", "phrase", "paraphrase", "entailment")
      .orderBy("phrase", "paraphrase").collect().toSeq
    assert(v2 === proj)
  }

  test("a nonexistent path fails at planning time with the path in the message") {
    val err = intercept[Exception] {
      spark.read.format("ppdb").load("/no/such/ppdb/dir").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("/no/such/ppdb/dir")),
      s"expected the offending path in the error; got: ${messages(err).mkString(" | ")}")
  }

  private def batchScans(df: org.apache.spark.sql.DataFrame)
    : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = {
    // aggregates shuffle, so AQE wraps the plan in AdaptiveSparkPlanExec (a
    // leaf node collect() cannot see through) — unwrap via inputPlan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case b: BatchScanExec => Seq(b)
      case o => o.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("count/min/max aggregates push into the reader (round 13)") {
    val df = SparkEntry.queries("ppdb_audit_v2")(spark, "")
    val scans = batchScans(df)
    assert(scans.nonEmpty, "expected a BatchScanExec")
    val scan = scans.head.scan.asInstanceOf[graft.sources.ppdb.PpdbScan]
    val agg = scan.pushedAggForTest
    assert(agg.isDefined, "the audit aggregation must reach the reader")
    assert(agg.get.aggregateExpressions.length === 4,
      s"all four aggregates push: ${agg.get.aggregateExpressions.mkString(",")}")
    // the scan's output is the 4-column partial-aggregate row, not rules
    assert(scans.head.scan.readSchema().fields.length === 4)
    // parity with the unpushed projection-form parse
    val got = df.collect().head
    val proj = Ppdb.parse(spark, s"${Ppdb.MultiFixtureDir}/*.txt.gz")
      .agg(count(lit(1)), count(col("ppdb2score")),
        round(min(col("ppdb2score")), 2), round(max(col("ppdb2score")), 2))
      .collect().head
    assert(got.toSeq === proj.toSeq)
  }

  test("pushed filters compose with pushed aggregates (score-pruned audit)") {
    val df = spark.read.format("ppdb").load(s"${Ppdb.MultiFixtureDir}/*.txt.gz")
      .filter(col("ppdb2score") >= 4.0)
      .agg(count(lit(1)).as("n"), round(min(col("ppdb2score")), 2).as("mn"))
    val scan = batchScans(df).head.scan.asInstanceOf[graft.sources.ppdb.PpdbScan]
    assert(scan.pushedForTest.nonEmpty, "the threshold must stay pushed")
    assert(scan.pushedAggForTest.isDefined, "the aggregation must also push")
    val got = df.collect().head
    val twin = Ppdb.parse(spark, s"${Ppdb.MultiFixtureDir}/*.txt.gz")
      .filter(col("ppdb2score") >= 4.0)
      .agg(count(lit(1)), round(min(col("ppdb2score")), 2))
      .collect().head
    assert(got.toSeq === twin.toSeq)
  }

  test("grouped or unsupported aggregates do NOT push and stay correct") {
    // group-by and avg are outside the pushable set — the source must
    // decline and the ordinary row path must take over
    val df = spark.read.format("ppdb").load(s"${Ppdb.MultiFixtureDir}/*.txt.gz")
      .groupBy("entailment").agg(avg(col("ppdb2score")).as("a"))
    val scan = batchScans(df).head.scan.asInstanceOf[graft.sources.ppdb.PpdbScan]
    assert(scan.pushedAggForTest.isEmpty)
    assert(df.collect().nonEmpty)
  }

  test("scanScore takes the LAST duplicate score token, like the tokenizer (ADVICE r12)") {
    // a line carrying two PPDB2.0Score tokens: the materialized column is
    // last-wins, so a pushed threshold passing on the FIRST value would
    // surface rows violating the user's WHERE — the fixed scanScore must
    // agree with the full tokenizer on both filter and aggregate paths
    val dir = java.nio.file.Files.createTempDirectory("ppdbv2dup").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/dup.txt"),
      ("[X] ||| a ||| b ||| PPDB2.0Score=9.0 p=1 PPDB2.0Score=1.5 ||| 0-0 ||| Equivalence\n" +
        "[X] ||| c ||| d ||| PPDB2.0Score=5.0 ||| 0-0 ||| Equivalence\n" +
        "[X] ||| e ||| f ||| xPPDB2.0Score=7.0 PPDB2.0Score=2.0 ||| 0-0 ||| Equivalence\n")
        .getBytes("UTF-8"))
    val src = spark.read.format("ppdb").load(s"$dir/dup.txt")
    // materialized truth: a→1.5 (last wins), c→5.0, e→2.0 (boundary-aligned only)
    val mat = src.select("phrase", "ppdb2score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mat === Map("a" -> 1.5, "c" -> 5.0, "e" -> 2.0))
    // pushed threshold must agree with the materialized column
    val pushedRows = src.filter(col("ppdb2score") >= 3.0).select("phrase").collect()
      .map(_.getString(0)).toSeq
    assert(pushedRows === Seq("c"))
    // pushed aggregate must agree too
    val agg = src.agg(round(max(col("ppdb2score")), 2)).collect().head.getDouble(0)
    assert(agg === 5.0)
  }

  test("malformed lines null-fill missing fields instead of erroring") {
    val dir = java.nio.file.Files.createTempDirectory("ppdbv2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.txt"),
      "[X] ||| lonely ||| alone\n".getBytes("UTF-8"))
    val r = spark.read.format("ppdb").load(s"$dir/bad.txt").collect().head
    assert(r.getString(1) === "lonely" && r.getString(2) === "alone")
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }
}
