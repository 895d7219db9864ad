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
    assert(pushed.nonEmpty && pushed.head ===
      org.apache.spark.sql.sources.EqualTo("phrase", "happy"),
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

  test("malformed lines null-fill missing fields instead of erroring") {
    val dir = java.nio.file.Files.createTempDirectory("ppdbv2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.txt"),
      "[X] ||| lonely ||| alone\n".getBytes("UTF-8"))
    val r = spark.read.format("ppdb").load(s"$dir/bad.txt").collect().head
    assert(r.getString(1) === "lonely" && r.getString(2) === "alone")
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }
}
