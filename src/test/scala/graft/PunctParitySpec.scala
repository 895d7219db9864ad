package graft

import org.apache.spark.sql.functions._

/** Pins the punct-feature class alignment (VERDICT r16 item 4 / ADVICE r16):
  * Spark's quality features count `[\p{L}\p{N}\s]` (any Unicode
  * letter/digit) as non-punctuation; until round 17 the DuckDB oracle used
  * `[a-z0-9\s]` over `lower(text)`, so every accented or CJK LETTER counted
  * as punctuation only in DuckDB — invisible on the ASCII gate corpora, but
  * with W_punct = −3.0 a single such doc flips text_quality_logreg's keep
  * decision cross-engine. Round 17 aligned the oracle to the same Unicode
  * classes (DuckDB's regex engine is RE2, which supports them).
  *
  * Two layers (the MoneySumSpec honesty pattern):
  *  1. EXHIBIT the divergence: on a non-ASCII literal, the old ASCII class
  *     and the Unicode class disagree in Spark itself — proving the gate
  *     corpora being ASCII is the only reason this never fired.
  *  2. Prove cross-engine agreement of the ALIGNED class: run the actual
  *     DuckDB regexp (shelling out to the driver's python3+duckdb, the
  *     compare.py engine — guarded by `assume`, verification
  *     infrastructure only) on accented/CJK/mixed literals and assert the
  *     punct counts match Spark's java.util.regex answer exactly.
  */
class PunctParitySpec extends SparkSpec {

  private val literals = Seq(
    "Héllo, wörld! 你好",            // accented + CJK letters, ASCII punct
    "naïve café — résumé…",          // accents + non-ASCII punctuation
    "数字123と句読点、テスト。",        // CJK letters + CJK punct + digits
    "Ψυχή καὶ σῶμα; δύο ἐν ἑνί.",    // polytonic Greek
    "plain ascii text, with. punct!", // the gate-corpus regime
    "vertical\u000Btab, ascii; ok."  // U+000B: Java \s has it, RE2 \s does NOT (ADVICE r17)
  )

  private def sparkPunct(cls: String): Seq[Int] = {
    val df = spark.createDataFrame(literals.map(Tuple1(_))).toDF("text")
    df.select(length(regexp_replace(col("text"), cls, "")).as("n"))
      .collect().map(_.getInt(0)).toSeq
  }

  test("EXHIBIT: the retired ASCII class disagrees with the Unicode class on non-ASCII text") {
    val unicodeCls = sparkPunct("[\\p{L}\\p{N}\\s]")
    val asciiCls = {
      val df = spark.createDataFrame(literals.map(Tuple1(_))).toDF("text")
      df.select(length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", "")).as("n"))
        .collect().map(_.getInt(0)).toSeq
    }
    // on the ASCII-regime literals they agree — which is why the sf gates
    // stayed green for 14 rounds; on every non-ASCII literal they must
    // differ (the VT literal is ASCII-regime: Java \s covers U+000B in
    // BOTH classes — its divergence is cross-ENGINE, pinned below)
    literals.indices.foreach { i =>
      if (literals(i).forall(_ < 128))
        assert(unicodeCls(i) === asciiCls(i), s"ASCII regime must agree on '${literals(i)}'")
      else
        assert(unicodeCls(i) !== asciiCls(i),
          s"expected divergence on '${literals(i)}': both counted ${unicodeCls(i)}")
    }
  }

  // the shipped oracle class (round 18): RE2's \s is [\t\n\f\r ] — it
  // EXCLUDES vertical tab U+000B, which Java's \s includes, so the oracle
  // spells the whitespace set explicitly instead of using \s (ADVICE r17)
  private val OracleClass = "[\\\\p{L}\\\\p{N}\\\\t\\\\n\\\\x0B\\\\f\\\\r ]"

  private def duckPunct(cls: String): Seq[Int] = {
    val script =
      s"""import duckdb, json, sys
         |lits = json.load(sys.stdin)
         |out = [duckdb.execute(
         |  "SELECT length(regexp_replace(?, '$cls', '', 'g'))",
         |  [t]).fetchone()[0] for t in lits]
         |print(json.dumps(out))""".stripMargin
    // json-escape: quotes AND control chars (json.load rejects raw < 0x20)
    val payload = "[" + literals.map { l =>
      "\"" + l.flatMap {
        case '"'            => "\\\""
        case '\\'           => "\\\\"
        case c if c < 0x20  => f"\\u${c.toInt}%04x"
        case c              => c.toString
      } + "\""
    }.mkString(",") + "]"
    val got = osWithStdin(Seq("python3", "-c", script), payload)
    got.trim.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.toInt).toSeq
  }

  test("ALIGNED: DuckDB's explicit oracle class counts match Spark's Java \\s class exactly") {
    val py = new java.io.File("/usr/bin/python3")
    assume(py.exists, "python3 not on this host")
    val probe = os("python3", "-c", "import duckdb; print('ok')")
    assume(probe.contains("ok"), "duckdb python module not on this host")

    val duck = duckPunct(OracleClass)
    val sparkN = sparkPunct("[\\p{L}\\p{N}\\s]")
    assert(duck === sparkN,
      s"cross-engine punct mismatch: duckdb=$duck spark=$sparkN on $literals")
  }

  test("EXHIBIT: DuckDB's RE2 \\s class diverges from Java's on U+000B (the retired oracle spelling)") {
    val py = new java.io.File("/usr/bin/python3")
    assume(py.exists, "python3 not on this host")
    val probe = os("python3", "-c", "import duckdb; print('ok')")
    assume(probe.contains("ok"), "duckdb python module not on this host")

    val duckOld = duckPunct("[\\\\p{L}\\\\p{N}\\\\s]")
    val sparkN = sparkPunct("[\\p{L}\\p{N}\\s]")
    val vtIdx = literals.indexWhere(_.contains('\u000B'))
    assert(duckOld(vtIdx) === sparkN(vtIdx) + 1,
      s"RE2 \\s should count VT as punct where Java does not: duckdb=${duckOld(vtIdx)} spark=${sparkN(vtIdx)}")
    literals.indices.filterNot(_ == vtIdx).foreach { i =>
      assert(duckOld(i) === sparkN(i), s"unexpected divergence beyond VT on '${literals(i)}'")
    }
  }

  test("KERNEL: plans.PunctCount is bit-identical to the regexp composition (round 17)") {
    // the native kernel that replaced length(regexp_replace(text, CLASS, ""))
    // on the quality hot path (noop-sink bench exposed the regex pass at
    // ~56 s/500k docs at sf10): ASCII fast path + exact regex delegation on
    // any non-ASCII byte — pinned on the divergence literals AND generated
    // strings mixing ASCII, accents, CJK, punctuation, and surrogates
    val rnd = new scala.util.Random(17)
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString) ++
        Seq(" ", "\t", "\n", "", "\f", "\r", ",", ".", "!", "—", "…",
          "é", "ö", "你", "好", "数", "Ψ", "ή", "،", "۔", "¾", "Ⅻ", "½",
          " ", " ", "𝔸", "𞸀", "😀", "́")
    val gen = Seq.fill(400)(Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size))).mkString)
    val df = spark.createDataFrame((literals ++ gen).map(Tuple1(_))).toDF("text")
    val rows = df.select(
      graft.Tables.punctCount(col("text")).as("k"),
      length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")).cast("long").as("r"),
      col("text"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), s"kernel!=regex on '${r.getString(2)}'")
    }
    // and it must stay inside whole-stage codegen — over a FILE scan (a
    // LocalRelation input gets constant-folded by ConvertToLocalRelation,
    // erasing the expression from the plan entirely)
    val agg = Tables.t(spark, TestTables.dir(spark), "documents")
      .select(graft.Tables.punctCount(col("text")).as("k")).agg(sum(col("k")))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("punct_count") && l.contains("*(")),
      s"punct_count outside codegen:\n$plan")
  }

  private def os(cmd: String*): String =
    try scala.sys.process.Process(cmd).!!
    catch { case _: Throwable => "" }

  private def osWithStdin(cmd: Seq[String], stdin: String): String = {
    val bytes = stdin.getBytes("UTF-8")
    (scala.sys.process.Process(cmd) #< new java.io.ByteArrayInputStream(bytes)).!!
  }
}
