package graft

/** Empty-input robustness sweep (round 10): every declared query runs
  * against a zero-row corpus with the real schemas and must produce a
  * result (usually empty) rather than crash. At 100 TB empty inputs are
  * routine — a fresh landing zone, a fully-pruned partition, a filter that
  * matches nothing — and ANSI mode turns unguarded divide-by-zero or
  * driver-side head() on an empty frame into hard failures that this sweep
  * would catch. Queries reading committed fixtures (ppdb / multimodal) are
  * corpus-independent and trivially pass; they stay in the sweep for
  * uniformity.
  */
class EmptyCorpusSpec extends SparkSpec {

  test("every declared query survives a zero-row corpus") {
    val d = TestTables.dirEmpty(spark)
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try { fn(spark, d).count(): Unit }
      catch { case e: Throwable =>
        failures += ((name, e.toString.linesIterator.next().take(160)))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"\n  $n: $m" }.mkString(
        s"${failures.size} queries crash on an empty corpus:", "", ""))
  }
}
