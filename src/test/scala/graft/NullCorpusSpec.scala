package graft

/** Null-input robustness sweep (round 11, the EmptyCorpusSpec companion):
  * every declared query runs against a corpus whose non-key value columns
  * carry scattered NULLs and must produce a result rather than crash. At
  * 100 TB nulls are not an edge case — failed scrapes null out `text`,
  * absent metadata nulls `lang`/`source`, partial records null numeric
  * measures — and Spark 4's default ANSI mode turns several
  * null-adjacent slips (casts of malformed fallbacks, element_at misses)
  * into hard runtime errors this sweep would surface. Result VALUES under
  * nulls are each operator's own contract (most aggregates skip nulls;
  * the oracle gate pins semantics on the real data); what this sweep pins
  * is that no operator dies.
  */
class NullCorpusSpec extends SparkSpec {

  /** The ANN index family REFUSES null vectors by contract (AnnLsh /
    * AnnIvf scaladoc: a null cannot be hashed or quantized, and silently
    * dropping it from the index or probe set is invisible recall loss at
    * scale — fail-loud beats fail-silent). For these keys the sweep pins
    * the CLEAR refusal message instead of success.
    */
  private val refusesNullVectors =
    Set("sim_ann_lsh", "sim_ann_ivf", "sim_ann_pq", "sim_ann_ivfpq",
      "sim_ann_index_serve", "dedup_embedding_ann", "dedup_embedding")

  private def causeChain(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 20) {
      sb.append(t.toString).append('\n')
      t.getSuppressed.foreach(s => sb.append(s.toString).append('\n'))
      t = t.getCause
      depth += 1
    }
    sb.toString
  }

  test("every declared query survives a null-riddled corpus (ANN keys refuse loudly)") {
    val d = TestTables.dirNulls(spark)
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        fn(spark, d).count()
        if (refusesNullVectors(name))
          failures += ((name, "expected a loud null-vector refusal, query succeeded"))
      } catch { case e: Throwable =>
        val chain = causeChain(e)
        if (!(refusesNullVectors(name) && chain.contains("null") && chain.contains("vector")))
          failures += ((name, e.toString.linesIterator.next().take(160)))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"\n  $n: $m" }.mkString(
        s"${failures.size} queries violate the null-corpus contract:", "", ""))
  }
}
