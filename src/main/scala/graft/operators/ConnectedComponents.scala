package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the principled
  * resolution of near-duplicate PAIRS into duplicate CLUSTERS (each doc gets
  * the min doc-id of its transitive group as its component label), vs the
  * greedy drop-the-b-side approximation `CorpusClean` uses.
  *
  * Algorithm: every vertex starts labeled with itself; each round a vertex
  * adopts the minimum label among itself and its neighbors; stop at fixpoint
  * (no label changed) or `maxIter`. Converges in graph-diameter rounds —
  * near-dup graphs are dense clique-ish clusters, so 2–4 in practice.
  *
  * Scale notes (100 TB): per round = one shuffle of (edge endpoints ×
  * labels) + one aggregate — both partition by vertex id, and AQE coalesces
  * as labels stabilize. `localCheckpoint` after every round truncates the
  * lineage (an unbounded iterative plan otherwise re-derives round k from
  * round 0 and overwhelms the optimizer). The driver-side action per round
  * is a COUNT of changed labels only — the convergence test every iterative
  * graph system (Pregel, GraphX) pays. For graphs whose diameter is itself
  * huge, swap in the alternating small-star/large-star scheme (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) — same
  * join-aggregate skeleton, fewer rounds.
  */
object ConnectedComponents {

  /** @param vertices single-column frame of vertex ids (column `id`)
    * @param edges    two-column frame (src, dst), undirected, any direction
    * @return (id, component) where component = min id reachable
    */
  def labels(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetrize once; checkpoint so every round reuses the materialized
    // edge list instead of re-deriving it (it never changes)
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = vertices.select(col("id"), col("id").as("comp")).localCheckpoint()
    // labels only ever DECREASE (least of self and neighbors), so Σcomp is
    // a fixpoint witness: unchanged sum ⇔ no label moved. One scalar
    // aggregate per round replaces a join + filter + count.
    // coalesce: sum over an empty frame is NULL — empty input must yield an
    // empty result, not a driver NPE
    var prevSum = labels.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .groupBy(col("src").as("nid"))
        .agg(min(col("comp")).as("nbr_comp"))
      val updated = labels
        .join(nbrMin, col("id") === col("nid"), "left")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint()
      val newSum = updated.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
      labels = updated
      converged = newSum == prevSum
      prevSum = newSum
      round += 1
    }
    labels
  }
}
