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
  * Scale notes (100 TB): the iteration runs over the EDGE-INDUCED subgraph
  * only — vertices with no edge are singletons by definition and join back
  * in one final pass, so a corpus where 2% of docs have a near-dup pays
  * per-round cost on 2% of ids, not all of them. Per round = one shuffle of
  * (edge endpoints × labels) + one aggregate — both partition by vertex id,
  * and AQE coalesces as labels stabilize. `localCheckpoint` after every round truncates the
  * lineage (an unbounded iterative plan otherwise re-derives round k from
  * round 0 and overwhelms the optimizer). The driver-side action per round
  * is a COUNT of changed labels only — the convergence test every iterative
  * graph system (Pregel, GraphX) pays. For graphs whose diameter is itself
  * huge, swap in the alternating small-star/large-star scheme (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) — same
  * join-aggregate skeleton, fewer rounds.
  */
object ConnectedComponents {

  /** @param vertices   single-column frame of vertex ids (column `id`)
    * @param edges      two-column frame (src, dst), undirected, any
    *                   direction. Edges with an endpoint NOT in `vertices`
    *                   are ignored (semi-join filtered) — components are
    *                   defined by reachability within the vertex set only
    * @param iterateAll iterate over ALL vertices instead of just the
    *                   edge-induced subgraph — only sensible when nearly
    *                   every vertex has an edge (the restriction then buys
    *                   nothing and costs a distinct). Kept as the A/B
    *                   reference form for tools.AbBench.
    * @return (id, component) where component = min id reachable
    */
  /** @param doubleStep propagate TWICE per convergence action — measured
    *                    NEGATIVE (round 19): near-dup graphs are dense
    *                    clique-ish clusters with diameter ~1–2, so
    *                    single-step already converges in 2–3 actions and
    *                    the second hop (its joins + intermediate
    *                    checkpoint) is pure waste — interleaved A/B 3.24 vs
    *                    2.75 s at sf10, 2.80 vs 2.43 at sf0.1, double-step
    *                    slower at BOTH. Kept as the AbBench twin
    *                    `dedup_components_doublestep` — the lever exists
    *                    for a future high-diameter caller (chains, not
    *                    cliques), where ceil(D/2)+1 actions beats D+1.
    */
  def labels(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 20,
      iterateAll: Boolean = false,
      eagerCkpt: Boolean = false,
      doubleStep: Boolean = false): DataFrame = {
    // symmetrize once; checkpoint so every round reuses the materialized
    // edge list instead of re-deriving it (it never changes).
    // Edges referencing ids absent from `vertices` are dropped up front:
    // otherwise an out-of-set endpoint would receive a label, propagate it,
    // and two vertex components could merge through a non-vertex id — the
    // result frame must be exactly `vertices` labeled by reachability
    // WITHIN `vertices`. Two semi-joins on the slim (src, dst) pairs, paid
    // once before the checkpoint, not per round.
    val vids = vertices.select(col("id"))
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .join(vids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(vids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
      .distinct()
      // LAZY (round 18, the graph_pagerank discipline): the edge list
      // materializes inside the first convergence-sum job below instead of
      // paying its own eager scheduling round-trip; every later round reads
      // the stored blocks all the same
      .localCheckpoint(eager = eagerCkpt)

    // iterate over edge-TOUCHED vertices only: an isolated vertex can never
    // change its label, so it has no business inside the per-round join +
    // checkpoint. For a near-dup graph over a corpus this shrinks every
    // round from |V| (all docs) to |V_edges| (docs with at least one
    // near-duplicate — typically a small fraction); singletons rejoin once
    // at the end with comp = id. sym carries both directions, so its src
    // column alone covers every endpoint.
    var labels = (
      if (iterateAll) vertices.select(col("id"))
      else sym.select(col("src").as("id")).distinct())
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(eager = eagerCkpt)
    // labels only ever DECREASE (least of self and neighbors), so Σcomp is
    // a fixpoint witness: unchanged sum ⇔ no label moved. One scalar
    // aggregate per round replaces a join + filter + count.
    // coalesce: sum over an empty frame is NULL — empty input must yield an
    // empty result, not a driver NPE
    // Round 19: NO pre-loop sum action. Round 1 never needs a convergence
    // test (labels only decrease, so it either changes something or the
    // loop's second round confirms), so the first comparison happens
    // between round 1's and round 2's sums — one fewer driver action and
    // the lazy edge/label checkpoints materialize inside round 1's
    // convergence job instead of paying their own scheduling round-trip.
    var prevSum = 0L
    var havePrev = false
    // one min-label propagation hop; the caller checkpoints the result
    def step(l: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(l.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .groupBy(col("src").as("nid"))
        .agg(min(col("comp")).as("nbr_comp"))
      l.join(nbrMin, col("id") === col("nid"), "left")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
    }
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // LAZY checkpoints: the convergence sum right below is the round's
      // one action — it materializes the round's checkpoint blocks (both
      // hops when doubleStep; the intermediate one keeps the second hop's
      // two consumers from recomputing it) in the SAME job, so each driver
      // round-trip buys the full propagation work (round 18 precedent:
      // graph_pagerank's eager → lazy rewrite)
      val updated =
        (if (doubleStep) step(step(labels).localCheckpoint(eager = eagerCkpt))
         else step(labels))
          .localCheckpoint(eager = eagerCkpt)
      val newSum = updated.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
      labels = updated
      converged = havePrev && newSum == prevSum
      prevSum = newSum
      havePrev = true
      round += 1
    }
    // singletons (no edges) keep their own id as the component label
    vertices
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
