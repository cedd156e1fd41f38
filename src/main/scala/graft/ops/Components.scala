package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge frame — turns near-dup PAIRS into
  * dup CLUSTERS (component id = smallest member id), the step that makes
  * pairwise dedup actionable ("keep one representative per cluster").
  *
  * Min-label propagation: every node repeatedly adopts the smallest label in
  * its neighborhood. Iterations = graph diameter in the worst case, but
  * near-dup clusters are dense (quasi-cliques), so it converges in a few
  * rounds. Each round is one shuffle join + aggregate; lineage is truncated
  * with localCheckpoint so plans don't grow unboundedly.
  */
object Components {

  /** @param edges frame with two long id columns (`srcCol`, `dstCol`) —
    *              undirected pairs
    * @param nodes frame with `idCol` — the full node set (isolated nodes get
    *              their own component)
    * @return (id, component) — component = min node id reachable
    */
  /** @param broadcastLabels broadcast the label frame into each round's join
    *        instead of shuffling it — faster when the node set comfortably
    *        fits in executor memory, wrong at billions of nodes (default off:
    *        the edge set is pre-partitioned+sorted by join key ONCE, so each
    *        round shuffles only the label side, never the edges)
    * @param pathHalving after each propagation round, apply label(v) ←
    *        label(label(v)) twice (two label-frame self-joins). Long chains
    *        then converge in O(log diameter) rounds instead of O(diameter)
    *        — min-label propagation alone moves the minimum one hop per
    *        round. Identity on already-converged labels; the fixpoint is
    *        unchanged (min reachable id). ADAPTIVE: the two V-sized
    *        self-joins are pure overhead on dense quasi-clique dedup graphs
    *        (which converge in 2-3 rounds anyway), so halving engages only
    *        from round 3 on AND only while the changed-count is not decaying
    *        geometrically (failing to halve round-over-round = the
    *        long-chain signature halving exists for).
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIterations: Int = 20,
                          broadcastLabels: Boolean = false,
                          pathHalving: Boolean = true): DataFrame = {
    // Symmetrized edges, hash-partitioned and sorted by the join key (b) ONCE
    // — localCheckpoint preserves partitioning+ordering, so per-round joins
    // add no edge-side exchange or sort.
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionAll(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .repartition(col("b"))
      .sortWithinPartitions("b")
      .localCheckpoint(true)

    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("label"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    var prevChanged = Long.MaxValue
    while (!converged && iter < maxIterations) {
      // smallest label among each node's neighbors; the edge set never
      // re-shuffles (pre-partitioned), only the label side moves
      val lbl = if (broadcastLabels) broadcast(labels) else labels
      val neighborMin = sym.join(lbl, sym("b") === lbl("id"))
        .groupBy(sym("a").as("id2"))
        .agg(min(col("label")).as("nmin"))
      // LAZY localCheckpoint + a changed-count aggregate: ONE job per round
      // both materializes the checkpoint (truncating lineage) and reports
      // convergence — no separate count() job per iteration.
      val updated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (col("nmin").isNotNull && col("nmin") < col("label")).as("changed"))
        .localCheckpoint(false)
      val nChanged = updated.agg(sum(when(col("changed"), 1L).otherwise(0L))).collect()(0)
      val changedCnt = if (nChanged.isNullAt(0)) 0L else nChanged.getLong(0)
      converged = changedCnt == 0L
      // decay stalls when the changed-count fails to halve round-over-round:
      // dense clusters collapse geometrically (no halving needed), chains
      // keep changedCnt ~constant — exactly the case halving accelerates
      val stalling = iter >= 2 && changedCnt * 2 > prevChanged
      prevChanged = changedCnt
      var next = updated.select("id", "label")
      if (pathHalving && !converged && stalling) {
        // two pointer-jumps per round: label(v) <- label(label(v)); each is a
        // self-join of the (id, label) frame — V-sized, not edge-sized
        for (_ <- 1 to 2) {
          val l2 = next.select(col("id").as("pid"), col("label").as("plabel"))
          next = next.join(l2, next("label") === l2("pid"), "left")
            .select(next("id"), coalesce(col("plabel"), next("label")).as("label"))
        }
        next = next.localCheckpoint(true)
      }
      labels = next
      iter += 1
    }
    labels.withColumnRenamed("label", "component")
  }
}
