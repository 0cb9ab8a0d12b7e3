package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the standard
  * follow-up to near-dup pair generation (LSH/SimHash/Jaccard emit
  * PAIRS; a curation pipeline needs CLUSTERS, then one canonical doc
  * per cluster).
  *
  * Algorithm: alternating large-star / small-star contractions
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
  * Components in MapReduce and Beyond", SoCC'14 — public literature,
  * not code). Per round, every node hooks its neighborhood onto the
  * neighborhood minimum; the round count is O(log² n) on ANY graph
  * shape — unlike naive min-label propagation, whose round count is
  * the graph DIAMETER (a chain of pairwise-similar docs, common in
  * template spam, would take one round per hop).
  *
  * Scale shape: each round is groupBy-min + join on node id — plain
  * shuffles on the edge key, partial aggregation on the min, nothing
  * corpus-sized on the driver or broadcast. Lineage is truncated with
  * `localCheckpoint` each round so the iterated plan stays flat (on a
  * production cluster prefer reliable checkpointing — set
  * `spark.sparkContext.setCheckpointDir` and swap `checkpoint()` in —
  * to survive executor loss during long runs; semantics are identical).
  *
  * Determinism: the fixpoint is the unique star forest rooted at each
  * component's minimum id, and the convergence test is an EXACT
  * set-difference (never a hash/signature that could collide), so the
  * result is the same on any cluster layout and any iteration
  * interleaving — integer-exact, oracle-checkable against a recursive
  * CTE (q70).
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `edges(srcCol, dstCol)`.
    *
    * Returns (node, component): one row per distinct node appearing in
    * any edge; `component` is the minimum node id of its connected
    * component (ids must be an orderable type — long for the document
    * pipeline). Nodes not mentioned in `edges` (singletons) are the
    * caller's to add — see [[graft.api.TextCuration.dedupClusters]].
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, maxRounds: Int = 64): DataFrame = {
    var e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .distinct()
      .transform(Lineage.pin)
    if (e.isEmpty) return e.select(col("u").as("node"), col("v").as("component")).limit(0)

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = Lineage.pin(smallStar(largeStar(e)))
      // exact set equality (both sides are distinct): a false "converged"
      // would return a non-star edge set, i.e. wrong components — never
      // trade this check for a cheaper checksum
      converged = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      e = next
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")

    // fixpoint is a star forest oriented child -> root (root = component
    // min); roots label themselves
    e.select(col("u").as("node"), col("v").as("component"))
      .unionAll(e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Large-star: every node's strictly-larger neighbors hook onto the
    * minimum of its closed neighborhood. Both edge directions feed the
    * neighborhood, so min is over Γ(u) ∪ {u}.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient every edge larger -> smaller; each node and its
    * smaller neighbors hook onto the smallest neighbor.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    dir.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionAll(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }
}
