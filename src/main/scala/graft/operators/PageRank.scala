package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list, in EXACT scaled-integer
  * arithmetic — the link-analysis / importance-scoring member of the
  * iterative-graph family next to [[ConnectedComponents]] (a curation
  * pipeline uses it to rank documents/domains by citation structure, or
  * parts by co-purchase centrality, before sampling).
  *
  * Why integers: the textbook float formulation sums incoming
  * contributions per node, and float sums are association-dependent —
  * a different partitioning (or engine) gives a different 15th decimal,
  * which breaks bit-exact verification and run-to-run reproducibility.
  * Here ranks are BIGINTs scaled by `scale` (default 10^12, i.e. 1.0 ==
  * 1e12); each iteration computes
  *
  *   rank'(v) = base + (dampNum * Σ_{u→v} (rank(u) div outdeg(u)))
  *                     div dampDen
  *
  * with `base = scale·(dampDen−dampNum) div dampDen` — every operation
  * an exact integer multiply/divide/sum, so the result is bit-identical
  * on ANY partitioning, cluster layout, or engine (q121 is hash-gated
  * against a chained-CTE DuckDB oracle). The div-truncation "loses"
  * < 1 ulp of the scaled value per hop — at scale 10^12 that is a
  * relative error of ~1e-12 per iteration, far below float epsilon
  * accumulation, and identically reproduced everywhere.
  *
  * Normalization: ranks start at `scale` (≡ 1.0) per node, so values
  * sum to ~nNodes·scale like the "sum = N" PageRank convention.
  * Dangling nodes (in-edges but no out-edges) keep receiving mass but
  * re-emit none — the simplified no-redistribution variant; on a
  * symmetric edge set (e.g. co-occurrence graphs) none exist.
  *
  * Scale shape: per iteration ONE keyed join of ranks onto the (static,
  * localCheckpoint-pinned) out-degree-annotated edge list plus one
  * partial-agg shuffle of per-edge contributions — work ∝ |E|, driver
  * sees only counters. Lineage is flattened per iteration the same way
  * [[ConnectedComponents]] does (swap in reliable `checkpoint()` on a
  * production cluster to survive executor loss).
  */
object PageRank {

  /** `iters` exact damped iterations over `edges(srcCol, dstCol)`.
    * Returns (node, pr_scaled): one row per distinct endpoint;
    * `pr_scaled` is the rank in EFFECTIVE-scale-ths — the requested
    * `scale` self-capped to the largest power of 10 that cannot
    * overflow a 64-bit sum at this graph's node count
    * ([[effectiveScale]]; the cap never binds at oracle-gated sizes).
    * The effective scale is stamped on the `pr_scaled` column as
    * metadata ([[scaleOf]] reads it back). Self-loops and
    * null endpoints are dropped; parallel edges collapse (unweighted
    * graph).
    */
  def runInt(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
             scale: Long = 1000000000000L, dampNum: Long = 85L,
             dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(scale > 0 && dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen and scale > 0: $scale, $dampNum/$dampDen")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .distinct()
      .transform(Lineage.pin)
    val deg = e.groupBy("u").agg(count(lit(1)).as("outdeg"))
    // static per-iteration operand: edges annotated with the source's
    // out-degree, pinned once so the loop re-reads blocks, not lineage
    val ed = Lineage.pin(e.join(deg, "u"))
    val nodes = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .distinct()
      .transform(Lineage.pin)
    // overflow-proof EFFECTIVE scale: the largest sum a node can
    // receive is the whole graph's rank mass (~nNodes·scale), then
    // scaled by dampNum before the divide — the star-graph worst case.
    // Rather than refusing big graphs outright (the fixed 1e12 scale
    // capped exact ranks at ~10^5 nodes — an sf1 bench found it), the
    // scale self-caps to the largest power of 10 that cannot wrap:
    // at 10^8 nodes that still leaves scale 1e9, i.e. ~1e-9 relative
    // granularity per hop, far below float epsilon accumulation. The
    // effective scale is a deterministic function of the graph's node
    // count, so results stay bit-reproducible for a given input; below
    // the cap (every oracle-gated size) it equals the requested scale.
    val nNodes = nodes.count()
    require(nNodes > 0, "empty graph: no non-loop edges")
    val eff = effectiveScale(nNodes, scale, dampNum)
    val base = (eff * (dampDen - dampNum)) / dampDen
    // Join strategy for the iteration, decided from the EXACT |V| just
    // counted (guide §3.1 — broadcast the side that fits, deliberately):
    // a pinned RDD reports UnknownPartitioning, so the shuffle-join
    // iteration re-exchanges the STATIC pinned edge list by u AND the
    // pinned node list by node EVERY hop (the r21 before-plan holds 32
    // exchanges for 5 iterations; only the contribution aggregate's
    // exchange is fundamental). Below the cap, what moves per hop is
    // the RANK VECTOR — |V| rows of two BIGINTs — so broadcast it: both
    // hop joins become BroadcastHashJoins over pinned blocks and the
    // per-hop shuffle count drops to ONE (the contribution aggregate).
    // Above the cap (a billion-node rank vector cannot broadcast) the
    // shuffle shape stays; the arithmetic is identical either way, so
    // results are bit-equal by construction (oracle-gated).
    val bcastCapBytes = edges.sparkSession.conf
      .get("spark.graft.pagerank.broadcastRanksBytes", (64L << 20).toString).toLong
    val bcastRanks = nNodes <= bcastCapBytes / 32L // ~32 B/row in the built hash relation
    var ranks = nodes.withColumn("rank", lit(eff))
    for (i <- 1 to iters) {
      val rankSide = if (bcastRanks) broadcast(ranks) else ranks
      val contrib = ed.join(rankSide, col("u") === col("node"))
        .select(col("v"), expr("rank DIV outdeg").as("__c"))
        .groupBy("v").agg(sum("__c").as("__s"))
      val contribSide = if (bcastRanks) broadcast(contrib) else contrib
      ranks = nodes.join(contribSide, col("node") === col("v"), "left")
        .select(col("node"),
          expr(s"${base}L + ($dampNum * coalesce(__s, 0L)) DIV $dampDen").as("rank"))
      // A checkpoint EXECUTES a job, so flattening every iteration
      // would pay one materialization per hop (measured ~40% of q121's
      // runtime); a few stacked join+agg levels are cheap to replan.
      // Flatten only every 8th hop — deep-iteration runs stay bounded,
      // short runs (the common 5-20) run as ONE job over the loop.
      if (i % 8 == 0 && i < iters) ranks = Lineage.pin(ranks)
    }
    // the effective scale rides the result as column metadata: a caller
    // dividing pr_scaled without it would reconstruct ranks off by
    // powers of 10 whenever the overflow cap bound (or a non-power-of-10
    // request rounded down) — scaleOf reads it back without re-deriving
    // the cap formula
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(ScaleMetadataKey, eff).build()
    ranks.select(col("node"), col("rank").as("pr_scaled", md))
  }

  /** Metadata key under which [[runInt]] records the effective scale on
    * the `pr_scaled` column.
    */
  val ScaleMetadataKey = "graft.pagerank.scale"

  /** The scale [[runInt]] actually uses for a graph of `nNodes` nodes:
    * the largest power of 10 that is <= the requested `scale` AND cannot
    * overflow a 64-bit sum at this node count (star-graph worst case —
    * one node receiving the whole graph's rank mass, times dampNum
    * before the divide). Deterministic in (nNodes, scale, dampNum), so
    * callers can size requests up front; below the cap (every
    * oracle-gated size) it equals the requested scale rounded down to a
    * power of 10.
    */
  def effectiveScale(nNodes: Long, scale: Long = 1000000000000L, dampNum: Long = 85L): Long = {
    require(nNodes > 0 && scale > 0 && dampNum > 0, s"need positive args: $nNodes, $scale, $dampNum")
    val cap = Long.MaxValue / nNodes / (dampNum + 1)
    require(cap >= 1000000L,
      s"graph too large for exact 64-bit ranks even at scale 1e6: $nNodes nodes")
    var eff = 1L
    while (eff * 10 <= math.min(scale, cap)) eff *= 10
    eff
  }

  /** Read the effective scale [[runInt]] stamped on a result — the
    * divisor that converts `pr_scaled` back to ~1.0-normalized ranks.
    */
  def scaleOf(ranks: DataFrame): Long = {
    val md = ranks.schema("pr_scaled").metadata
    require(md.contains(ScaleMetadataKey),
      "frame carries no pagerank scale metadata (not a runInt result, or reshaped)")
    md.getLong(ScaleMetadataKey)
  }
}
