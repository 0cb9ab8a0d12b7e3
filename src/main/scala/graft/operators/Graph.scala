package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over plain edge-list DataFrames — the
  * co-occurrence / association-analysis family next to
  * [[ConnectedComponents]] (dedup clustering) and [[PageRank]]
  * (centrality). A curation pipeline builds these graphs from behavioral
  * co-occurrence (parts sharing an order, documents sharing near-dup
  * clusters, users sharing sessions) and mines structure from them:
  * association rules (which items imply which), community density
  * (triangle counts), and influence neighborhoods (bounded BFS).
  *
  * The reference outsources all record-level compute to its external
  * `data_pipeline` package and SQL stores
  * (/root/reference/parallelized_data_pipeline_dag.py:222 transform
  * steps [inferred]); none of these graph shapes are expressible there
  * without a client-side loop per row. Here every algorithm is a
  * sequence of keyed joins + partial aggregations that Catalyst plans as
  * ordinary shuffles, and ALL arithmetic is exact (BIGINT counts, one
  * final IEEE division for lift), so results are bit-identical on any
  * partitioning and hash-verifiable against a columnar oracle.
  *
  * Scale notes (100 TB):
  *  - [[coOccurrence]] work is ∝ Σ|basket|² (the pair self-join), the
  *    canonical market-basket layout; a pathological mega-basket should
  *    be capped upstream (one `filter` on basket size) exactly like
  *    mega-shingle-docs in the LSH family.
  *  - [[triangleCounts]] uses the degree-ordered compact-forward
  *    orientation: every edge points from its (degree, id)-smaller to
  *    its (degree, id)-larger endpoint, so wedges are enumerated at
  *    their LOWEST-degree apex — O(|E|^{3/2}) candidate wedges
  *    regardless of hub skew, where the naive id-ordered join is
  *    Σ deg(u)² and melts on a celebrity node. The DuckDB oracle runs
  *    the naive enumeration — per-node triangle counts are
  *    algorithm-independent, so the hash-match is exactly the
  *    equivalence theorem.
  *  - [[bfsHops]] shuffles one frontier-sized join per hop with the
  *    visited set as a left-anti guard; `localCheckpoint` flattens the
  *    iterated lineage the same way [[ConnectedComponents]] does.
  */
object Graph {

  /** Eager mega-basket audit shared by every Σ|basket|² pair join here:
    * one linear aggregate over the deduped (basket, item) incidence,
    * collected BEFORE the quadratic stage is planned, failing loudly
    * with the offending basket. `li` must have columns (ok, pk).
    */
  private def auditBasketSizes(li: DataFrame, maxBasketSize: Long): Unit = {
    val over = li.groupBy(col("ok")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") > maxBasketSize)
      .limit(1).collect()
    require(over.isEmpty,
      s"basket ${over.headOption.map(_.get(0)).getOrElse("")} holds ${over.headOption.map(_.get(1)).getOrElse("")} " +
        s"distinct items > maxBasketSize=$maxBasketSize — the pair join is quadratic per basket; " +
        "filter/cap the basket upstream or raise maxBasketSize deliberately")
  }

  /** Co-membership edge list: one directed edge per ordered pair of
    * DISTINCT items sharing a basket (both directions emitted; one edge
    * per shared basket, so pairs sharing k baskets carry weight k) —
    * the adjacency shape [[PageRank.runInt]] consumes for co-purchase
    * centrality (q121 builds the part graph from lineitem with it).
    * Same Σ|basket|² hazard as [[coOccurrence]], same EAGER mega-basket
    * audit: the failure lands before the quadratic join is ever
    * planned, instead of a stage melting hours into a 100 TB run on a
    * sentinel catch-all basket.
    */
  def coMembershipEdges(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Long = 10000L): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2: $maxBasketSize")
    val li = Lineage.pin(baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("ok"), col(itemCol).as("pk"))
      .distinct())
    auditBasketSizes(li, maxBasketSize)
    li.toDF("ok", "src").join(li.toDF("ok", "dst"), "ok")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
  }

  /** Market-basket co-occurrence with lift.
    *
    * Input: one row per (basket, item) incidence (duplicates tolerated —
    * deduped on entry). Output: one row per unordered item pair that
    * shares ≥ `minCo` baskets, `src < dst`, with the exact co-basket
    * count and the association lift
    *
    *   lift(a,b) = (n_co · n_baskets) / (n_a · n_b)
    *
    * — all-BIGINT numerator/denominator, one IEEE division, so the
    * double is bit-identical everywhere. lift > 1 ⇒ the pair co-occurs
    * more often than independence predicts (association-rule mining's
    * interest measure).
    */
  def coOccurrence(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minCo: Long = 2L,
      maxBasketSize: Long = 10000L): DataFrame = {
    require(minCo >= 1, s"minCo must be >= 1: $minCo")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2: $maxBasketSize")
    // Pinned (materialized once): the deduped incidence list feeds the
    // size audit, both pair-join sides, the item counts and the basket
    // count — pinning makes the audit a cheap scan of computed blocks
    // instead of a second distinct shuffle, and the consumers below
    // read the same blocks. (Reliable-checkpoint deployments flip the
    // session flag — see Lineage.)
    val li = Lineage.pin(baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("ok"), col(itemCol).as("pk"))
      .distinct())
    // The pair join below is Σ|basket|² — one pathological mega-basket
    // (a null-like sentinel id, a catch-all tenant) dominates it
    // QUADRATICALLY and melts a stage hours in. The size audit is one
    // cheap linear aggregate over the deduped rows, evaluated EAGERLY
    // so the failure lands before the quadratic stage is ever planned;
    // callers with legitimately huge baskets raise the cap knowingly.
    auditBasketSizes(li, maxBasketSize)
    val pairs = li.toDF("ok", "src").join(li.toDF("ok", "dst"), "ok")
      .filter(col("src") < col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("long").as("n_co"))
      .filter(col("n_co") >= minCo)
    val item = li.groupBy(col("pk")).agg(count(lit(1)).cast("long").as("ni"))
    val nb = li.select(countDistinct(col("ok")).cast("long").as("nb"))
    pairs
      .join(item.toDF("src", "ni_src"), "src")
      .join(item.toDF("dst", "ni_dst"), "dst")
      .crossJoin(broadcast(nb))
      .select(col("src"), col("dst"), col("n_co"),
        ((col("n_co") * col("nb")).cast("double") /
          (col("ni_src") * col("ni_dst")).cast("double")).as("lift"))
  }

  /** Per-node triangle counts over an undirected simple graph.
    *
    * Input: one row per undirected edge; either orientation, loops and
    * duplicates tolerated (canonicalized on entry). Output: (node,
    * n_tri) for every node in ≥ 1 triangle — each triangle contributes
    * 1 to all three corners.
    *
    * Algorithm: compact-forward. Rank nodes by (degree, id); orient
    * every edge rank-low → rank-high; enumerate wedges (y, z) at their
    * lowest-ranked apex x (so a hub of degree d is an apex only for
    * neighbors ranked above it); close each wedge against the oriented
    * edge set. Every triangle is found exactly once.
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"), greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).cast("long").as("d"))
    // orient rank-low -> rank-high; rank = (degree, id) lexicographic
    val oriented = sym
      .join(deg.toDF("u", "du"), "u")
      .join(deg.toDF("v", "dv").withColumnRenamed("v", "vv"), col("v") === col("vv"))
      .filter(struct(col("du"), col("u")) < struct(col("dv"), col("v")))
      .select(col("u").as("x"), col("v").as("y"), col("dv").as("dy"))
    // wedges at apex x, deduped by ranking the two out-neighbors
    val wedges = oriented.toDF("x", "y", "dy").join(oriented.toDF("x", "z", "dz"), "x")
      .filter(struct(col("dy"), col("y")) < struct(col("dz"), col("z")))
      .select(col("x"), col("y"), col("z"))
    // close: if edge {y,z} exists it is oriented y -> z (rank(y) < rank(z))
    val tri = wedges.join(
      oriented.select(col("x").as("y"), col("y").as("z")), Seq("y", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_tri"))
  }

  /** Bounded breadth-first hop distances from the graph's max-degree
    * node (ties broken by min id — a deterministic "most connected"
    * seed): (node, hops) for every node within `maxHops` undirected
    * hops of the source, hops = exact shortest distance. The k-hop
    * influence-neighborhood primitive.
    */
  def bfsHops(
      edges: DataFrame,
      maxHops: Int,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64, s"maxHops out of [0,64]: $maxHops")
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = und.unionAll(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(Lineage.pin)
    val source = sym.groupBy("src").agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("src")).limit(1)
      .select(col("src").as("node"))
    var dist = Lineage.pin(source.select(col("node"), lit(0L).as("hops")))
    var frontier = dist.select("node")
    var h = 1
    while (h <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(sym, frontier("node") === sym("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .transform(Lineage.pin)
      dist = Lineage.pin(dist.unionAll(next.select(col("node"), lit(h.toLong).as("hops"))))
      frontier = next.select("node")
      h += 1
    }
    dist
  }
}
