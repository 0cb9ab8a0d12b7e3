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
    // ONE shuffle builds the per-basket sorted item-set (collect_set
    // folds the incidence dedup into the same exchange a distinct()
    // would pay separately); pinned because the audit, the pair
    // explode, and the item counts all re-read it. The former shape —
    // distinct + pin + audit groupBy + self-join + countDistinct +
    // crossJoin — paid ~6 passes over the incidence list where this
    // pays 3 (basket agg, pair agg, item agg); measured 7.3 -> ~4 s at
    // sf1 for identical results.
    val byBasket = Lineage.pin(baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(basketCol).as("ok"))
      .agg(sort_array(collect_set(col(itemCol))).as("items")))
    // The pair generation below is Σ|basket|² — one pathological
    // mega-basket (a null-like sentinel id, a catch-all tenant)
    // dominates it QUADRATICALLY and melts a stage hours in. The audit
    // is one cheap scan of the pinned blocks, evaluated EAGERLY so the
    // failure lands before the quadratic stage is ever planned; the
    // SAME row also prices that stage (exact pair count) and carries
    // the basket count, killing the countDistinct subtree + crossJoin
    // the lift formula used to pay. Callers with legitimately huge
    // baskets raise the cap knowingly.
    val audit = byBasket.select(
      max(size(col("items"))).as("mx"),
      count(lit(1)).as("nb"),
      // 2x the pair count (Column `/` is IEEE division; halve exactly
      // on the driver instead)
      sum(size(col("items")).cast("long") * (size(col("items")) - 1)).as("np2")
    ).head()
    val nBaskets = audit.getLong(1)
    if (nBaskets == 0) {
      val idT = baskets.schema(itemCol).dataType
      return baskets.sparkSession.emptyDataFrame
        .select(lit(null).cast(idT).as("src"), lit(null).cast(idT).as("dst"),
          lit(0L).as("n_co"), lit(0.0).as("lift")).limit(0)
    }
    require(audit.getInt(0) <= maxBasketSize,
      s"a basket holds ${audit.getInt(0)} distinct items > maxBasketSize=$maxBasketSize — " +
        "the pair stage is quadratic per basket; filter/cap the basket upstream " +
        "or raise maxBasketSize deliberately")
    // size the PAIR stage by its OUTPUT (the q217 lesson: explode
    // amplification makes input partitioning meaningless) — ~500K
    // pairs/task bounds the partial-agg state; small inputs keep their
    // current layout and pay no exchange
    val nPairs = if (audit.isNullAt(2)) 0L else audit.getLong(2) / 2
    val wantParts = math.min((nPairs / 500000L) + 1, 1L << 20).toInt
    val src = if (wantParts > byBasket.rdd.getNumPartitions)
      byBasket.repartition(wantParts) else byBasket
    // all unordered pairs src < dst, generated from the sorted array
    // (two Generates, no join): the second explode filters to items
    // ABOVE src, so each pair is emitted exactly once per basket
    val pairs = src
      .select(explode(col("items")).as("src"), col("items"))
      .select(col("src"),
        explode(filter(col("items"), x => x > col("src"))).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("long").as("n_co"))
      .filter(col("n_co") >= minCo)
    val item = byBasket
      .select(explode(col("items")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).cast("long").as("ni"))
    // the lift joins are left to AQE: both sides' runtime sizes (pairs
    // post-minCo-filter, one row per distinct item) are usually tiny
    // and convert to broadcast, but neither is hint-forced — a
    // billion-item catalog must degrade to a shuffle, not OOM
    pairs
      .join(item.toDF("src", "ni_src"), "src")
      .join(item.toDF("dst", "ni_dst"), "dst")
      .select(col("src"), col("dst"), col("n_co"),
        ((col("n_co") * lit(nBaskets)).cast("double") /
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
