package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** ConnectedComponents (the q70 clustering core) against a driver-side
  * union-find reference — exact equality on every (node, component)
  * pair, across graph shapes chosen to stress the algorithm: long
  * chains (worst case for diameter-bound propagation, the shape
  * large-star/small-star exists to kill), stars, cliques, and seeded
  * random graphs.
  */
class GraphSpecs extends SparkSpec {
  import spark.implicits._

  /** Plain union-find with path compression; component = min member. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def check(edges: Seq[(Long, Long)], clue: String): Unit = {
    val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(edges), clue)
  }

  test("chain of 64 nodes collapses to one min-rooted component (log-round regime)") {
    check((0L until 63L).map(i => (i, i + 1)), "chain")
    // reversed edge orientation must not matter
    check((0L until 63L).map(i => (i + 1, i)), "reversed chain")
  }

  test("disjoint shapes: star, clique, pair, plus self-loops and duplicate edges") {
    val star = (1L to 10L).map(i => (100L, 100L + i))
    val clique = for (i <- 0 until 5; j <- i + 1 until 5) yield (200L + i, 200L + j)
    val noise = Seq((300L, 301L), (301L, 300L), (300L, 300L), (300L, 301L))
    check(star ++ clique ++ noise, "mixed shapes")
  }

  test("seeded random graphs match union-find exactly") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 120 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(e => e._1 != e._2)
      check(edges, s"random trial $trial")
    }
  }

  test("empty edge set returns an empty frame with (node, component) schema") {
    val out = ConnectedComponents.run(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(out.columns.toSeq === Seq("node", "component"))
    assert(out.isEmpty)
  }

  test("dedupClusters: pair-connected docs share a cluster, unpaired docs are singletons") {
    // near-identical docs (one token changed) cluster; distinct docs stay alone
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (1L, base),
      (2L, base.replace("today", "tonight")),
      (3L, base.replace("quick", "slow")),
      (4L, "completely different content with no overlap whatsoever in any shingle at all"),
    ).toDF("pid", "body")
    val out = graft.api.TextCuration.dedupClusters(corpus, "pid", "body")
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    // docs 1-3 are mutual LSH candidates -> one cluster rooted at 1
    assert(out.take(3).forall(r => r._2 == 1L && r._3 == 3L))
    assert(out(0)._4 && !out(1)._4 && !out(2)._4)
    // doc 4: singleton, canonical of itself
    assert(out(3) === ((4L, 4L, 1L, true)))
  }

  /** Driver-side mirror of PageRank.runInt's exact integer recurrence. */
  private def prReference(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val deg = e.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val base = (scale * 15L) / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = nodes.map(n => n -> (base + (85L * in.getOrElse(n, 0L)) / 100L)).toMap
    }
    r
  }

  test("pagerank: exact integer ranks match the driver recurrence; hub outranks leaves; dangling node keeps base mass") {
    import graft.operators.PageRank
    // star into 1 (hub), plus 4 -> 5 where 5 has no out-edges (dangling)
    val edges = Seq((2L, 1L), (3L, 1L), (1L, 2L), (4L, 5L), (2L, 3L))
    val got = PageRank.runInt(edges.toDF("s", "d"), "s", "d", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = prReference(edges, 5)
    assert(got === want, "Spark ranks must equal the exact driver recurrence")
    assert(got(1L) > got(4L), "the hub outranks an unreferenced source")
    // node 4 receives nothing: rank = base after one iteration, stays
    assert(got(4L) === (1000000000000L * 15L) / 100L)
    assert(got(5L) > got(4L), "the dangling sink still accumulates inbound mass")
  }

  test("pagerank is bit-identical under repartitioning and rejects overflow-risk scales") {
    import graft.operators.PageRank
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val df = edges.toDF("s", "d")
    val a = PageRank.runInt(df, "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.runInt(df.repartition(17), "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "integer arithmetic must make ranks partitioning-independent")
    assert(a === prReference(edges, 4))
    // an overflow-risk requested scale SELF-CAPS to the largest safe
    // power of 10 for this node count (40 nodes -> 1e15) instead of
    // refusing — big graphs keep exact ranks at reduced granularity
    val cappedDf = PageRank.runInt(df, "s", "d", iters = 1, scale = Long.MaxValue / 10)
    val capped = cappedDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = PageRank.runInt(df, "s", "d", iters = 1, scale = 1000000000000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped === direct, "capped scale must equal requesting the safe scale directly")
    // the EFFECTIVE scale is surfaced, not silently substituted: column
    // metadata carries it (scaleOf), and effectiveScale is the same
    // deterministic function callers can size against up front
    val nNodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
    assert(PageRank.scaleOf(cappedDf) == PageRank.effectiveScale(nNodes, Long.MaxValue / 10))
    assert(PageRank.scaleOf(PageRank.runInt(df, "s", "d", iters = 1)) == 1000000000000L,
      "below the cap the stamped scale equals the requested power of 10")
    // a non-power-of-10 request surfaces its rounded-down effective value
    assert(PageRank.effectiveScale(nNodes, 2500L) == 1000L)
  }

  // ---- Graph.triangleCounts ----------------------------------------------

  /** Naive driver-side reference: all node triples over the adjacency set. */
  private def triReference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- nodes; b <- adj(a) if b > a; c <- adj(b) if c > b
      if adj(a).contains(c)
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangle counts: cliques, hubs, and seeded random graphs match the naive reference") {
    import graft.operators.Graph
    // K5: every node is in C(4,2) = 6 triangles
    val k5 = for (i <- 0 until 5; j <- i + 1 until 5) yield (10L + i, 10L + j)
    // star: no triangles at all; duplicate + reversed + loop edges tolerated
    val star = (1L to 6L).map(i => (100L, 100L + i)) ++ Seq((101L, 100L), (100L, 100L))
    val got = Graph.triangleCounts(((k5 ++ star)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === k5.flatMap(e => Seq(e._1, e._2)).distinct.map(_ -> 6L).toMap,
      "K5 corners have 6 triangles each; the star contributes none")

    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val edges = Seq.fill(260)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("src", "dst")
      val a = Graph.triangleCounts(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a === triReference(edges), s"random trial $trial")
      // degree-orientation must not make the result partitioning-dependent
      val b = Graph.triangleCounts(df.repartition(13))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a === b, s"repartition trial $trial")
    }
  }

  // ---- Graph.bfsHops -----------------------------------------------------

  /** Driver-side BFS from the max-degree (min-id tiebreak) node. */
  private def bfsReference(edges: Seq[(Long, Long)], maxHops: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val source = adj.toSeq.map { case (n, vs) => (n, vs.size) }
      .sortBy { case (n, d) => (-d, n) }.head._1
    val dist = scala.collection.mutable.Map(source -> 0L)
    var frontier = Set(source)
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      frontier.foreach(dist(_) = h.toLong)
    }
    dist.toMap
  }

  test("bfs hops: exact shortest distances from the max-degree seed, bounded depth") {
    import graft.operators.Graph
    // two chains hanging off a hub (node 0 has degree 4: the seed), plus
    // a shortcut that makes one node reachable at distance 2 via two paths
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 5L), (5L, 6L), (6L, 7L), (2L, 5L), (7L, 8L))
    for (cap <- Seq(0, 1, 3, 8)) {
      val got = Graph.bfsHops(edges.toDF("src", "dst"), maxHops = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bfsReference(edges, cap), s"cap=$cap")
    }
    val rnd = new scala.util.Random(23)
    val rand = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val got = Graph.bfsHops(rand.toDF("src", "dst"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bfsReference(rand, 4), "random graph")
  }

  // ---- Graph.coOccurrence ------------------------------------------------

  test("co-occurrence: exact pair supports and lift on a hand-checked basket set") {
    import graft.operators.Graph
    // baskets: {A,B,C}, {A,B}, {A,C}, {B,C}, {A,B} (duplicate incidence rows tolerated)
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B"), (4L, "C"),
      (5L, "A"), (5L, "B"))
    val got = Graph.coOccurrence(rows.toDF("basket", "item"), "basket", "item", minCo = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // n_baskets = 5; n_A = 4, n_B = 4, n_C = 3
    assert(got === Map(
      ("A", "B") -> ((3L, 3.0 * 5 / (4 * 4))),
      ("A", "C") -> ((2L, 2.0 * 5 / (4 * 3))),
      ("B", "C") -> ((2L, 2.0 * 5 / (4 * 3)))), got.toString)
  }

  test("co-occurrence: a mega-basket fails fast BEFORE the quadratic pair join (r9 watch item)") {
    import graft.operators.Graph
    // basket 0 is a pathological catch-all holding 50 distinct items
    val rows = (1L to 50L).map(i => (0L, s"item$i")) ++ Seq((1L, "a"), (1L, "b"))
    val e = intercept[IllegalArgumentException] {
      Graph.coOccurrence(rows.toDF("basket", "item"), "basket", "item",
        minCo = 1, maxBasketSize = 20).collect()
    }
    assert(e.getMessage.contains("maxBasketSize") && e.getMessage.contains("50"), e.getMessage)
    // raising the cap deliberately lets the same data through
    assert(Graph.coOccurrence(rows.toDF("basket", "item"), "basket", "item",
      minCo = 1, maxBasketSize = 50).count() > 0)
  }

  test("coMembershipEdges: exact weighted edge list, and a mega-basket fails the same eager audit (q121's edge build)") {
    import graft.operators.Graph
    // baskets {A,B,C} and {A,B}: pair (A,B) shares 2 baskets -> weight 2
    val rows = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"), (2L, "B"), (2L, "B"))
    val got = Graph.coMembershipEdges(rows.toDF("basket", "item"), "basket", "item")
      .groupBy("src", "dst").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("A", "B") -> 2L, ("B", "A") -> 2L,
      ("A", "C") -> 1L, ("C", "A") -> 1L,
      ("B", "C") -> 1L, ("C", "B") -> 1L), got.toString)
    // the pathological catch-all order dies BEFORE the quadratic join
    val mega = (1L to 50L).map(i => (0L, s"item$i")) ++ Seq((1L, "a"), (1L, "b"))
    val e = intercept[IllegalArgumentException] {
      Graph.coMembershipEdges(mega.toDF("basket", "item"), "basket", "item",
        maxBasketSize = 20)
    }
    assert(e.getMessage.contains("maxBasketSize"), e.getMessage)
  }
}
