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
    val e = intercept[IllegalArgumentException] {
      PageRank.runInt(df, "s", "d", iters = 1, scale = Long.MaxValue / 10)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }
}
