package graft

import graft.api.{TextCuration, VectorSearch}
import graft.operators.{GlobalOrder, Layout, Stats, TimeSeries}
import org.apache.spark.sql.functions._

/** The README's "Using the library" snippet, executed: every call shape
  * advertised to users runs here on tiny frames, so API drift from the
  * documentation fails the suite instead of failing a user. Keep in
  * sync with README.md — same functions, same argument shapes.
  */
class DocExamplesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "web"),
    (2L, "the quick brown fox jumps over the lazy dog again and again", "web"),
    (3L, "an entirely different document about shuffle partitioning today", "books"),
    (4L, "yet another unique piece of text mentioning joins and scans here", "books"),
  ).toDF("doc_id", "text", "source")

  test("README corpus-curation block runs as written") {
    val clean = TextCuration.curate(docs, "doc_id", "text",
      jaccardThreshold = 0.5, qualityFloor = 0.0, langs = Seq("en", "und"))
    assert(clean.count() >= 2) // dup 2 dropped, distinct docs survive
    val clusters = TextCuration.dedupClusters(docs, "doc_id", "text")
    assert(clusters.count() === 4) // every doc labeled with a cluster id
    val split = TextCuration.leakageSafeSplit(docs, "doc_id", "text", valBp = 1500)
    assert(split.columns.contains("split") && split.count() === 4)
    val packed = TextCuration.packSequences(docs, "doc_id", "text", "source", budget = 2048)
    assert(packed.count() === 4)
    val sharded = GlobalOrder.shuffleShard(docs, "doc_id", nshards = 4)
    assert(sharded.select("shard").distinct().count() <= 4)
  }

  test("README incremental-index block runs as written") {
    val base = tmpDir("docexamples").toString
    val newBatch = Seq((10L, "the quick brown fox jumps over the lazy dog again and again", "web"))
      .toDF("doc_id", "text", "source")
    TextCuration.buildLshIndex(docs, "doc_id", "text", s"$base/lsh")
    val dups = TextCuration.lshCandidatesIndexed(newBatch, "doc_id", "text", s"$base/lsh")
    assert(dups.count() >= 1) // the re-crawl matches its near-dups
    TextCuration.buildHashIndex(docs, "doc_id", "text", s"$base/hash")
    val recrawls = TextCuration.exactDupsAgainstIndex(newBatch, "doc_id", "text", s"$base/hash")
    assert(recrawls.collect().map(_.getLong(1)).toSet === Set(1L)) // canonical of the dup pair
  }

  test("README similarity-search block runs as written") {
    val base = tmpDir("docexamples_ivf").toString
    val embs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(d => if (i % 4 == d) 1.0f else 0.05f * ((i + d) % 3)))
    }.toDF("vec_id", "embedding")
    VectorSearch.buildIvfIndex(embs, "vec_id", "embedding", s"$base/ivf", nClusters = 4, sampleN = 40)
    val queries = embs.filter($"vec_id" === 0L)
    val hits = VectorSearch.annIvfIndexed(spark, s"$base/ivf", queries, "vec_id", "embedding",
      nprobe = 4, k = 5)
    assert(hits.count() === 5)
  }

  test("README ranked-retrieval / hybrid-search block runs as written") {
    import graft.api.Retrieval
    val base = tmpDir("docexamples_bm25").toString
    Retrieval.buildBm25Index(docs, "doc_id", "text", s"$base/bm25")
    val lexical = Retrieval.bm25Indexed(spark, s"$base/bm25", "doc_id",
      Seq("fox", "shuffle"), topK = 50)
    assert(lexical.count() === 3) // docs 1, 2 (fox) and 3 (shuffle)
    val embs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(4)(d => if (i % 4 == d) 1.0f else 0.05f))
    }.toDF("vec_id", "embedding")
    val vecHits = VectorSearch.knn(embs, embs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 50)
    val fused = Retrieval.rrfFuse(lexical, "doc_id", "rank",
      vecHits.select("vec_id", "rank"), "vec_id", "rank", topK = 20)
    assert(fused.columns.toSeq === Seq("id", "rrf_score", "rank_a", "rank_b", "rank"))
    assert(fused.count() > 0)
    val diverse = VectorSearch.kcenterAssign(embs, "vec_id", "embedding", k = 8, startId = 0L)
    assert(diverse.count() === 12)
    val kept = VectorSearch.semDedup(embs, "vec_id", "embedding", k = 8, startId = 0L,
      minCosine = 0.9)
    assert(kept.columns.toSeq === Seq("vec_id", "center_id", "keep"))
    assert(kept.count() === 12)
  }

  test("README scale-first-joins block runs as written") {
    import graft.operators.{Bucketing, Skew}
    val events = (1L to 400L).map(i => (i % 20, i)).toDF("user_id", "event_id")
    val customers = (0L to 19L).map(i => (i, s"c$i")).toDF("c_custkey", "c_name")
    val (joined, decision) = Skew.autoPlan(events, "user_id", col("event_id"),
      customers, "c_custkey")
    assert(decision.strategy === "broadcast" && joined.count() === 400L)
    val orders = (1L to 300L).map(i => (i, s"o$i")).toDF("o_orderkey", "o_v")
    val lineitem = (1L to 900L).map(i => (i % 300 + 1, i)).toDF("l_orderkey", "l_no")
    try {
      Bucketing.writeBucketed(orders, "docex_orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem, "docex_lineitem_b", "l_orderkey", 4)
      val colocated = Bucketing.bucketedEquiJoin(spark, "docex_orders_b", "docex_lineitem_b",
        "o_orderkey", "l_orderkey")
      assert(colocated.count() === 900L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS docex_orders_b")
      spark.sql("DROP TABLE IF EXISTS docex_lineitem_b")
    }
  }

  test("README analytics/profiling block runs as written") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0, "click", 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 3.0, "click", 2L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2.0, "view", 3L),
    ).toDF("user_id", "ts", "value", "event_type", "event_id")
    val p99 = Stats.histogramQuantiles(events, Seq("event_type"), "value", Seq(5000, 9900))
    assert(p99.count() > 0)
    val locf = TimeSeries.gapFillLocf(events, "user_id", "ts", "value", "event_id")
    assert(locf.count() === 4) // user 1: 10,11,12h grid; user 2: 11h
    val xy = Seq((1, 2), (3, 4), (5, 6)).toDF("x", "y")
    val tiled = Layout.zorder(xy, "x", "y", bits = 4, nParts = 2)
    assert(tiled.count() === 3)
    val stats = Stats.profile(events, Seq("value", "event_type", "ts"))
    assert(stats.count() === 3 && stats.columns.contains("ndv"))
    val part = Seq((1L, 10.0, 3), (2L, 5.0, 7), (3L, 20.0, 1), (4L, 12.0, 5)).toDF("p_partkey", "p_retailprice", "p_size")
    val front = graft.operators.Skyline.skyline2d(part, "p_retailprice", "p_size")
    // 4 (12, 5) is dominated by 1 (10, 3); the staircase 2-1-3 survives
    assert(front.select("p_partkey").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val ranks = graft.operators.PageRank.runInt(edges, "src", "dst", iters = 10)
    assert(ranks.count() === 3)
  }

  test("README transactional-lake-table block runs as written") {
    import graft.sources.{ChangeFeedView, ManifestTable, MemberIndex}
    val lake = tmpDir("docexamples_lake").toString
    val batch = Seq(
      (11L, "O", 10.0, java.sql.Date.valueOf("2024-01-02")),
      (222L, "F", 20.0, java.sql.Date.valueOf("2024-01-05")),
      (333L, "O", 30.0, java.sql.Date.valueOf("2024-01-09")),
    ).toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    ManifestTable.commitAudited(batch, lake, track = Seq("o_orderdate"),
      audit = b => Stats.dqChecks(b, notNull = Seq("o_orderkey"),
        uniqueKeys = Seq(Seq("o_orderkey"))))
    MemberIndex.build(spark, lake, "o_orderkey")
    val rows = MemberIndex.lookup(spark, lake, "o_orderkey", Seq(11L, 222L))
    assert(rows.count() === 2)
    val view = ChangeFeedView.init(spark, lake, Seq("o_orderstatus"), "o_totalprice")
    ManifestTable.merge(Seq((11L, "F", 99.0, java.sql.Date.valueOf("2024-01-02")))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"), lake, Seq("o_orderkey"))
    val v2 = ChangeFeedView.advance(spark, view, lake,
      Seq("o_orderstatus"), "o_totalprice", fromV = 1L, toV = 2L)
    assert(v2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap === Map("O" -> 1L, "F" -> 2L))
    assert(ManifestTable.restore(lake, toVersion = 1L) === 3L)
    assert(ManifestTable.snapshot(spark, lake).count() === 3)
    val erasureKeys = Seq(222L).toDF("o_orderkey")
    ManifestTable.deleteByKey(erasureKeys, lake, Seq("o_orderkey"))
    assert(ManifestTable.snapshot(spark, lake).count() === 2)
    ManifestTable.materializeDeletes(spark, lake)
    assert(ManifestTable.snapshot(spark, lake).count() === 2)
  }

  test("README composed-ANN block runs as written") {
    val embs = (0 until 24).map { i =>
      (i.toLong, s"c${i % 2}", Array.tabulate(8)(d => if (d / 4 == i % 2) 1.0f + 0.01f * i else 0.0f))
    }.toDF("vec_id", "label", "embedding")
    val queries = embs.filter($"vec_id" < 2L)
    val ivfpq = VectorSearch.ivfPqSearch(embs, queries, "vec_id", "embedding", "label",
      dim = 8, m = 2, k = 2, nprobe = 1, topK = 5)
    assert(ivfpq.count() === 10)
    val negs = VectorSearch.hardNegatives(embs, queries, "vec_id", "embedding", "label", k = 5)
    assert(negs.count() === 10)
    // a hard negative never shares the anchor's label
    assert(negs.filter($"q_label" === $"neg_label").count() === 0)
    val (hits2, plan) = VectorSearch.annRoute(embs, queries, "vec_id", "embedding", k = 5,
      partCol = Some("label"))
    assert(plan == "brute" && hits2.count() === 10)
  }
}
