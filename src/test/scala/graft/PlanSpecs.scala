package graft

import graft.queries.QueryCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan shape assertions for the scale-critical properties:
  * filters reach the parquet scan, projections prune the read schema,
  * top-k never plans a full sort, fixed-cardinality dims broadcast.
  * These are the properties that decide whether a query that passes at
  * sf0.01 still works at 100 TB — so they are pinned as tests, not just
  * eyeballed once in explain output.
  */
class PlanSpecs extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  private def q(name: String): DataFrame = QueryCatalog.byName(name).fn(spark, dir)

  test("q2: both predicates push into the parquet scan and the read schema is pruned to 4 columns") {
    val p = q("q2_scan_filter").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(p_size,1)") && p.contains("LessThanOrEqual(p_size,15)"), p)
    // the PushedFilters list is elided with "..." in toString; the
    // equality pushdown is visible in DataFilters on the same scan node
    assert(p.contains("= PROMO)"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("p_partkey", "p_name", "p_retailprice", "p_size", "p_type").forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("p_brand") && !readSchema.contains("p_retailsize"), readSchema)
  }

  test("q9: global top-k plans as TakeOrderedAndProject (per-partition heap), not a full sort") {
    val p = planString(q("q9_topk_sort"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q3: top-k after agg is TakeOrderedAndProject and the filtered customer side broadcasts at this size (AQE choice, not a forced hint)") {
    val p = planString(q("q3_topk_join"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q4: fixed-cardinality dims (nation x region) broadcast; shipdate-range filter pushes into the orders scan") {
    val p = planString(q("q4_join_agg_multi"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
  }

  test("q1: aggregation runs partial (map-side) then final — one shuffle of partial states only") {
    val p = planString(q("q1_agg"))
    assert(p.contains("HashAggregate"), p)
    // partial + final pair => the string carries two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q42: the watermark range predicate reaches the parquet scan as pushed filters") {
    val p = q("q42_incremental_sync").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"), p)
  }

  test("native kernels appear in the plan (not HOF fallbacks) for similarity queries") {
    val p = q("q31_knn_brute").queryExecution.executedPlan.toString
    assert(p.contains("graft_vec_dot"), p)
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("q1: decimal sums run on the 128-bit accumulator, not BigDecimal Sum buffers") {
    val p = planString(q("q1_agg"))
    assert(p.contains("graft_dsum128"), p)
    // the old path materialized decimal(30,2) casts into the aggregate
    assert(!p.contains("sum(cast"), p)
  }

  test("q23: marker counting is the codegen'd kernel, not an interpreted HOF filter") {
    val p = q("q23_lang_id").queryExecution.executedPlan.toString
    assert(p.contains("graft_marker_count"), p)
    assert(!p.contains("filter(tok"), p)
  }

  test("q47: the ext-JSON projection is never executed twice for sort placement") {
    // Two legal shapes from Sorting.projected: a tiny base (this sf)
    // takes the exchange-free path — Coalesce 1 + local Sort BELOW the
    // projection, so there is no sampling pass at all; a big base
    // range-partitions, where the ext-JSON kernels must appear only
    // ABOVE the exchange (below it the range-boundary sampling pass
    // would execute them a second time).
    val p = planString(q("q47_extended_json"))
    val at = p.indexOf("rangepartitioning")
    if (at < 0) {
      assert(p.contains("Coalesce 1"), s"expected the exchange-free tiny-base shape in\n$p")
      val sortAt = p.indexOf("Sort [")
      assert(sortAt >= 0, p)
      assert(!p.substring(sortAt).contains("graft_ext_json"),
        s"ext-JSON work below the local sort (projection must run once, post-sort):\n$p")
    } else {
      val above = p.substring(0, at)
      val below = p.substring(at)
      assert(above.contains("graft_ext_json"), s"kernels missing above the exchange\n$p")
      assert(!below.contains("graft_ext_json"),
        s"ext-JSON work below the range exchange (sampling would run it twice):\n$below")
    }
  }

  test("q73: chunking is map-only — no exchange anywhere in the plan") {
    val p = planString(q("q73_doc_chunking"))
    // one range exchange exists only for the final orderBy; the chunking
    // itself (tokenize + sequence explode + slice) must add none, so
    // exactly the sort's exchange appears
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(p.contains("Generate explode"), p)
  }

  test("q74: histogram median aggregates partially map-side; no raw-row window/sort") {
    val p = planString(q("q74_hist_median"))
    // the corpus-scale groupBy must be partial -> final
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    // the window runs AFTER the histogram agg, never over raw lineitem:
    // its child subtree must contain the hash aggregate
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, p)
    assert(p.substring(winIdx).contains("HashAggregate"), p)
  }

  test("q71: stratified sampling plans no join — rate lookup is a CASE in the filter") {
    val p = planString(q("q71_stratified_sample"))
    assert(!p.contains("Join"), p)
    assert(p.contains("graft_poly_hash"), p)
  }

  test("q65: repetition stats are map-only — the one-pass kernel, no explode, no aggregate exchange") {
    val df = graft.api.TextCuration.repetitionStats(
      Tables(spark, dir).documents, "doc_id", "text")
    val p = planString(df)
    assert(p.contains("graft_rep_stats"), p)
    assert(!p.contains("Generate"), p) // no explode
    assert(!p.contains("Exchange"), p)
  }

  test("q102: all four distribution window functions share ONE exchange (one keyed shuffle serves ntile/percent_rank/cume_dist/dense_rank)") {
    val p = planString(q("q102_window_dist"))
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected one exchange, got $exchanges:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q78: the per-domain rank limit is pushed map-side (WindowGroupLimit before the exchange)") {
    val p = planString(q("q78_domain_caps"))
    // Partial mode runs on the scan side of the exchange, Final above it —
    // the shuffle carries at most k rows per (input partition, domain).
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("q77: shuffle-shard never plans a single-partition stage; offsets broadcast") {
    val df = graft.operators.GlobalOrder.shuffleShard(
      Tables(spark, dir).documents.select("doc_id"), "doc_id", nshards = 8)
    val p = planString(df)
    // THE property: the naive row_number-over-everything formulation
    // plans Exchange SinglePartition (one task sorts the corpus); the
    // bucketed layout must not.
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin"), p) // 256-row offset table broadcasts
  }

  test("q79: Unicode normalization is map-only — codegen'd expression, no exchange before the output sort") {
    val df = Tables(spark, dir).documents
      .selectExpr("doc_id", "graft_uninorm(text, 'NFC') AS norm_text")
    val p = planString(df)
    assert(p.contains("graft_uninorm"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q91: the vocabulary top-N plans TakeOrderedAndProject, not a full sort of the term table") {
    val p = planString(q("q91_vocab_build"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q86: the phrase lookup prunes to one index bucket (static partition filter, folded hash literal)") {
    val docs = Tables(spark, dir).documents
    val tmp = java.nio.file.Files.createTempDirectory("phraseidx_plan").toString
    graft.api.TextCuration.buildPhraseIndex(docs, "doc_id", "text", n = 2, path = tmp)
    val p = planString(
      graft.api.TextCuration.phraseSearch(docs, "doc_id", "text", tmp, "key hash"))
    // graft_poly_hash('key hash') constant-folds, so the scan carries a
    // bucket partition filter — ONE directory read, not an index scan
    val scanLine = p.linesIterator.find(l => l.contains("PartitionFilters") && l.contains("bucket"))
    assert(scanLine.isDefined, p)
    assert(scanLine.get.contains("bucket"), scanLine.get)
  }

  test("q116: correlated EXISTS/NOT EXISTS decorrelate to one semi + one anti hash join — no per-row subquery") {
    val p = planString(q("q116_exists_subquery"))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q120: the lateral ORDER BY ... LIMIT decorrelates to a ranked join — no per-customer re-scan of orders") {
    val p = planString(q("q120_lateral_topn"))
    // the correlated top-2 becomes a window/group-limit over ONE join,
    // and at this size the customer side broadcasts
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q117: mode plans two hash aggregations, no ranking window") {
    val p = planString(q("q117_mode"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("q145: the bloom filter evaluates on the fact side BEFORE the exact semi join") {
    val p = planString(q("q145_bloom_join"))
    assert(p.contains("might_contain"), p)
    // the bloom probe must gate the SCAN side (a Filter above the
    // lineitem scan), not run after the join — that ordering is the
    // entire point of the operator at scale
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"bloom probe should sit below the semi join in the plan tree:\n$p")
  }

  test("q146: the salted join keys on BOTH the natural key and the salt") {
    val p = planString(q("q146_salted_join"))
    assert(p.contains("__graft_salt"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("q153: the zone-map build is one partial+final aggregate pair over the scan — no join, no window") {
    val p = planString(q("q153_zonemap"))
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q143: VWAP is one map-side-combined aggregation over the pruned scan") {
    val p = planString(q("q143_vwap"))
    assert(!p.contains("Join"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_suppkey"), readSchema)
  }

  test("catalog-wide join audit: no CartesianProduct; nested-loop joins only where a bounded side is documented") {
    // BroadcastNestedLoopJoin is legitimate ONLY where one side is
    // bounded (broadcast query/probe sets, fixed-cardinality reps) or
    // the query is a documented quadratic recall baseline. Anything
    // else is an accidental scale regression.
    val nljAllowed = Set(
      "q31_knn_brute",          // broadcast query set x corpus (guarded)
      "q32_ann_ivf",            // broadcast reps + broadcast probe (guarded)
      "q33_embedding_neardup",  // documented O(n^2) exact recall baseline
      "q224_cosine_auto",       // exact regime at oracle scale = q33's byte-guarded
                                // broadcast theta-join; above the probed cutoff the
                                // LSH-blocked path replaces it (equi-join on bucket)
      "q20_scalar_subquery",    // scalar subquery result joined as a 1-row side
      "q80_bigram_lm",          // vocabulary size: a broadcast 1-row aggregate side
      "q85_histogram",          // min/max bounds: a broadcast 1-row aggregate side
      "q91_vocab_build",        // total token count: a broadcast 1-row aggregate side
      "q104_bm25",              // (n, avgdl) corpus stats: a broadcast 1-row aggregate side
      "q106_rrf_hybrid",        // same 1-row stats side inside its BM25 input list
      "q109_collocations",      // token/bigram totals: two broadcast 1-row aggregate sides
      "q110_profile",           // string min/max: a broadcast 1-row aggregate side
      "q235_profile_approx",    // exact x sketch gate: both sides 3-row aggregates,
                                // col_name keys constant-fold to literals so the
                                // equi-join degenerates — bounded by construction
      "q130_basket_pairs",      // basket count: a broadcast 1-row aggregate side
      "q133_chi2_terms",        // corpus doc count: a broadcast 1-row aggregate side
      "q136_key_skew",          // summary stats: broadcast 1-row aggregate sides
      "q147_mix_divergence",    // langs x sources x 1-row total: all bounded aggregate sides
      "q151_benford",           // corpus row count: a broadcast 1-row aggregate side
      "q156_acf",               // broadcast 7-row lag table against the aggregated day series
      "q158_abc",               // grand-total: a broadcast 1-row aggregate side
      "q161_join_blowup",       // total-pairs: a broadcast 1-row aggregate side
      "q163_scalejoin_flagship", // ZoneMap null-zone gate: a broadcast <=1-row live-null side
      "q184_pq_adc",            // broadcast query set x coded corpus + broadcast 1-row codebook
      "q188_ivfpq",             // broadcast 1-row residual codebook (probe side is an equi-join)
      "q191_sharded_topk",      // Σ-eps total: a broadcast 1-row aggregate side
      "q193_hard_negatives",    // broadcast anchor set x corpus (q31's guarded knn shape)
      "q197_ann_route",         // routes to brute at TESTDATA scale = q31's guarded knn shape
      "q212_catalog_write_sql", // VERSION AS OF row count: a broadcast 1-row aggregate side
      "q213_catalog_delete_sql", // pre-delete row count: a broadcast 1-row aggregate side
      "q214_catalog_rowlevel_sql", // 1-row pre-DML count + 1-row max(_version) sides
      "q216_catalog_rename_sql") // VERSION AS OF 1 row count: a broadcast 1-row aggregate side
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    queries.QueryCatalog.all.foreach { q =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !nljAllowed(q.name))
        offenders += s"${q.name}: BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, s"unexpected unbounded join shapes:\n${offenders.mkString("\n")}")
  }

  test("profileApprox: no Expand, no dedup shuffle — every exchange carries 1-row partial states") {
    val t = Tables(spark, dir).lineitem
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
    // rsd 5% against a 10% gate — the q235 configuration (2 sigma of
    // headroom; rsd 2% measured 2.4x the aggregation cost for one
    // extra register bit, the wrong trade for a first-look pass)
    val ap = graft.operators.Stats.profileApprox(t, cols, rsd = 0.05)
    val p = planString(ap)
    // the exact profile pays input x cols through Expand (the standard
    // multi-distinct cost); the sketched twin must NOT
    assert(!p.contains("Expand"), s"profileApprox must not Expand:\n$p")
    assert(p.contains("approx_count_distinct"), p)
    // every shuffle is a SinglePartition rollup of per-partition
    // partial states — nothing reshuffles input rows by value
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
      .filterNot(_.contains("BroadcastExchange"))
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("SinglePartition")),
      s"profileApprox exchanges must be 1-row partial rollups:\n${exchanges.mkString("\n")}")
    // contrast pin: the exact twin DOES Expand (if Spark ever changes
    // that, the q110-vs-q235 trade documentation is stale)
    val exact = planString(graft.operators.Stats.profile(t, cols))
    assert(exact.contains("Expand"), exact)
    // and the sketch is honest: within 10% of exact on every column here
    val got = ap.select("col_name", "ndv").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.operators.Stats.profile(t, cols)
      .select("col_name", "ndv").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cols.foreach { c =>
      assert(math.abs(got(c).toDouble - want(c)) / math.max(1.0, want(c).toDouble) <= 0.10,
        s"$c: approx ${got(c)} vs exact ${want(c)}")
    }
  }
}