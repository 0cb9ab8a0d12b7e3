package graft.api

import graft.operators.{SearchKit, TextKit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval API over any (id, text) frame: BM25 scoring against
  * a fixed query-term set, and reciprocal-rank fusion of two ranked
  * lists (the standard hybrid-search combiner for a lexical list and a
  * vector list). The q104/q106 catalog queries delegate here, so both
  * functions sit behind the DuckDB oracle gate.
  *
  * Scale contract (100 TB corpus):
  *  - doc length is `size(tokens)` computed in the SAME projection as
  *    the posting explode — no separate doc-stats join, `dl` rides the
  *    groupBy key (constant per doc);
  *  - postings are exploded then immediately filtered to the query
  *    terms, so shuffled work is proportional to the query terms'
  *    postings, not the corpus token count (the inverted-index
  *    contract); the filter sits inside the generate-project pipeline,
  *    map-side;
  *  - `df` (3-ish rows) and the 1-row global avgdl aggregate join back
  *    via broadcast — no corpus-sized shuffle on either;
  *  - top-k is orderBy+limit = TakeOrderedAndProject per-partition
  *    heaps; only the k survivors see the rank window.
  *
  * Numerics: every score is built from [[graft.operators.SearchKit]]
  * fragments — correctly-rounded IEEE ops in a fixed textual order, no
  * libm — so results are bit-identical across engines and partitionings
  * (see SearchKit on the rational-idf trade).
  */
object Retrieval {

  private def validate(terms: Seq[String], topK: Int): Unit = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct.size == terms.size, s"duplicate query terms: $terms")
    require(topK > 0, s"topK must be positive: $topK")
  }

  /** Shared scoring tail for the direct and indexed paths: postings
    * (idCol, term, tf, dl, df) + the corpus-count and avgdl SQL exprs
    * -> fused per-doc score -> top-k with ranks. Both paths flow
    * through the SAME SearchKit arithmetic, so direct and indexed
    * results are bit-identical.
    */
  private def scoreAndTop(postings: DataFrame, idCol: String, terms: Seq[String],
                          nExpr: String, avgdlExpr: String,
                          k1: Double, b: Double, topK: Int): DataFrame = {
    val scored = postings
      .withColumn("s", expr(SearchKit.bm25Score(nExpr, "df", "tf", "dl", avgdlExpr, k1, b)))
      .groupBy(col(idCol))
      .agg(expr(SearchKit.fusedSum(terms, "term", "s")).as("score"))
    scored.orderBy(col("score").desc, col(idCol)).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("rank"), col("score"))
  }

  /** BM25 top-`topK` docs for `terms`: returns (idCol, rank, score),
    * rank 1 = best, ties broken by id ascending. Docs containing none
    * of the terms are absent (score would be 0).
    */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    validate(terms, topK)
    val toks = df.selectExpr(idCol, s"${TextKit.tokensSpark(textCol)} AS __tok")
    val dls = toks.selectExpr(idCol, "CAST(size(__tok) AS BIGINT) AS dl")
    val gl = dls.agg(
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"),
      count(lit(1)).cast("long").as("n"))
    val termList = terms.map(SearchKit.sqlStr).mkString(", ")
    // dl is constant per doc: carrying it in the grouping key costs
    // nothing and avoids a corpus-sized doc-stats join afterwards
    val tf = toks
      .selectExpr(idCol, "CAST(size(__tok) AS BIGINT) AS dl", "explode(__tok) AS term")
      .filter(expr(s"term IN ($termList)"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val postings = tf.join(broadcast(dfq), "term").crossJoin(broadcast(gl))
    scoreAndTop(postings, idCol, terms, "n", "avgdl", k1, b, topK)
  }

  /** Term-hash partition fan of a persisted BM25 index. */
  val Bm25IndexBuckets = 64

  /** Persist the full inverted index of a corpus at `path` — the
    * train-once half of the retrieval family (the phrase/LSH/hash/IVF
    * index pattern): serve-time queries read only their query terms'
    * bucket directories and re-tokenize nothing.
    *
    * Layout: `path/postings` = one (id, term, tf, dl, df) row per
    * distinct (doc, term), partitioned by `bucket = pmod(poly_hash(
    * term), Bm25IndexBuckets)`; `path/stats` = ONE row (n, sum_dl) of
    * exact BIGINTs, so serve-time avgdl is derived with the same
    * division the direct path computes. `df` is denormalized onto the
    * posting row (8 bytes against a string term it already carries) —
    * serving needs no second table join.
    *
    * Build cost: one explode + one (doc, term) shuffle for tf, one
    * tiny (term) agg broadcast back for df, one bucket repartition for
    * the write (the same write-shape note as buildPhraseIndex: without
    * it every task writes every bucket dir). Work ~ corpus tokens —
    * the one-time price the q104-per-query scan pays on EVERY query.
    */
  def buildBm25Index(df: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val spark = df.sparkSession
    // ONE tokenize pass over the corpus, total. The former build paid
    // three: the write plan held the tokenize+explode subtree TWICE
    // (the df-vocabulary aggregate's exchange and the join's posting
    // exchange hash by different plans, so ReuseExchange cannot unify
    // them), plus a source count() job and a postings read-back for the
    // (n, sum_dl) stats. Now: the postings are tokenized once and
    // PINNED (localCheckpoint — the same materialize-once trade the
    // optimization guide's §3.3 names: at corpus scale the pinned
    // blocks are shuffle-sized local-disk state, recomputation would be
    // a full second tokenize), the df aggregate and the bucket write
    // both read pinned blocks, and (n, sum_dl) ride the SAME pin job as
    // an `observe` on the doc-level rows before the explode — n counts
    // every doc row (zero-token docs have no posting rows but still
    // count toward avgdl's denominator, exactly as before), sum_dl
    // skips null-dl rows like the old distinct-(id, dl) read-back.
    // The observe()-carried stats are only valid when the pin below is a
    // localCheckpoint (one execution of the plan). With
    // graft.checkpoint.reliable=true, Lineage.pin uses eager
    // Dataset.checkpoint, which executes the plan TWICE (the eager
    // materialize job plus the reliable-checkpoint write recomputing the
    // lineage) — the CollectMetrics accumulators would double-count and
    // corrupt idf for every query against the index. In reliable mode,
    // skip the observe and read (n, sum_dl) back with the exact
    // source-side aggregate the pre-observe build used (one extra
    // tokenize pass — the price of loss-safe pins, paid only there).
    val reliablePin = spark.conf.get(graft.operators.Lineage.ReliableFlag, "false").toBoolean
    val obs = org.apache.spark.sql.Observation("bm25-build-stats")
    val docsBase = graft.operators.Par.widen(df.select(col(idCol), col(textCol)))
      .selectExpr(idCol, s"${graft.operators.TextKit.tokensSpark(textCol)} AS __tok")
      .selectExpr(idCol, "CAST(size(__tok) AS BIGINT) AS dl", "graft_term_tf(__tok) AS __tf")
    val docs = if (reliablePin) docsBase
      else docsBase.observe(obs, count(lit(1)).cast("long").as("n"),
        coalesce(sum("dl"), lit(0L)).cast("long").as("sum_dl"))
    val tf = graft.operators.Lineage.pin(docs
      .selectExpr(idCol, "dl", "explode(__tf) AS __e")
      .selectExpr(idCol, "dl", "__e.term AS term", "__e.tf AS tf")
      .withColumn("bucket", expr(s"CAST(pmod(graft_poly_hash(term), $Bm25IndexBuckets) AS INT)")))
    // corpus-vocabulary df: a plain (unhinted) join — the agg output's
    // runtime size lets AQE broadcast a small vocabulary and fall back
    // to a shuffle join (with skew split on mega-common terms) for a
    // web-scale one; a forced broadcast of an unbounded vocab would be
    // the wrong call at 100 TB
    val dfq = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    tf.join(dfq, "term")
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/postings")
    val st = if (reliablePin) batchStats(df, textCol)
      else { val m = obs.get; (m("n").asInstanceOf[Long], m("sum_dl").asInstanceOf[Long]) }
    writeStats(spark, st, path, batchId = 0L, fresh = true)
  }

  /** (id, dl, term, tf, bucket) postings of one frame — the shared
    * build/append tokenize+tf pass. Bucket is INT to match the type
    * the partitioned read infers back.
    */
  private def batchPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // tf is a PER-DOCUMENT property, so the whole pass is map-side:
    // graft_term_tf folds each doc's token array into (term, tf)
    // entries inside the row — the former explode + groupBy(id, term)
    // shape shuffled one row per TOKEN and aggregated a near-unique
    // key (one group per posting: the partial agg reduced nothing and
    // its map state was the whole corpus). Widened first because the
    // kernel is pure CPU arriving on a 1-2 partition scan.
    graft.operators.Par.widen(df.select(col(idCol), col(textCol)))
      .selectExpr(idCol, s"${TextKit.tokensSpark(textCol)} AS __tok")
      .selectExpr(idCol, "CAST(size(__tok) AS BIGINT) AS dl",
        "explode(graft_term_tf(__tok)) AS __e")
      .selectExpr(idCol, "dl", "__e.term AS term", "__e.tf AS tf")
      .withColumn("bucket", expr(s"CAST(pmod(graft_poly_hash(term), $Bm25IndexBuckets) AS INT)"))

  private def batchStats(df: DataFrame, textCol: String): (Long, Long) = {
    val r = df.selectExpr(s"CAST(size(${TextKit.tokensSpark(textCol)}) AS BIGINT) AS dl")
      .agg(count(lit(1)).cast("long"), coalesce(sum("dl"), lit(0L)).cast("long")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Corpus stats live as one exact (n, sum_dl) row PER APPLIED BATCH
    * in `stats/batch=<id>` partition dirs; serving sums them (exact
    * BIGINTs, order-free). This is what makes appends REPLAY-SAFE: a
    * re-run batch overwrites its own partition instead of double-adding
    * into a cumulative row — the same deterministic-partition
    * exactly-once layout as [[graft.streaming.DedupStream]].
    */
  private def writeStats(spark: org.apache.spark.sql.SparkSession, st: (Long, Long),
                         path: String, batchId: Long, fresh: Boolean): Unit =
    spark.sql(s"SELECT CAST(${st._1} AS BIGINT) AS n, CAST(${st._2} AS BIGINT) AS sum_dl, " +
        s"CAST($batchId AS BIGINT) AS batch")
      .coalesce(1)
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", if (fresh) "static" else "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/stats")

  /** Incrementally extend a [[buildBm25Index]] index with a batch of
    * NEW documents (ids not already indexed — the same append-only
    * contract as appendToIvfIndex) without touching the rest of the
    * corpus: a term lives in exactly ONE bucket, so `df` is
    * bucket-local, and only the batch's touched bucket dirs (bounded
    * by the bucket fan, collected control-plane) are read back,
    * merged with the batch's postings, re-df'd, and rewritten via
    * dynamic partition overwrite; untouched buckets are never read or
    * written. The batch's exact (n, sum_dl) lands as its OWN
    * `stats/batch=<id>` row. Serving after an append is bit-identical
    * to a fresh build over the union (spec'd).
    *
    * REPLAY-SAFE (single writer): re-running the same (batch, batchId)
    * — a crash at any point, or a streaming foreachBatch redelivery —
    * converges: the merged postings are `distinct()`-ed, so a batch
    * already folded into a touched bucket dedups away (a (id, dl,
    * term, tf) posting row is a pure function of the doc), and the
    * stats row overwrites its own batch partition instead of
    * double-adding. `batchId < 0` (the ad-hoc default) derives
    * max-applied + 1 — callers wanting replay safety (streaming)
    * MUST pass their redelivered batch id.
    */
  def appendToBm25Index(newRows: DataFrame, idCol: String, textCol: String, path: String,
                        batchId: Long = -1L): Unit = {
    val spark = newRows.sparkSession
    // Chain-regression guard (AggMaintain's twin), checked BEFORE any
    // write: an applied batch id STRICTLY newer than this one means the
    // stream was restarted with a fresh checkpoint against an existing
    // index — batch ids restart at 0 with NEW documents, so "appending"
    // would merge the new postings while REPLACING the old batch's
    // stats/batch=<id> row, silently undercounting (n, sum_dl) and
    // skewing every BM25 score. Equal stays allowed: that is the
    // legitimate replay window (batch N re-fires only if N never
    // committed), and the merge is idempotent for it.
    val applied = spark.read.parquet(s"$path/stats")
      .agg(coalesce(max(col("batch").cast("long")), lit(-1L))).head().getLong(0)
    if (batchId >= 0) require(applied <= batchId,
      s"chain regression: index $path already holds stats/batch=$applied > batch $batchId " +
        "— restarted stream with a stale checkpoint? Use a fresh index dir " +
        "(or the original checkpoint) instead of appending")
    // pinned: the touched-bucket collect and the merge below each
    // consume the batch postings, and every reference otherwise
    // re-tokenizes the whole batch (same fix as the build path)
    val batch = graft.operators.Lineage.pin(batchPostings(newRows, idCol, textCol))
    val touched = batch.select("bucket").distinct().collect().map(_.getInt(0))
    if (touched.isEmpty) return
    val stored = spark.read.parquet(s"$path/postings")
      .where(col("bucket").isin(touched.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col(idCol), col("dl"), col("term"), col("tf"), col("bucket"))
    val merged = stored.unionByName(batch).distinct()
    val dfq = merged.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    merged.join(dfq, "term")
      .repartition(col("bucket"))
      .write.partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/postings")
    val id = if (batchId >= 0) batchId else applied + 1L
    writeStats(spark, batchStats(newRows, textCol), path, batchId = id, fresh = false)
  }

  /** BM25 against a [[buildBm25Index]] index: bit-identical results to
    * [[bm25Rank]] (same SearchKit arithmetic over the same exact
    * integers), but the corpus is never touched — the scan reads ONLY
    * the query terms' bucket dirs via a static `bucket IN (...)`
    * partition filter (≤ `terms.size` of [[Bm25IndexBuckets]]), then
    * filters to the terms inside them. Serve work ~ query-term
    * postings; index and corpus size only move the BUILD cost.
    *
    * The bucket filter is written as `pmod(graft_poly_hash('term'),
    * fan)` LITERALS — the hash of a literal constant-folds during
    * optimization (the same mechanism q86's phrase lookup is
    * plan-pinned on), so the scan's partition pruning is static and
    * no extra job or driver-side hash reimplementation is needed.
    */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, path: String, idCol: String,
                  terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                  topK: Int = 20): DataFrame = {
    validate(terms, topK)
    val termList = terms.map(SearchKit.sqlStr).mkString(", ")
    val bucketList = terms
      .map(t => s"pmod(graft_poly_hash(${SearchKit.sqlStr(t)}), $Bm25IndexBuckets)")
      .mkString(", ")
    // per-batch stats rows sum to the corpus totals (exact BIGINTs).
    // A corrupt/empty stats table (or a wrong path that happens to
    // parse) would otherwise surface as a null→NPE or a 0-divisor
    // avgdl deep in the score expression — diagnose it here, by name.
    val st = spark.read.parquet(s"$path/stats")
      .agg(sum("n").cast("long").as("n"), sum("sum_dl").cast("long").as("sum_dl")).head()
    require(!st.isNullAt(0) && st.getAs[Long]("n") > 0L,
      s"BM25 index at $path has an empty or corrupt stats table " +
        s"(n=${if (st.isNullAt(0)) "null" else st.getAs[Long]("n")}) — " +
        "was it written by buildBm25Index, and is the path right?")
    val (n, sumDl) = (st.getAs[Long]("n"), st.getAs[Long]("sum_dl"))
    val postings = spark.read.parquet(s"$path/postings")
      .where(expr(s"bucket IN ($bucketList)"))
      .filter(expr(s"term IN ($termList)"))
    scoreAndTop(postings, idCol, terms,
      s"CAST($n AS BIGINT)",
      s"(CAST(CAST($sumDl AS BIGINT) AS DOUBLE) / CAST(CAST($n AS BIGINT) AS DOUBLE))",
      k1, b, topK)
  }

  /** Reciprocal-rank fusion: score(doc) = 1/(k0 + rankA) + 1/(k0 +
    * rankB), a list the doc is absent from contributing 0. Returns the
    * fused top-`topK` as (id, rrf_score, rank_a, rank_b, rank) with
    * rank_a/rank_b NULL for single-list docs — the standard hybrid
    * combiner (Cormack, Clarke & Buettcher, SIGIR'09) for a lexical and
    * a vector ranking.
    *
    * Scale: the inputs are already top-N ranked lists (bounded), so the
    * full-outer join and the final top-k are small; nothing here
    * touches the corpus.
    */
  def rrfFuse(a: DataFrame, aId: String, aRank: String,
              b: DataFrame, bId: String, bRank: String,
              k0: Double = 60.0, topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val l = a.select(col(aId).as("__ida"), col(aRank).cast("long").as("rank_a"))
    val r = b.select(col(bId).as("__idb"), col(bRank).cast("long").as("rank_b"))
    val fused = l
      .join(r, col("__ida") === col("__idb"), "full_outer")
      .select(coalesce(col("__ida"), col("__idb")).as("id"), col("rank_a"), col("rank_b"))
      .withColumn("rrf_score",
        expr(s"${SearchKit.rrfTerm("rank_a", k0)} + ${SearchKit.rrfTerm("rank_b", k0)}"))
    val top = fused.orderBy(col("rrf_score").desc, col("id")).limit(topK)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_score").desc, col("id"))).cast("long"))
      .select(col("id"), col("rrf_score"), col("rank_a"), col("rank_b"), col("rank"))
  }
}
