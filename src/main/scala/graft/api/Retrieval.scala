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

  /** BM25 top-`topK` docs for `terms`: returns (idCol, rank, score),
    * rank 1 = best, ties broken by id ascending. Docs containing none
    * of the terms are absent (score would be 0).
    */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct.size == terms.size, s"duplicate query terms: $terms")
    require(topK > 0, s"topK must be positive: $topK")
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
    val scored = tf
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(gl))
      .withColumn("s", expr(SearchKit.bm25Score("n", "df", "tf", "dl", "avgdl", k1, b)))
      .groupBy(col(idCol))
      .agg(expr(SearchKit.fusedSum(terms, "term", "s")).as("score"))
    val top = scored.orderBy(col("score").desc, col(idCol)).limit(topK)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("rank"), col("score"))
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
