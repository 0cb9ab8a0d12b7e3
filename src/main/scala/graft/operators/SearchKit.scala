package graft.operators

/** Dialect-neutral SQL fragments for ranked retrieval — BM25 term
  * scoring and reciprocal-rank fusion. One generated string parses
  * identically in Spark SQL and DuckDB, so the engine and the oracle
  * compute bit-identical doubles: every operation is a correctly-rounded
  * IEEE-754 +, -, *, / evaluated in the same textual order, and there
  * are NO libm transcendentals.
  *
  * The idf is deliberately the RATIONAL odds form
  * `(N - df + 0.5) / (df + 0.5)` rather than the textbook
  * `ln(odds + 1)`: ln differs in the last ulp across libm/JDK (the same
  * trade [[graft.api.TextCuration.rarityTerms]] documents), while the
  * rational form is exactly reproducible and MONOTONE in the ln form,
  * so single-term rankings are identical and multi-term rankings simply
  * weight rare terms more steeply (documented contract, applied on both
  * the engine and the oracle side).
  *
  * Reference behavior modeled: the reference's search-style consumers
  * rank matches by relevance in SQL (`/root/reference/dag_utils.py`
  * pushes scoring into the warehouse); this kit is that scoring surface
  * re-expressed as portable relational SQL.
  */
object SearchKit {

  /** Double literal that parses to the same IEEE double in both
    * dialects: Double.toString is shortest-round-trip, and both engines
    * parse the decimal (or E-notation) text to the nearest double. The
    * CAST normalizes DuckDB/Spark decimal-literal typing differences.
    */
  def dlit(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite literal: $d")
    s"CAST(${d.toString} AS DOUBLE)"
  }

  /** Single-quoted SQL string literal (both dialects escape ' as ''). */
  def sqlStr(s: String): String = {
    require(!s.exists(c => c < ' '), s"control char in SQL literal: ${s.take(40)}")
    "'" + s.replace("'", "''") + "'"
  }

  /** BM25 partial score for one (doc, term) posting.
    *
    * @param n     SQL expr: corpus document count (BIGINT)
    * @param df    SQL expr: documents containing the term (BIGINT)
    * @param tf    SQL expr: term occurrences in the doc (BIGINT)
    * @param dl    SQL expr: doc length in tokens (BIGINT)
    * @param avgdl SQL expr: mean doc length (DOUBLE, exact-int division)
    */
  def bm25Score(n: String, df: String, tf: String, dl: String, avgdl: String,
                k1: Double, b: Double): String =
    s"((CAST($n AS DOUBLE) - CAST($df AS DOUBLE) + 0.5) / (CAST($df AS DOUBLE) + 0.5))" +
      s" * (CAST($tf AS DOUBLE) * ${dlit(k1 + 1.0)})" +
      s" / (CAST($tf AS DOUBLE) + ${dlit(k1)} * (${dlit(1.0 - b)} + ${dlit(b)} * (CAST($dl AS DOUBLE) / $avgdl)))"

  /** Per-doc fused score: the per-term partials added in the CALLER'S
    * term order, materialized textually, because float addition is not
    * associative — both engines must fold the terms identically.
    * `max(CASE ...)` picks the single partial for that term (at most
    * one row per (doc, term) after the tf aggregation); absent terms
    * contribute exactly 0.0.
    */
  def fusedSum(terms: Seq[String], termCol: String, scoreCol: String): String = {
    require(terms.nonEmpty, "need at least one term")
    terms.map(t => s"coalesce(max(CASE WHEN $termCol = ${sqlStr(t)} THEN $scoreCol END), 0.0)")
      .mkString(" + ")
  }

  /** One list's reciprocal-rank-fusion contribution: 1 / (k0 + rank),
    * 0.0 when the doc is absent from the list (NULL rank). A single
    * correctly-rounded division — exact cross-engine.
    */
  def rrfTerm(rank: String, k0: Double): String =
    s"coalesce(1.0 / (${dlit(k0)} + CAST($rank AS DOUBLE)), 0.0)"

  /** DuckDB oracle CTE block for [[graft.api.Retrieval.bm25Rank]] over
    * the `documents` table: defines `brank(doc_id, score, rank)`. The
    * score/fusion arithmetic is generated from the SAME fragments the
    * engine runs — one text, two engines. `tokensExpr` is the dialect's
    * tokenizer over the `text` column (TextKit.tokensDuck("text")).
    */
  def bm25DuckCtes(tokensExpr: String, terms: Seq[String], k1: Double, b: Double): String = {
    val termList = terms.map(sqlStr).mkString(", ")
    s"""tk AS (SELECT doc_id, $tokensExpr AS tok FROM documents),
        dls AS (SELECT CAST(len(tok) AS BIGINT) AS dl FROM tk),
        gl AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
                 CAST(count(*) AS BIGINT) AS n FROM dls),
        pt AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS dl, unnest(tok) AS term FROM tk),
        tfq AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM pt
                WHERE term IN ($termList) GROUP BY doc_id, dl, term),
        dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY term),
        sc AS (SELECT tfq.doc_id, tfq.term,
                 ${bm25Score("g.n", "dfq.df", "tfq.tf", "tfq.dl", "g.avgdl", k1, b)} AS s
               FROM tfq JOIN dfq ON tfq.term = dfq.term CROSS JOIN gl g),
        bagg AS (SELECT doc_id, ${fusedSum(terms, "term", "s")} AS score
                 FROM sc GROUP BY doc_id),
        brank AS (SELECT doc_id, score,
                    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
                  FROM bagg)"""
  }
}
