package graft.api

import graft.operators.TextKit._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public text-curation API: the dedup / quality / language operators
  * over ANY corpus frame with an id column and a text column — the
  * generic form of what the query catalog (q21–q29, q60) demonstrates
  * on the TESTDATA `documents` table; the catalog delegates here, so
  * every function is covered by the DuckDB oracle gate.
  *
  * Scale contract (100 TB): per-doc feature extraction is narrow;
  * pairwise similarity always flows through one shuffle on a content
  * key (content hash, shingle, MinHash band, SimHash band byte) —
  * never an n² cross join. Work scales with Σ df² over features.
  */
object TextCuration {

  /** Exact dedup: one row per distinct content (min id wins), plus the
    * copy count. One shuffle on the content hash.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Trigram-Jaccard near-duplicate pairs at or above `threshold`,
    * via inverted-index join on shingle (intersections from one
    * shuffle, unions by inclusion–exclusion).
    */
  def jaccardNearDups(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    val ex = df
      .selectExpr(s"$idCol AS __id", s"${textShinglesSpark(textCol)} AS sh")
      .selectExpr("__id", "CAST(size(sh) AS BIGINT) AS nsh", "sh")
      .select(col("__id"), col("nsh"), explode(col("sh")).as("s"))
    val a = ex.select(col("__id").as("id_a"), col("nsh").as("na"), col("s"))
    val b = ex.select(col("__id").as("id_b"), col("nsh").as("nb"), col("s"))
    a.join(b.hint("SHUFFLE_HASH"), "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("n_inter"))
      .select(
        col("id_a"), col("id_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures (TextKit.MinhashK permutations of the trigram
    * shingle hash): columns (id, m0..m15).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one-pass kernel: all 16 permutation minima per row, no explode and
    // no shuffle (the composed explode -> groupBy-min form blows up to
    // docs x shingles rows through an exchange; min is order-independent,
    // so the kernel is value-identical — equivalence spec'd). Docs with
    // no shingles return a null signature and are dropped, matching
    // explode-of-empty.
    val permsLit = lit(perms.map { case (a, b) => s"$a:$b" }.mkString(","))
    df.selectExpr(s"$idCol AS __id", s"${textShinglesSpark(textCol)} AS sh")
      .select(col("__id").as(idCol),
        call_function("graft_minhash", col("sh"), permsLit).as("__ms"))
      .filter(col("__ms").isNotNull)
      .select(col(idCol) +: (0 until MinhashK).map(i => col("__ms")(i).as(s"m$i")): _*)
  }

  /** MinHash-LSH candidate pairs (band equi-join) with the estimated
    * similarity (matching-permutation fraction).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bandKeys = (0 until LshBands).map { bnd =>
      val key = (0 until LshRows).map(r => s"m${bnd * LshRows + r}").mkString(", ")
      s"concat_ws(',', $key)"
    }.mkString(", ")
    val mcols = (0 until MinhashK).map(i => s"m$i")
    val bands = minhashSignatures(df, idCol, textCol)
      .selectExpr((idCol +: mcols) :+ s"posexplode(array($bandKeys)) AS (band, bk)": _*)
    val matches = (0 until MinhashK).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    bands.as("a")
      .join(bands.as("b").hint("SHUFFLE_HASH"),
        expr(s"a.band = b.band AND a.bk = b.bk AND a.$idCol < b.$idCol"))
      .selectExpr(
        s"a.$idCol AS id_a", s"b.$idCol AS id_b",
        s"CAST($matches AS BIGINT) AS n_match",
        s"CAST($matches AS DOUBLE) / $MinhashK.0 AS est_sim")
      .distinct()
  }

  /** SimHash near-dup pairs over word-bigram features, candidates from
    * byte-band equi-joins, kept at hamming <= maxHamming.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    // one-pass kernel: per-bit +-1 vote sums and the sign threshold in a
    // single scalar pass per row — the composed explode -> 31 grouped
    // sums form pushed docs x features rows through an exchange. Integer
    // vote sums are order-independent, so values are identical
    // (equivalence spec). Docs with no features drop, like explode-of-empty.
    val sig = df
      .selectExpr(s"$idCol AS __id", s"${textBigramsSpark(textCol)} AS feats")
      .select(col("__id").as(idCol), call_function("graft_simhash", col("feats")).as("sim"))
      .filter(col("sim").isNotNull)
    val bandBytes = (0 until 4).map(bnd => s"(shiftright(sim, ${8 * bnd}) & 255)").mkString(", ")
    val bands = sig.selectExpr(idCol, "sim", s"posexplode(array($bandBytes)) AS (band, byte)")
    bands.as("a")
      .join(bands.as("b").hint("SHUFFLE_HASH"),
        expr(s"a.band = b.band AND a.byte = b.byte AND a.$idCol < b.$idCol"))
      .filter(expr(s"bit_count(a.sim ^ b.sim) <= $maxHamming"))
      .selectExpr(s"a.$idCol AS id_a", s"b.$idCol AS id_b",
        "CAST(bit_count(a.sim ^ b.sim) AS BIGINT) AS hamming")
      .distinct()
  }

  /** Per-doc quality score in [0,1] (stopword ratio, type-token ratio,
    * length) plus the component columns.
    */
  def qualityScored(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopCondS = markerCountSpark("tok", stopwords)
    df.selectExpr(s"$idCol", s"CAST(length($textCol) AS BIGINT) AS nc", s"${tokensSpark(textCol)} AS tok")
      .selectExpr(
        idCol,
        "CAST(size(tok) AS BIGINT) AS n_tokens",
        "CAST(nc - (size(tok) - 1) AS DOUBLE) / CAST(size(tok) AS DOUBLE) AS avg_token_len",
        s"CAST($stopCondS AS DOUBLE) / CAST(size(tok) AS DOUBLE) AS stop_ratio",
        "CAST(size(array_distinct(tok)) AS DOUBLE) / CAST(size(tok) AS DOUBLE) AS ttr",
        "least(CAST(size(tok) AS DOUBLE) / 50.0, 1.0) AS len_score")
      .selectExpr(
        idCol, "n_tokens", "avg_token_len", "stop_ratio", "ttr", "len_score",
        "(0.35 * stop_ratio) + (0.35 * ttr) + (0.3 * len_score) AS quality")
  }

  /** The language-ID argmax CASE over the marker counts s_en..s_fr. */
  private[graft] val langPredCase: String = """CASE
        WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
        WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
        WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
        WHEN s_fr > 0 THEN 'fr'
        ELSE 'und' END"""

  /** Marker-heuristic language ID: per-language marker counts + the
    * argmax prediction ('und' on no hits). `keep` carries extra input
    * columns through — a caller that needs them alongside the
    * prediction should pass them here rather than re-joining the
    * result to the input (a doc-corpus-sized shuffle for columns that
    * were already in hand).
    */
  def langId(df: DataFrame, idCol: String, textCol: String, keep: Seq[String] = Nil): DataFrame = {
    val counts = langMarkers.map { case (l, ms) => s"${markerCountSpark("tok", ms)} AS s_$l" }
    df.selectExpr(Seq(idCol, s"${tokensSpark(textCol)} AS tok") ++ keep: _*)
      .selectExpr(Seq(idCol) ++ counts ++ keep: _*)
      .selectExpr(Seq(idCol, "s_en", "s_es", "s_de", "s_fr", s"$langPredCase AS pred_lang") ++ keep: _*)
  }

  /** The full curation pipeline: exact-dedup canonicals ∖ near-dup
    * higher-ids, quality floor, language allowlist. Returns
    * (id, pred_lang, quality) for surviving docs.
    */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      jaccardThreshold: Double,
      qualityFloor: Double,
      langs: Seq[String],
  ): DataFrame = {
    val wCanon = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    val canon = df.withColumn("__rn", row_number().over(wCanon))
      .filter(col("__rn") === 1).select(idCol)
    val neardup = jaccardNearDups(df, idCol, textCol, jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    // restrict FIRST, score LAST: the dedup joins only need (id, text
    // hash / shingles), so quality + lang-ID — the expensive per-doc
    // passes — run once, fused in one projection, only over the docs
    // that survive dedup. Same per-row values as qualityScored/langId
    // (same expressions over the same token array); computing them
    // pre-join would tokenize every doc twice and add a corpus-sized
    // shuffle join of the two score frames.
    val survivors = df
      .join(canon, Seq(idCol))
      .join(neardup, Seq(idCol), "left_anti")
    val stopCondS = markerCountSpark("tok", stopwords)
    val counts = langMarkers.map { case (l, ms) => s"${markerCountSpark("tok", ms)} AS s_$l" }
    survivors
      .selectExpr(Seq(idCol, s"${tokensSpark(textCol)} AS tok"): _*)
      .selectExpr(Seq(
        idCol,
        s"CAST($stopCondS AS DOUBLE) / CAST(size(tok) AS DOUBLE) AS stop_ratio",
        "CAST(size(array_distinct(tok)) AS DOUBLE) / CAST(size(tok) AS DOUBLE) AS ttr",
        "least(CAST(size(tok) AS DOUBLE) / 50.0, 1.0) AS len_score") ++ counts: _*)
      .selectExpr(
        idCol,
        s"$langPredCase AS pred_lang",
        "(0.35 * stop_ratio) + (0.35 * ttr) + (0.3 * len_score) AS quality")
      .filter(col("quality") >= qualityFloor && col("pred_lang").isin(langs: _*))
      .select(idCol, "pred_lang", "quality")
  }
}
