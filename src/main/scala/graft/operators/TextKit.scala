package graft.operators

/** Cross-engine-deterministic text primitives, emitted as SQL snippets in
  * two dialects (Spark SQL for the engine, DuckDB SQL for the driver's
  * oracle). Everything is integer arithmetic or single IEEE-754 ops, so
  * both engines produce bit-identical results regardless of partitioning.
  *
  * These replace the row-at-a-time Python text handling the reference
  * delegates to its external `data_pipeline` package (see
  * /root/reference/parallelized_data_pipeline_dag.py:222,247 — transform
  * steps [inferred]); here they are Catalyst higher-order-function
  * expressions evaluated inside the scan pipeline, no UDFs.
  *
  * Scale notes (100 TB): every builder is a narrow per-row expression —
  * no shuffle, no state. The dedup/LSH *queries* built on top shuffle
  * once on their join/group keys (shingle, band-key, content-hash),
  * which is the canonical distributed-dedup layout: work is proportional
  * to Σ df² over shingles, not n² over documents.
  */
object TextKit {

  /** Prime modulus 2^31-1 for the polynomial rolling hash: keeps every
    * intermediate < 2^36, safely inside BIGINT under ANSI overflow checks
    * in both engines.
    */
  val P: Long = 2147483647L

  // ---- tokens -----------------------------------------------------------
  def tokensSpark(e: String): String = s"split($e, ' ')"
  def tokensDuck(e: String): String  = s"string_split($e, ' ')"

  // ---- polynomial rolling hash over characters (Karp–Rabin style) ------
  // fold left: h = (h*31 + code(c)) mod P. The engine side uses the
  // native codegen'd expression (graft.functions.PolyHash) — bit-
  // identical to the portable HOF fold `aggregate(split(e, ''), 0L,
  // (acc, c) -> (acc*31 + ascii(c)) % P)` (see polySparkHof, kept for
  // the equivalence spec). DuckDB `list_reduce` is the same left fold
  // with the 0 prepended (no init param). ASCII/BMP corpus contract:
  // ascii() == UTF-16 unit == codepoint.
  def polySpark(e: String): String = s"graft_poly_hash($e)"
  def polySparkHof(e: String): String =
    s"aggregate(split($e, ''), CAST(0 AS BIGINT), (ph_acc, ph_c) -> (ph_acc * 31 + ascii(ph_c)) % $P)"
  def polyDuck(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($e, ''), ph_c -> CAST(ascii(ph_c) AS BIGINT))), (ph_a, ph_b) -> (ph_a * 31 + ph_b) % $P)"

  // ---- distinct word trigram shingles ----------------------------------
  // Callers guarantee >= 3 tokens (documents.text has >= 10).
  //
  // Spark-side shape matters: `element_at($tok, i)` inside a lambda
  // re-evaluates the (inlined) tokenizer PER ELEMENT — O(shingles ×
  // tokens) splits per doc, measured 5× the whole-query cost at sf0.1.
  // arrays_zip over slices keeps every non-trivial subexpression
  // OUTSIDE the lambda (evaluated once per row); the lambda touches
  // only its struct argument. Values are identical either way, so the
  // DuckDB oracle form is unchanged.
  def shinglesSpark(tok: String): String =
    s"array_distinct(transform(arrays_zip(slice($tok, 1, size($tok) - 2), slice($tok, 2, size($tok) - 2), slice($tok, 3, size($tok) - 2)), sh_z -> concat_ws(' ', sh_z['0'], sh_z['1'], sh_z['2'])))"

  /** Hot-path forms taking the text column directly: the native
    * one-pass-per-row expression (graft.functions.WordNgrams),
    * value-identical to tokenize+compose above (equivalence specs).
    */
  def textShinglesSpark(text: String): String = s"graft_word_ngrams($text, 3, true)"
  def textBigramsSpark(text: String): String = s"graft_word_ngrams($text, 2, false)"
  def shinglesDuck(tok: String): String =
    s"list_distinct(list_transform(range(1, len($tok) - 1), sh_i -> $tok[sh_i] || ' ' || $tok[sh_i + 1] || ' ' || $tok[sh_i + 2]))"

  // ---- word-bigram features (SimHash input) ----------------------------
  // Unigram features are too coarse on a small vocabulary (frequency
  // profiles collide: 5000 docs -> 2675 distinct unigram signatures on
  // the sf0.1 corpus); bigrams restore discrimination (-> 4948 distinct).
  // (same arrays_zip-over-slices shape as shinglesSpark — see note)
  def bigramsSpark(tok: String): String =
    s"transform(arrays_zip(slice($tok, 1, size($tok) - 1), slice($tok, 2, size($tok) - 1)), bg_z -> concat_ws(' ', bg_z['0'], bg_z['1']))"
  def bigramsDuck(tok: String): String =
    s"list_transform(range(1, len($tok)), bg_i -> $tok[bg_i] || ' ' || $tok[bg_i + 1])"

  // ---- MinHash ----------------------------------------------------------
  /** Number of MinHash permutations (4 bands x 4 rows for LSH). */
  val MinhashK = 16
  val LshBands = 4
  val LshRows  = 4

  /** Deterministic (a, b) linear-permutation params, a != 0 mod P, fixed
    * literals embedded verbatim into both dialects' SQL (never derived
    * from a runtime RNG — engine and oracle must agree byte-for-byte).
    */
  val perms: Seq[(Long, Long)] = Seq(
    (114060684L, 143607337L), (658016613L, 1920833000L),
    (1625018798L, 2115868156L), (1839658157L, 1370607935L),
    (1314768563L, 1516846532L), (899342927L, 1761721495L),
    (1792449689L, 2056989731L), (1252576877L, 638180911L),
    (516347111L, 86660097L), (1034123048L, 390694562L),
    (1490082987L, 1456092803L), (997229159L, 1263980513L),
    (768208874L, 373428980L), (381249820L, 1284903394L),
    (434862591L, 97658013L), (635475302L, 570517314L),
  )

  /** h_i(x) = (a_i * x + b_i) mod P over a BIGINT column expr; product
    * < 2^62, no overflow.
    */
  def permExpr(i: Int, x: String): String = {
    val (a, b) = perms(i)
    s"($a * $x + $b) % $P"
  }

  // ---- SimHash ----------------------------------------------------------
  /** SimHash width: 31 bits (the poly hash's range), so the signature and
    * every band byte stay positive BIGINTs in both engines.
    */
  val SimhashBits = 31

  // ---- language-ID marker lists ----------------------------------------
  /** Stopword markers per language for the n-gram/marker heuristic.
    * Tie-break: list order (first wins); no marker hit => "und".
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
  )

  /** `size(filter(tok, t -> t IN markers))` in each dialect, counting
    * marker occurrences with multiplicity.
    */
  // engine side runs the native kernel (graft.functions.MarkerCount):
  // the HOF form `size(filter(tok, t -> t = 'm' OR ...))` evaluates its
  // lambda interpreted per element, which dominates a lang-ID pass; the
  // kernel is one hash probe per token inside the fused stage, same
  // semantics (multiplicity, nulls not counted). markerCountSparkHof is
  // the portable definition, kept for the equivalence spec.
  def markerCountSpark(tok: String, markers: Seq[String]): String = {
    // markers travel as a comma-joined single-quoted SQL literal in all
    // three dialects below: a marker containing the delimiter would
    // silently split into two, and a quote would break the SQL parse.
    // Word-markers never contain either; fail loudly if one ever does.
    require(markers.nonEmpty && markers.forall(m => m.nonEmpty && !m.contains(',') && !m.contains('\'')),
      s"markers must be non-empty and contain no comma/quote: ${markers.mkString("[", ", ", "]")}")
    s"graft_marker_count($tok, '${markers.mkString(",")}')"
  }
  def markerCountSparkHof(tok: String, markers: Seq[String]): String = {
    val cond = markers.map(m => s"lm_t = '$m'").mkString(" OR ")
    s"CAST(size(filter($tok, lm_t -> $cond)) AS BIGINT)"
  }
  def markerCountDuck(tok: String, markers: Seq[String]): String = {
    val cond = markers.map(m => s"lm_t = '$m'").mkString(" OR ")
    s"len(list_filter($tok, lm_t -> $cond))"
  }

  /** English-ish stopword list used by the quality score. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "it", "to", "in")
}
