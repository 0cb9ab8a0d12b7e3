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

  /** Number of hash-prefix partition dirs in a [[buildHashIndex]]
    * layout (2 hex chars): the unit of serve-time partition pruning.
    */
  val HashIndexBuckets = 256

  /** Persist the exact-content hash index of a corpus at `path` — the
    * EXACT twin of [[buildLshIndex]] in the incremental-ingest family:
    * one (content_hash, canonical_id) row per distinct content, so a
    * new crawl batch checks re-crawls against the stored index without
    * re-hashing anything already indexed. Partitioned into
    * [[HashIndexBuckets]] hash-prefix dirs: serving prunes to the
    * batch's buckets (a batch smaller than 256 docs cannot touch all
    * dirs), and each dir stays independently compactable.
    */
  def buildHashIndex(df: DataFrame, idCol: String, textCol: String, path: String): Unit =
    exactDedup(df, idCol, textCol)
      .withColumn("bucket", expr("conv(substring(content_hash, 1, 2), 16, 10)").cast("int"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Exact re-crawl detection for a NEW batch against a
    * [[buildHashIndex]] index: (batch id, indexed canonical id,
    * content_hash) for every batch doc whose content already exists in
    * the corpus. The batch's distinct bucket set (≤ 256 ints — a
    * control-plane collect) statically prunes the index scan to the
    * touched partition dirs, then ONE hash equi-join matches within
    * them — IO and work scale with batch size + touched buckets, not
    * corpus size. A batch row equal to its own indexed canonical (same
    * id re-ingested) is excluded, matching [[lshCandidatesIndexed]]'s
    * contract.
    */
  def exactDupsAgainstIndex(batch: DataFrame, idCol: String, textCol: String, path: String): DataFrame = {
    // pinned: the touched-bucket collect below and the hash join both
    // consume `b`, and each reference otherwise re-scans + re-md5s the
    // whole batch (the q160 repeated-subtree lesson at batch scale)
    val b = graft.operators.Lineage.pin(
      batch.select(col(idCol).as("batch_id"), md5(col(textCol)).as("content_hash"))
        .withColumn("bucket", expr("conv(substring(content_hash, 1, 2), 16, 10)").cast("int")))
    val touched = b.select("bucket").distinct().collect().map(_.getInt(0))
    val idx = batch.sparkSession.read.parquet(path)
      .where(col("bucket").isin(touched.map(Int.box): _*))
      .select(col("bucket"), col("content_hash"), col("canonical_id"))
    b.join(idx, Seq("bucket", "content_hash"))
      .filter(col("batch_id") =!= col("canonical_id"))
      .select(col("batch_id"), col("canonical_id"), col("content_hash"))
  }

  /** Trigram-Jaccard near-duplicate pairs at or above `threshold`,
    * via inverted-index join on shingle (intersections from one
    * shuffle, unions by inclusion–exclusion).
    */
  def jaccardNearDups(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame =
    jaccardFromEx(pinnedShingleEx(df, idCol, textCol), threshold)

  /** The family's ONE tokenize+shingle+explode pass, PINNED
    * (localCheckpoint; the reliable-checkpoint switch applies — see
    * [[graft.operators.Lineage]]). Every jaccard path below references
    * the exploded postings several times (df shuffle, prefix join,
    * candidate self-join sides, verification), and Catalyst plans each
    * reference as its OWN scan subtree — the r20 plan audit counted 44
    * corpus scans in q160's single plan, each re-running the
    * tokenizer+shingler (the most expensive per-byte projection in the
    * engine). Materializing the postings once is the §3.3/§8
    * decide-on-small-rows trade: the pinned blocks are (id, nsh,
    * shingle) rows — posting-sized, the same order as what the very
    * next exchange would write anyway — and every downstream pass reads
    * blocks instead of re-tokenizing. sf0.1 receipts in
    * OPTIMIZATION_r20.md (q26/q160/q60).
    */
  private def pinnedShingleEx(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Lineage.pin(df
      .selectExpr(s"$idCol AS __id", s"${textShinglesSpark(textCol)} AS sh")
      .selectExpr("__id", "CAST(size(sh) AS BIGINT) AS nsh", "sh")
      .select(col("__id"), col("nsh"), explode(col("sh")).as("s")))

  /** Inverted-index jaccard over an already-pinned postings frame. */
  private def jaccardFromEx(ex: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
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

  /** [[jaccardNearDups]] with PPJoin-style PREFIX FILTERING (Chaudhuri
    * et al. ICDE'06; Bayardo et al. WWW'07; Xiao et al. WWW'08): the
    * same exact near-dup pairs, from far fewer candidates.
    *
    * The full inverted-index join generates Σ df² candidate work per
    * shingle — boilerplate shingles shared by thousands of docs
    * dominate it quadratically. Prefix filtering orders every doc's
    * shingles by a GLOBAL rarity order (corpus df ascending, shingle as
    * tiebreak) and emits only the first `|x| - ceil(t²·|x|) + 1` into
    * the candidate join. Losslessness (no true pair missed): J(x,y) ≥ t
    * forces |y| ≥ t·|x|, hence |x∩y| ≥ ceil(t·min(|x|,|y|)) ≥
    * ceil(t²·|x|); if two sets share ≥ α elements, their first
    * (size − α + 1) elements under ANY common total order must
    * intersect (else every common element sits at global order ≥ the
    * smallest common one, which sits in a suffix of size α−1 — fewer
    * than α). The kept prefixes are at least that long for every
    * qualifying partner, so every true pair surfaces; false candidates
    * are removed by the exact per-pair verification (array_intersect
    * over the two shingle sets — map-side, candidate-bounded).
    *
    * The t² comes from not knowing the partner's size at emit time —
    * simple and provable; the classic size-aware two-sided prefix
    * tightens it further at the cost of an asymmetric index/probe
    * union. Effective for HIGH thresholds (boilerplate and
    * near-identical detection, t ≥ 0.5); at t = 0.3 the prefix keeps
    * ~92% of shingles and the plain [[jaccardNearDups]] is simpler.
    * α uses ceil(t²·n − 1e-9): the epsilon guards double rounding
    * UPWARD past the exact rational (a longer prefix is always safe,
    * a shorter one is not).
    */
  def jaccardNearDupsPrefix(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    val ex = pinnedShingleEx(df, idCol, textCol)
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    prefixPairsFromEx(ex, prefixFromEx(ex, dfreq, threshold), threshold)
  }

  /** The PINNED rarity-ordered prefix postings of a (pinned) `ex`: the
    * window pass runs once; the candidate self-join below references
    * the prefix on BOTH sides (and the Auto path adds a df probe over
    * it), each reference otherwise re-running the join+window.
    */
  private def prefixFromEx(ex: DataFrame, dfreq: DataFrame, threshold: Double): DataFrame = {
    val wDoc = Window.partitionBy("__id").orderBy(col("df"), col("s"))
    graft.operators.Lineage.pin(ex.join(dfreq.hint("SHUFFLE_HASH"), "s")
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <=
        col("nsh") - ceil(lit(threshold * threshold) * col("nsh") - lit(1e-9)) + 1)
      .select("__id", "nsh", "s"))
  }

  /** Prefix-filtered candidate generation + exact inverted-index
    * verification over pinned postings/prefix frames — the shared tail
    * of [[jaccardNearDupsPrefix]] and [[jaccardNearDupsPrefixAuto]]'s
    * under-budget branch (which now reuses the ALREADY-COMPUTED pinned
    * prefix instead of rebuilding the whole pipeline from the corpus).
    */
  private def prefixPairsFromEx(ex: DataFrame, prefix: DataFrame, threshold: Double): DataFrame = {
    // size filter (Arasu et al. VLDB'06): J >= t forces t·|x| <= |y|
    // (and symmetrically), so size-incompatible prefix collisions are
    // dropped IN the candidate join — epsilon-permissive on the double
    // compare (keeping a false candidate is safe, dropping a true one
    // is not; the exact verification below settles it either way).
    // Pinned: consumed THREE times below (both candIds selects + the
    // final pair join) — unpinned, the prefix self-join ran per use.
    val cand = graft.operators.Lineage.pin(
      prefix.select(col("__id").as("id_a"), col("nsh").as("pna"), col("s"))
        .join(prefix.select(col("__id").as("id_b"), col("nsh").as("pnb"), col("s"))
          .hint("SHUFFLE_HASH"), "s")
        .filter(col("id_a") < col("id_b")
          && col("pnb").cast("double") >= lit(threshold) * col("pna").cast("double") - lit(1e-9)
          && col("pna").cast("double") >= lit(threshold) * col("pnb").cast("double") - lit(1e-9))
        .select("id_a", "id_b").distinct())
    // Exact verification on the CANDIDATE-RESTRICTED inverted index:
    // the pinned postings are reused, only candidate docs' rows pass,
    // and intersections come from the same join+agg the full path uses
    // — now over the tiny candidate neighborhood. (Array-carrying
    // joins would re-tokenize the corpus per side; measured 7x slower
    // at sf0.1.) The s-join may surface pairs of candidate DOCS that
    // were not candidate PAIRS — the final join back onto `cand` drops
    // them before any of their rows matter.
    val candIds = cand.select(col("id_a").as("__id"))
      .union(cand.select(col("id_b").as("__id"))).distinct()
    val exC = ex.join(candIds.hint("SHUFFLE_HASH"), "__id")
    exC.select(col("__id").as("id_a"), col("nsh").as("na"), col("s"))
      .join(exC.select(col("__id").as("id_b"), col("nsh").as("nb"), col("s")), "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("n_inter"))
      .join(cand, Seq("id_a", "id_b"))
      .select(
        col("id_a"), col("id_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double")
          / (col("na") + col("nb") - col("n_inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact-histogram ceiling for [[dfCapFor]]'s probe: document
    * frequencies at or under this are histogrammed exactly (at most
    * this many collected rows + 1 tail row — control-plane-bounded at
    * any corpus size); the tail above folds into one bucket, so a
    * budget boundary landing inside the tail resolves conservatively
    * to this value (a smaller cap only ever DROPS candidates — safe
    * for the budget, never for it).
    */
  private val ProbeExactDf = 4096L

  /** The corpus-probed DOCUMENT-FREQUENCY CEILING behind the capped
    * candidate paths ([[jaccardNearDupsAuto]] /
    * [[jaccardNearDupsPrefixAuto]]) — the same
    * occupancy-derived-knob discipline as
    * [[graft.api.VectorSearch.lshNearDupsAuto]]'s plane count, applied
    * to the shingle-join side: candidate-pair volume through an
    * inverted-index join is Σ df·(df−1)/2 over the joined postings,
    * and on a corpus whose shingle vocabulary grows slower than its
    * document count (fixed boilerplate, template-heavy crawls) that
    * sum grows ~quadratically while the TRUE near-dup output stays
    * ~linear (measured on the synthetic corpus: 10× docs → 78× Σ df²,
    * 10× true pairs). One bounded aggregate — the df histogram, exact
    * to [[ProbeExactDf]], one tail bucket above — picks the largest
    * ceiling whose cumulative pair volume fits `budgetPairs`, so
    * generation work is ≤ budget BY CONSTRUCTION and scales with the
    * budget (linear in docs for a per-doc budget), not with df².
    * Returns Long.MaxValue when the whole corpus fits the budget —
    * the probe provably changes NOTHING below it (the no-op the
    * oracle-gate scales sit in).
    */
  private[graft] def dfCapFor(dfreq: DataFrame, budgetPairs: Double): Long = {
    val hist = dfreq
      .groupBy(least(col("df"), lit(ProbeExactDf + 1L)).as("dfb"))
      .agg(sum(col("df").cast("double") * (col("df") - 1L).cast("double") / 2.0).as("vol"),
        max("df").as("max_df"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    var cum = 0.0
    var cap = 1L // df=1 postings generate zero pairs; always kept
    hist.foreach { case (dfb, vol, _) =>
      cum += vol
      if (cum <= budgetPairs) cap = dfb
    }
    if (cum <= budgetPairs || hist.isEmpty) Long.MaxValue
    else if (cap > ProbeExactDf) ProbeExactDf // boundary inside the tail: conservative
    else cap
  }

  /** Per-pair verification shared by the capped candidate paths: join
    * the candidate PAIRS back onto per-doc shingle-HASH arrays (both
    * sides of the same `sets` frame — two keyed joins carrying
    * doc-sized array payloads for candidate rows only) and compute the
    * intersection with `array_intersect`. The arrays carry xxhash64 of
    * each shingle, not the string — 8 bytes/element vs ~17-char
    * strings halves the verification shuffle. A 64-bit collision
    * between two distinct shingles of a candidate pair would shift its
    * n_inter by one: probability ≈ F²/2^65 over F distinct shingles —
    * ~2e-11 at 10^5 shingles, ~0.03 expected corpus-wide at an extreme
    * 10^9 — quantified noise far below anything a near-dup policy acts
    * on, and the capped regime this runs in is already recall-traded
    * by design (the oracle-gate scales run the uncapped exact plans).
    * Work and shuffle are candidate-bounded (≤ the generation budget),
    * never corpus².
    */
  private def verifyJaccardPairs(
      sets: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val hsets = sets.selectExpr(
      "__id", "nsh", "transform(sh, hv_s -> xxhash64(hv_s)) AS hsh")
    cand
      .join(hsets.select(col("__id").as("id_a"), col("nsh").as("na"),
        col("hsh").as("sh_a")).hint("SHUFFLE_HASH"), "id_a")
      .join(hsets.select(col("__id").as("id_b"), col("nsh").as("nb"),
        col("hsh").as("sh_b")).hint("SHUFFLE_HASH"), "id_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double")
          / (col("na") + col("nb") - col("n_inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** [[jaccardNearDups]] with the candidate volume CAPPED BY A
    * CORPUS-PROBED df ceiling ([[dfCapFor]]): shingles above the
    * ceiling are excluded from candidate GENERATION only — reported
    * pairs are verified against the full shingle sets (split-count:
    * the generation join's group count is the exact capped-shingle
    * intersection; the frequent remainder rides per-pair hash-array
    * intersects with the collision bound quantified at
    * [[verifyJaccardPairs]]), so precision holds at every scale and
    * jaccard values are true. The documented trade is
    * RECALL above the budget: a true pair can be missed only if EVERY
    * shingle it shares sits above the ceiling — a pair glued together
    * exclusively by corpus-level boilerplate, exactly the kind a
    * crawl-dedup pipeline treats as template noise rather than
    * content duplication. Below the budget the cap is Long.MaxValue
    * and the result equals [[jaccardNearDups]] verbatim (the
    * oracle-gate scales sit in this regime; ApiSpecs pins both the
    * no-op and the linear candidate growth on an adversarial
    * fixed-vocabulary corpus). Returns (pairs, dfCap) — the chosen
    * ceiling rides along for auditability, the q162/q197/q208
    * decision-string discipline.
    */
  def jaccardNearDupsAuto(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      budgetPairsPerDoc: Long = 150L): (DataFrame, Long) = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(budgetPairsPerDoc >= 1, s"budgetPairsPerDoc >= 1: $budgetPairsPerDoc")
    val ex = pinnedShingleEx(df, idCol, textCol)
    // pinned: consumed by the cap probe's collect, then (capped branch)
    // by BOTH sides of the generation self-join and the frequent-set
    // split — one vocabulary-sized frame vs re-shuffling the postings
    // per reference
    val dfreq = graft.operators.Lineage.pin(
      ex.groupBy("s").agg(count(lit(1)).as("df")))
    val cap = dfCapFor(dfreq, budgetPairsPerDoc.toDouble * df.count())
    if (cap == Long.MaxValue)
      // whole corpus under budget: the uncapped direct-count plan is
      // both exact AND cheaper (n_inter straight off the join, no
      // array payloads) — provably identical output, served from the
      // SAME pinned postings the probe already paid for
      return (jaccardFromEx(ex, threshold), cap)
    // SPLIT-COUNT verification: the capped generation join's group
    // count IS the exact intersection over capped shingles; only the
    // FREQUENT remainder (df > cap — few DISTINCT shingles, so short
    // per-doc arrays) rides a per-pair array intersect. n_inter =
    // n_capped + |freq(A) ∩ freq(B)| exactly, with the array payload a
    // fraction of the full shingle set's.
    val gen = ex.join(dfreq.filter(col("df") <= cap).hint("SHUFFLE_HASH"), "s")
    val paircnt = gen.select(col("__id").as("id_a"), col("nsh").as("na"), col("s"))
      .join(gen.select(col("__id").as("id_b"), col("nsh").as("nb"), col("s"))
        .hint("SHUFFLE_HASH"), "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("n_capped"))
    val freqSets = ex.join(dfreq.filter(col("df") > cap).hint("SHUFFLE_HASH"), "s")
      .groupBy("__id").agg(sort_array(collect_list(xxhash64(col("s")))).as("fsh"))
    val empty = array().cast("array<bigint>")
    val pairs = paircnt
      .join(freqSets.select(col("__id").as("id_a"), col("fsh").as("fsh_a"))
        .hint("SHUFFLE_HASH"), Seq("id_a"), "left")
      .join(freqSets.select(col("__id").as("id_b"), col("fsh").as("fsh_b"))
        .hint("SHUFFLE_HASH"), Seq("id_b"), "left")
      .withColumn("n_inter",
        (col("n_capped") + size(array_intersect(
          coalesce(col("fsh_a"), empty), coalesce(col("fsh_b"), empty)))).cast("long"))
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double")
          / (col("na") + col("nb") - col("n_inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (pairs, cap)
  }

  /** [[jaccardNearDupsPrefix]] with the SAME corpus-probed ceiling
    * ([[dfCapFor]]) applied to the prefix postings: PPJoin's prefix
    * keeps each doc's rarest `|x| − ceil(t²·|x|) + 1` shingles, but on
    * a vocabulary that grows slower than the corpus even the rarest
    * prefix shingles' df grows linearly and the prefix join is
    * ~quadratic again. The cap bounds the PREFIX-join volume to the
    * per-doc budget; verification is the exact array intersection
    * ([[verifyJaccardPairs]]), so precision stays exact and the recall
    * trade is even narrower than [[jaccardNearDupsAuto]]'s — a true
    * pair is missed only if every shingle shared within the two
    * RAREST-FIRST prefixes is boilerplate-frequent. No-op below the
    * budget (cap = Long.MaxValue), where losslessness is the prefix
    * theorem's. Returns (pairs, dfCap).
    */
  def jaccardNearDupsPrefixAuto(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      budgetPairsPerDoc: Long = 150L): (DataFrame, Long) = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(budgetPairsPerDoc >= 1, s"budgetPairsPerDoc >= 1: $budgetPairsPerDoc")
    val ex = pinnedShingleEx(df, idCol, textCol)
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val prefix = prefixFromEx(ex, dfreq, threshold)
    // budget the volume of the join actually run: PREFIX postings df
    // (reads the pinned prefix; consumed again by the capped branch's
    // generation join)
    val pdfreq = prefix.groupBy("s").agg(count(lit(1)).as("df"))
    val cap = dfCapFor(pdfreq, budgetPairsPerDoc.toDouble * df.count())
    if (cap == Long.MaxValue)
      // prefix volume under budget: the bare prefix path is lossless
      // (prefix theorem) and its candidate-restricted inverted-index
      // verification is cheaper than array payloads at this scale —
      // served from the SAME pinned postings+prefix the probe already
      // computed (the former early return re-derived the entire
      // pipeline from the corpus a second time)
      return (prefixPairsFromEx(ex, prefix, threshold), cap)
    val gen = prefix.join(pdfreq.filter(col("df") <= cap).hint("SHUFFLE_HASH"), "s")
    // size filter (Arasu et al. VLDB'06) — see [[jaccardNearDupsPrefix]]
    val cand = gen.select(col("__id").as("id_a"), col("nsh").as("pna"), col("s"))
      .join(gen.select(col("__id").as("id_b"), col("nsh").as("pnb"), col("s"))
        .hint("SHUFFLE_HASH"), "s")
      .filter(col("id_a") < col("id_b")
        && col("pnb").cast("double") >= lit(threshold) * col("pna").cast("double") - lit(1e-9)
        && col("pna").cast("double") >= lit(threshold) * col("pnb").cast("double") - lit(1e-9))
      .select("id_a", "id_b").distinct()
    // verification wants the per-doc shingle ARRAYS — one extra
    // tokenize pass of the corpus (map-only; candidate-bounded joins
    // after), only on this capped branch
    val sets = df
      .selectExpr(s"$idCol AS __id", s"${textShinglesSpark(textCol)} AS sh")
      .selectExpr("__id", "CAST(size(sh) AS BIGINT) AS nsh", "sh")
    (verifyJaccardPairs(sets, cand, threshold), cap)
  }

  /** Candidate-pair counts of the CAPPED generation vs the uncapped
    * full inverted index, plus the chosen ceiling, for the scaling
    * specs: (capped_pairs, full_pairs, df_cap).
    */
  private[graft] def cappedCandidateStats(
      df: DataFrame, idCol: String, textCol: String,
      budgetPairsPerDoc: Long): (Long, Long, Long) = {
    val ex = df
      .selectExpr(s"$idCol AS __id", s"${textShinglesSpark(textCol)} AS sh")
      .select(col("__id"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val cap = dfCapFor(dfreq, budgetPairsPerDoc.toDouble * df.count())
    def pairs(e: DataFrame): Long = e.select(col("__id").as("id_a"), col("s"))
      .join(e.select(col("__id").as("id_b"), col("s")), "s")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count()
    val capped = ex.join(dfreq.filter(col("df") <= cap), "s").select("__id", "s")
    (pairs(capped), pairs(ex), cap)
  }

  /** Candidate-pair count of the prefix-filtered path vs the full
    * inverted index, for diagnostics/specs: (prefix_pairs, full_pairs).
    */
  private[graft] def prefixCandidateStats(df: DataFrame, idCol: String, textCol: String, threshold: Double): (Long, Long) = {
    val sets = df
      .selectExpr(s"$idCol AS __id", s"${textShinglesSpark(textCol)} AS sh")
      .selectExpr("__id", "CAST(size(sh) AS BIGINT) AS nsh", "sh")
    val ex = sets.select(col("__id"), col("nsh"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("__id").orderBy(col("df"), col("s"))
    val prefix = ex.join(dfreq, "s")
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <=
        col("nsh") - ceil(lit(threshold * threshold) * col("nsh") - lit(1e-9)) + 1)
      .select("__id", "s")
    def pairs(e: DataFrame): Long = e.select(col("__id").as("id_a"), col("s"))
      .join(e.select(col("__id").as("id_b"), col("s")), "s")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count()
    (pairs(prefix), pairs(ex.select("__id", "s")))
  }

  /** Per-doc span-level duplication stats: of the doc's distinct
    * 3-token shingles, how many also occur in at least one OTHER doc
    * (corpus shingle df >= 2 — the shingle set is distinct per doc, so
    * df counts documents). Returns (idCol, n_spans, n_dup, dup_frac).
    *
    * The span-granular contamination signal behind substring-level
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL'22): doc-level near-dup misses boilerplate
    * and quoted spans shared across otherwise-distinct pages;
    * `dup_frac` ranks exactly those. Integer counts + one division —
    * exact cross-engine.
    *
    * Scale shape: explode -> one shuffle on the shingle for df ->
    * broadcast-ineligible but key-bounded join back on the shingle
    * (work ~ sum of df per shingle, zipf-skewed: AQE skew split
    * applies) -> one keyed agg per doc. Never docs².
    */
  def spanDupStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = df.selectExpr(s"$idCol AS __id", s"explode(${textShinglesSpark(textCol)}) AS sh")
    val d = s.groupBy("sh").agg(count(lit(1)).cast("long").as("df"))
    val dup = sum(when(col("df") >= 2, 1).otherwise(0)).cast("long")
    s.join(d.hint("SHUFFLE_HASH"), "sh")
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).cast("long").as("n_spans"),
        dup.as("n_dup"),
        (dup.cast("double") / count(lit(1)).cast("double")).as("dup_frac"))
      .withColumnRenamed("__id", idCol)
  }

  /** CHARACTER-level exact-substring duplication profile: for each
    * doc, how many of its length-`L` character windows appear VERBATIM
    * in at least one other document — the exact-substring member of
    * the dedup family (the C4/RefinedWeb "remove any three-sentence
    * span seen before" policy generalized to fixed-length windows;
    * [[spanDupStats]] is the token-shingle cousin). Returns
    * (idCol, n_windows, dup_windows) — integer counts, exact
    * cross-engine.
    *
    * Scale shape — hash-prefilter then string-exact verify, with the
    * DOCUMENTS never entering a shuffle:
    *  1. every window derives its L-char string + 8-byte `xxhash64` in
    *     one map pass and drops the source text; the
    *     document-frequency shuffle prunes to (hash, doc) pairs and a
    *     map-side-combined min/max-doc aggregate finds hashes seen in
    *     >= 2 docs (no distinct pass, no count-distinct expand);
    *  2. candidate windows (semi join on the hash) verify by the
    *     STRING itself — one window pass partitioned by gram kills
    *     hash collisions, so the result is EXACT and the hash purely a
    *     prefilter.
    * Work is O(total chars) map-side; shuffles carry 16-byte pairs for
    * every window but L-byte grams only for candidates; the 10-100x
    * larger documents never ship. Never docs².
    */
  def substringDupProfile(df: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    require(L >= 4, s"window length $L too short to mean anything")
    val base0 = df.select(col(idCol).as("__id"), col(textCol).as("__t"))
      .filter(length(col("__t")) >= L)
    // Size the EXPLODE stage by its OUTPUT, not its input bytes: the
    // window explode amplifies each doc to ~|text| rows, so a docs
    // table that reads in a handful of partitions (an 18 MB sf1 table
    // reads in 2) hands each map task MILLIONS of near-unique keys —
    // the df-aggregate's partial hash map overflows and falls back to
    // sort-based aggregation with spills (measured 34 s vs 4 s at sf1
    // for the identical plan at 32 explode tasks). ~500K windows/task
    // keeps per-task agg state ~25 MB. One control-plane row (sum of
    // lengths) prices the repartition; tables already partitioned
    // finer than the target are left alone — at real cluster scale the
    // scan is naturally wide and this repartition never fires.
    val nWin = Option(base0.agg(sum(length(col("__t")) - (L - 1))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val targetPerTask = 500000L
    val wantParts = math.min((nWin + targetPerTask - 1) / targetPerTask, 1L << 20).toInt
    // NOT pinned, deliberately (r21 receipt): three consumers read
    // `base` (the hash df-pass, the candidate gram pass, the per-doc
    // n_windows projection), each re-planning its own scan + filter +
    // round-robin repartition of the 2-column corpus — 4 corpus reads
    // total with the sizing job. Collapsing them behind a Lineage.pin
    // was measured BOTH scales and lost: dedicated A/B 2.18 -> 2.43 s
    // at sf0.1 (the pin's blocking materialization outweighs three
    // narrow re-scans), 7.92 -> 7.62 s at sf1 (~4%, inside noise) —
    // the repeated scans are cheap because they ship 16-byte projected
    // rows, never the exploded windows; the expensive work (two window
    // explodes) is unavoidable in the hash-prefilter design.
    val base =
      if (wantParts > base0.rdd.getNumPartitions) base0.repartition(wantParts)
      else base0
    // "seen in >= 2 distinct docs" == min(doc) != max(doc): ONE
    // aggregation with map-side partial combine — no distinct shuffle,
    // no count-distinct expand. The df pass ships (hash, surrogate) =
    // 16 fixed bytes per window: a long surrogate stands in for the
    // doc id (only DISTINCTNESS matters to min != max, never the
    // value), keeping the 16.7M-entry agg state primitive-typed
    // instead of string-keyed accumulators. The surrogate is a HASH of
    // the id, not a per-row counter: duplicate rows carrying the same
    // id must still count as ONE doc, or a within-doc repeat in a
    // duplicated row would be flagged as a cross-doc duplicate.
    val slim = base.withColumn("__nid", xxhash64(col("__id")))
      .select(col("__nid"), col("__t"),
        explode(sequence(lit(1), length(col("__t")) - (L - 1))).as("__i"))
      .select(col("__nid"), xxhash64(expr(s"substring(__t, __i, $L)")).as("__h"))
    val dupHash = slim.groupBy("__h")
      .agg(min(col("__nid")).as("__mn"), max(col("__nid")).as("__mx"))
      .filter(col("__mn") =!= col("__mx")).select("__h")
    // candidate pass re-derives window strings + hashes in one map pass
    // and drops the document text immediately: nothing downstream ever
    // ships `__t` — the candidate shuffle ships (doc, gram) = L + 16
    // bytes for REPEATED hashes only, never the 10-100x larger
    // documents. No join-strategy hint: dupHash is a tiny fraction of
    // windows on a clean corpus and AQE's runtime size check converts
    // the semi join to broadcast when it fits, while a pathological
    // all-duplicate corpus degrades to a shuffle join instead of OOM.
    val hashed = base.select(col("__id"), col("__t"),
        explode(sequence(lit(1), length(col("__t")) - (L - 1))).as("__i"))
      .select(col("__id"), expr(s"substring(__t, __i, $L)").as("__g"))
      .withColumn("__h", xxhash64(col("__g")))
    val cand = hashed.join(dupHash, Seq("__h"), "left_semi")
      .select(col("__id"), col("__g"))
    // string-exact verification as ONE window pass over the candidates
    // (min/max over the gram partition) instead of a second aggregate +
    // semi join — the candidate pipeline is derived once, not thrice
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("__g")
    val perDoc = cand
      .withColumn("__gmn", min(col("__id")).over(wg))
      .withColumn("__gmx", max(col("__id")).over(wg))
      .filter(col("__gmn") =!= col("__gmx"))
      .groupBy("__id").agg(count(lit(1)).cast("long").as("dup_windows"))
    base.select(col("__id"), (length(col("__t")) - (L - 1)).cast("long").as("n_windows"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
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

  /** LSH band rows for a corpus: one row per (doc, band) carrying the
    * full signature and the band key — the join shape of
    * [[minhashCandidates]] and the storage layout of the persisted
    * index ([[buildLshIndex]]).
    */
  private def lshBands(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bandKeys = (0 until LshBands).map { bnd =>
      val key = (0 until LshRows).map(r => s"m${bnd * LshRows + r}").mkString(", ")
      s"concat_ws(',', $key)"
    }.mkString(", ")
    val mcols = (0 until MinhashK).map(i => s"m$i")
    minhashSignatures(df, idCol, textCol)
      .selectExpr((idCol +: mcols) :+ s"posexplode(array($bandKeys)) AS (band, bk)": _*)
  }

  private def estSimCols(idCol: String): Seq[String] = {
    val matches = (0 until MinhashK).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    Seq(
      s"a.$idCol AS id_a", s"b.$idCol AS id_b",
      s"CAST($matches AS BIGINT) AS n_match",
      s"CAST($matches AS DOUBLE) / $MinhashK.0 AS est_sim")
  }

  /** MinHash-LSH candidate pairs (band equi-join) with the estimated
    * similarity (matching-permutation fraction).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bands = lshBands(df, idCol, textCol)
    bands.as("a")
      .join(bands.as("b").hint("SHUFFLE_HASH"),
        expr(s"a.band = b.band AND a.bk = b.bk AND a.$idCol < b.$idCol"))
      .selectExpr(estSimCols(idCol): _*)
      .distinct()
  }

  /** Persist the LSH band table for a corpus at `path` — the
    * train-once/serve-many layout for INCREMENTAL dedup: a new crawl
    * batch is checked against the stored corpus without re-signing or
    * re-banding anything already indexed. Written partitioned by band
    * so a serving join scans each band dir once.
    */
  def buildLshIndex(df: DataFrame, idCol: String, textCol: String, path: String): Unit =
    lshBands(df, idCol, textCol)
      .write.partitionBy("band").mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Append a new batch's band rows to an existing index (call after
    * accepting the batch, so the next batch dedups against it too).
    * The id column and schema must match the index exactly.
    */
  def appendToLshIndex(df: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val stored = df.sparkSession.read.parquet(path)
    val add = lshBands(df, idCol, textCol)
    val want = stored.columns.sorted.toSeq
    val got = add.columns.sorted.toSeq
    require(want == got, s"index schema mismatch: stored=$want batch=$got")
    add.write.partitionBy("band").mode(org.apache.spark.sql.SaveMode.Append).parquet(path)
  }

  /** Candidate near-dup pairs between a NEW batch and the indexed
    * corpus: (batch id_a, indexed id_b, n_match, est_sim). Only the
    * batch is signed; the corpus side is the stored band table. Same
    * shuffle-bounded band equi-join as [[minhashCandidates]] — work
    * scales with batch size + matching band buckets, not corpus size;
    * identical ids on both sides (a re-crawled doc) are excluded.
    */
  def lshCandidatesIndexed(batch: DataFrame, idCol: String, textCol: String, path: String): DataFrame =
    lshCandidatesAgainst(batch, idCol, textCol, batch.sparkSession.read.parquet(path))

  /** Core of [[lshCandidatesIndexed]] with the index as a frame — lets
    * a caller pre-filter the stored band table (e.g. the streaming
    * ingester pruning its own in-flight batch partition on replay).
    */
  private[graft] def lshCandidatesAgainst(
      batch: DataFrame, idCol: String, textCol: String, idxBands: DataFrame): DataFrame = {
    val qb = lshBands(batch, idCol, textCol)
    qb.as("a")
      .join(idxBands.as("b").hint("SHUFFLE_HASH"),
        expr(s"a.band = b.band AND a.bk = b.bk AND a.$idCol <> b.$idCol"))
      .selectExpr(estSimCols(idCol): _*)
      .distinct()
  }

  /** Number of hash buckets the persisted phrase index partitions
    * into: the unit of partition pruning at query time.
    */
  val PhraseIndexBuckets = 64

  /** Build a persisted inverted n-gram index for exact phrase search:
    * one (ngram, id) row per distinct word n-gram per doc, written
    * partitioned by `bucket = poly_hash(ngram) % PhraseIndexBuckets`.
    * A phrase query reads exactly ONE bucket directory (static
    * partition pruning) instead of scanning the corpus — grep at
    * corpus scale. Build: one explode, one shuffle ON the bucket key,
    * one partitioned write. The repartition is load-bearing: without
    * it every scan task writes a file into every bucket directory
    * (tasks × buckets small files — a quarter of the whole build+query
    * cost at sf0.1, and a pathological file count at corpus scale);
    * with it each directory is written by exactly the tasks that own
    * its bucket.
    *
    * Returns the posting rows (idCol, nh, bucket) that were written,
    * PINNED (Lineage.pin before the write — the write then reads pinned
    * blocks instead of re-deriving the explode): a caller that needs a
    * build summary (q98 reports per-bucket posting/ngram counts)
    * aggregates the returned frame instead of reading the 64-dir
    * partitioned layout back — the read-back paid file-listing + open
    * cost over tasks×buckets small files for rows the build had just
    * materialized. Same rows by construction; callers that only want
    * the artifact discard the value.
    */
  def buildPhraseIndex(df: DataFrame, idCol: String, textCol: String, n: Int, path: String): DataFrame = {
    require(n >= 2, s"phrase n-grams need n >= 2: $n")
    // the index stores only the n-gram HASH, not the string: the search
    // path re-verifies every candidate against the source text, so hash
    // collisions cost a candidate row, never a wrong answer — and the
    // posting list shrinks to two BIGINTs per entry instead of a string
    // per n-gram, which is what the write (and at corpus scale the
    // storage) is bounded by
    val postings = graft.operators.Lineage.pin(
      df.selectExpr(idCol, s"explode(graft_word_ngrams($textCol, $n, true)) AS __ngram")
        .selectExpr(idCol, "graft_poly_hash(__ngram) AS nh")
        .selectExpr(idCol, "nh", s"pmod(nh, $PhraseIndexBuckets) AS bucket"))
    postings
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    postings
  }

  /** Exact token-aligned phrase search against a [[buildPhraseIndex]]
    * index built with n = the phrase's token count: candidate ids come
    * from the phrase's single index bucket (partition-pruned read +
    * ngram-HASH equality), then candidates are verified against the source
    * text (space-padded `contains`, the token-aligned containment the
    * n-gram presence is equivalent to — the verify guards a corrupted
    * or mismatched index, and is what the oracle recomputes by full
    * scan). Work: one bucket read + a semi-join of candidate ids
    * against the corpus — never a corpus scan.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String, indexPath: String, phrase: String): DataFrame = {
    // the phrase lands inside SQL string literals: reject characters the
    // literal parser would reinterpret (quotes, escapes, control chars)
    require(!phrase.exists(c => c == '\'' || c == '\\' || c < ' '),
      s"phrase must not contain quotes, backslashes, or control chars: $phrase")
    val n = phrase.split(" ", -1).length
    require(n >= 2, s"phrase must have >= 2 tokens: '$phrase'")
    val spark = df.sparkSession
    val candidates = spark.read.parquet(indexPath)
      .where(expr(s"bucket = pmod(graft_poly_hash('$phrase'), $PhraseIndexBuckets) AND nh = graft_poly_hash('$phrase')"))
      .select(col(idCol))
    df.join(candidates, Seq(idCol), "left_semi")
      .filter(expr(s"contains(concat(' ', $textCol, ' '), ' $phrase ')"))
      .select(col(idCol))
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

  /** Gopher-style repetition statistics per document: word-bigram
    * duplicate fraction and top-bigram coverage, plus a `repetitive`
    * flag on the published thresholds (dup fraction > 0.2 or any single
    * bigram covering > 0.18 of the text). The standard repeated-content
    * quality filter for web-scale corpora (Rae et al., Gopher §A1.2).
    *
    * Scale shape: MAP-ONLY — the per-doc bigram counting runs inside
    * the one-pass `graft_rep_stats` kernel (no explode, no shuffle,
    * no join; value-identical to the composed explode+groupBy form,
    * equivalence spec'd), so the pass costs one corpus scan at any
    * scale. Counts are integers and the fractions single IEEE
    * divisions, so results are bit-identical across engines and
    * partitionings.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.selectExpr(idCol, s"graft_rep_stats($textCol) AS __r")
      .filter(col("__r").isNotNull) // < 2 tokens: no bigrams, no row
      .select(col(idCol),
        col("__r.n_bigrams").as("n_bigrams"),
        col("__r.n_distinct_bigrams").as("n_distinct_bigrams"),
        col("__r.top_bigram_n").as("top_bigram_n"))
      .select(
        col(idCol), col("n_bigrams"), col("n_distinct_bigrams"), col("top_bigram_n"),
        ((col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams").cast("double"))
          .as("dup_bigram_frac"),
        (col("top_bigram_n").cast("double") / col("n_bigrams").cast("double")).as("top_bigram_frac"))
      .withColumn("repetitive", col("dup_bigram_frac") > 0.2 || col("top_bigram_frac") > 0.18)

  /** Default PII-shaped redaction classes: (name, regex, replacement).
    * Patterns stay inside the Java ∩ RE2 regex subset (no backrefs, no
    * lookaround) so engine and any RE2-based oracle agree byte-for-byte.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]"),
    ("ipv4", """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b""", "[IP]"),
  )

  /** Pattern redaction: per-class match counts over the ORIGINAL text
    * plus the text after redacting every class in sequence. Counting on
    * the original keeps the per-class stats independent of class order;
    * the replacement fold is the order given. Narrow map-only pass —
    * regexes run inside the scan pipeline (codegen'd built-ins), no
    * shuffle, no UDFs, so the pass costs one corpus scan at any scale.
    */
  def redactPatterns(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[(String, String, String)] = PiiPatterns,
  ): DataFrame = {
    require(patterns.nonEmpty, "redactPatterns needs at least one (name, regex, replacement) class")
    val counted = patterns.foldLeft(df.select(col(idCol), col(textCol))) {
      case (acc, (name, re, _)) =>
        acc.withColumn(s"n_$name", regexp_count(col(textCol), lit(re)).cast("long"))
    }
    val redacted = patterns.foldLeft(col(textCol)) {
      case (acc, (_, re, repl)) => regexp_replace(acc, lit(re), lit(repl))
    }
    counted
      .withColumn("redacted", redacted)
      .withColumn("changed", col("redacted") =!= col(textCol))
      .drop(textCol)
  }

  /** Benchmark decontamination: for every training document, the number
    * of its distinct trigram shingles that also occur in `benchmark`
    * (the held-out eval corpus), and a `contaminated` flag. Standard
    * n-gram test-set-overlap filtering (GPT-3 appendix C / PaLM style).
    *
    * Scale shape: the benchmark shingle set is distinct-reduced and
    * broadcast (eval sets are orders of magnitude smaller than training
    * corpora by construction); the training side explodes to (doc,
    * shingle) and aggregates back with map-side combine — one corpus
    * scan, no shuffle join against the corpus, no n².
    */
  def decontaminate(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
  ): DataFrame = {
    val benchSh = benchmark
      .selectExpr(s"${textShinglesSpark(textCol)} AS __sh")
      .select(explode(col("__sh")).as("__s")).distinct()
      .withColumn("__hit", lit(1))
    train
      .selectExpr(idCol, s"${textShinglesSpark(textCol)} AS __sh")
      .select(col(idCol), size(col("__sh")).cast("long").as("n_shingles"), explode(col("__sh")).as("__s"))
      .join(broadcast(benchSh), Seq("__s"), "left")
      .groupBy(idCol)
      .agg(max("n_shingles").as("n_shingles"), count(col("__hit")).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Token-budget sequence packing: concat-then-chunk pack assignment,
    * the standard LM pre-training layout. Documents are laid out in
    * `idCol` order within each `shardCol` partition; `pack_id` is the
    * fixed-`budget` chunk where each document STARTS, `pack_offset` its
    * token offset inside that chunk, `spans_boundary` whether it crosses
    * into the next chunk.
    *
    * Scale shape: one window (cumulative BIGINT sum) partitioned on the
    * shard key — shards pack independently, so the shuffle is one
    * hash-partition on shard and no global sort exists; exact integer
    * arithmetic makes the assignment deterministic on any cluster.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      budget: Long,
  ): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    df.select(col(idCol), col(shardCol),
        size(split(col(textCol), lit(" "))).cast("long").as("n_tokens"))
      .withColumn("__cum", sum("n_tokens").over(w))
      .select(
        col(idCol), col(shardCol), col("n_tokens"),
        expr(s"(__cum - n_tokens) DIV $budget").as("pack_id"),
        expr(s"(__cum - n_tokens) % $budget").as("pack_offset"))
      .withColumn("spans_boundary", col("pack_offset") + col("n_tokens") > budget)
  }

  /** Near-dup CLUSTER assignment for the whole corpus: MinHash-LSH
    * candidate pairs -> connected components -> every doc labeled with
    * its cluster (cluster id = min doc id in the component; docs in no
    * pair are their own singleton cluster), plus the cluster size and
    * a canonical flag. Pairs say "these two look alike"; dedup policy
    * needs the transitive closure — keep one doc per CLUSTER.
    *
    * Scale shape: components via alternating large-star/small-star
    * ([[graft.operators.ConnectedComponents]], O(log² n) rounds of
    * key-shuffles); the size is a groupBy + join on cluster_id rather
    * than a count-over-window so a giant cluster (template spam) hits
    * AQE's skew-join split instead of serializing one window partition.
    */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = minhashCandidates(df, idCol, textCol)
    val comp = graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    val labeled = df.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("cluster_id"))
    val sizes = labeled.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
  }

  /** Tokenizer vocabulary builder: the top `topN` corpus tokens by
    * frequency with rank, cumulative count, and corpus coverage — the
    * vocab-init / pruning step before BPE training, and the coverage
    * curve that decides vocab size.
    *
    * Scale shape: explode → one partial-agg groupBy on the token, then
    * the global top-N goes through `orderBy().limit(n)` — Spark plans
    * TakeOrderedAndProject (per-partition heaps, no full sort), so the
    * vocabulary-sized frame never funnels through one task. Only the
    * N surviving rows see the rank/cumulative window (bounded by
    * `topN`, documented single-partition by construction). Coverage is
    * one IEEE division of exact BIGINT counts — bit-identical
    * cross-engine.
    */
  def buildVocab(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive: $topN")
    val tf = df.selectExpr(s"explode(${tokensSpark(textCol)}) AS term")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = tf.agg(sum("cnt").as("total"))
    val top = tf.orderBy(col("cnt").desc, col("term")).limit(topN)
    val w = Window.orderBy(col("cnt").desc, col("term"))
    top.join(broadcast(total))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum", sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("coverage", col("cum").cast("double") / col("total").cast("double"))
      .select(col("term"), col("cnt"), col("rnk"), col("cum"), col("coverage"))
  }

  /** Corpus collocation extraction: the top-`topK` adjacent word pairs
    * by LIFT — p(ab) / (p(a)·p(b)) over token bigram/unigram counts —
    * with a minimum-count floor against noise pairs. The phrase-vocab /
    * tokenizer-merge-candidate signal (collocations are what multiword
    * tokens and BPE merges are made of). Lift is the exponential of
    * pointwise mutual information: identical ordering, and — unlike
    * log-PMI — exact cross-engine (integer counts, four
    * correctly-rounded IEEE ops in a fixed textual order, no libm; the
    * same trade [[graft.operators.SearchKit]] documents for idf).
    *
    * Scale shape: bigram counts = one map-only ngram kernel pass + one
    * shuffle on the bigram; unigram counts likewise; the pair table
    * joins the unigram table twice on a term key (AQE broadcasts a
    * small vocabulary, shuffle+skew-split otherwise); totals are 1-row
    * broadcast sides; top-k via per-partition heaps.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(topK > 0, s"topK must be positive: $topK")
    // the bigram + unigram kernels are pure CPU over the text bytes; a
    // few-MB parquet scan arrives 1-2 partitions wide and serializes
    // them (measured 3.0 -> 1.2 s at sf1 when widened)
    val wide = graft.operators.Par.widen(df.select(col(textCol)))
    val bgc = wide.selectExpr(s"explode(${textBigramsSpark(textCol)}) AS g")
      .groupBy("g").agg(count(lit(1)).cast("long").as("n_ab"))
    val unc = wide.selectExpr(s"explode(${tokensSpark(textCol)}) AS t")
      .groupBy("t").agg(count(lit(1)).cast("long").as("n_t"))
    val tot = unc.agg(sum("n_t").cast("long").as("tt"))
    val btot = bgc.agg(sum("n_ab").cast("long").as("bt"))
    val sp = bgc.filter(col("n_ab") >= minCount)
      .selectExpr("split(g, ' ')[0] AS term_a", "split(g, ' ')[1] AS term_b", "n_ab")
    val j = sp
      .join(unc.select(col("t"), col("n_t").as("n_a")), col("term_a") === col("t")).drop("t")
      .join(unc.select(col("t"), col("n_t").as("n_b")), col("term_b") === col("t")).drop("t")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
      .withColumn("lift", expr(
        "(CAST(n_ab AS DOUBLE) / CAST(bt AS DOUBLE))" +
          " / ((CAST(n_a AS DOUBLE) / CAST(tt AS DOUBLE)) * (CAST(n_b AS DOUBLE) / CAST(tt AS DOUBLE)))"))
    j.orderBy(col("lift").desc, col("term_a"), col("term_b")).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("lift").desc, col("term_a"), col("term_b"))).cast("long"))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift"), col("rank"))
  }

  /** Leakage-safe train/validation split: the split is a pure function
    * of the NEAR-DUP CLUSTER id, not the document id — near-duplicate
    * documents land in the same split by construction, so validation
    * can't contain a near-copy of a training document (the cross-split
    * contamination a doc-level coin silently permits). `valBp` basis
    * points of coin space go to 'val', the rest to 'train'; the coin
    * is the same engine-portable `poly_hash(key ':' salt) % 10000`
    * as [[stratifiedSample]], so splits are reproducible and salts
    * draw independent partitions.
    *
    * Work = [[dedupClusters]] (LSH banding + O(log² n) label
    * propagation) plus one map-only coin pass — no shuffle beyond the
    * clustering itself.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      valBp: Int,
      salt: String = "",
  ): DataFrame = {
    require(valBp >= 0 && valBp <= 10000, s"valBp is basis points in [0, 10000]: $valBp")
    require(!salt.contains("'"), s"salt must not contain quotes: $salt")
    val coin = s"${polySpark(s"concat(CAST(cluster_id AS STRING), ':', '$salt')")} % 10000"
    dedupClusters(df, idCol, textCol)
      .withColumn("split_coin", expr(coin).cast("long"))
      .withColumn("split", when(col("split_coin") < valBp, lit("val")).otherwise(lit("train")))
      .select(col(idCol), col("cluster_id"), col("split_coin"), col("split"))
  }

  /** Deterministic stratified sampling — the domain-mixing step of a
    * corpus build ("keep 25% of crawl, 100% of wiki, drop spam").
    * `ratesBp` maps a stratum value to its keep rate in basis points
    * (0..10000); strata not in the map get `defaultBp`.
    *
    * The per-row coin is `poly_hash(id ':' salt) % 10000` — a pure
    * function of the row id, so the sample is reproducible across
    * runs, engines, partitionings, and cluster sizes (never
    * `rand()`), rows keep/drop consistently as rates change (nested
    * samples: raising a rate only ADDS rows), and distinct `salt`
    * values draw independent samples. Map-only pass: the rate lookup
    * is a codegen'd CASE over the fixed map, no join, no shuffle.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      ratesBp: Map[String, Int],
      defaultBp: Int,
      salt: String = "",
  ): DataFrame = {
    require((ratesBp.values ++ Seq(defaultBp)).forall(bp => bp >= 0 && bp <= 10000),
      s"rates are basis points in [0, 10000]: $ratesBp default=$defaultBp")
    require(!salt.contains("'"), s"salt must not contain quotes: $salt")
    def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"
    val cases = ratesBp.toSeq.sortBy(_._1)
      .map { case (s, bp) => s"WHEN ${sqlStr(s)} THEN ${bp}" }.mkString(" ")
    val bpExpr = s"CASE $strataCol $cases ELSE $defaultBp END"
    val coin = s"${polySpark(s"concat(CAST($idCol AS STRING), ':', '$salt')")} % 10000"
    df.withColumn("sample_coin", expr(coin).cast("long"))
      .filter(expr(s"sample_coin < $bpExpr"))
  }

  /** Weighted sampling WITHOUT replacement, deterministic (the ticket
    * model, Efraimidis–Spirakis with discrete coins and no libm): each
    * row holds `weightCol` integer tickets, ticket i's value is
    * `poly_hash(id ':' i ':' salt)`, the row's priority is its BEST
    * ticket (array_max over a generated sequence — map-only, no
    * explode, no shuffle), and the sample is the top `n` rows by
    * (priority desc, id). A doubled weight doubles the tickets and so
    * the selection pressure; the draw is reproducible across engines,
    * partitionings and runs, and distinct salts draw independent
    * samples — the quality-weighted corpus subsampling a data-mixing
    * pipeline runs at full scale, where the only non-map work is the
    * top-n (TakeOrderedAndProject: per-partition heaps, never a
    * global sort).
    *
    * `weightCol` must be an integer in [1, maxWeight] (tickets
    * materialize per row in the expression); rows violating that fail
    * the generated sequence loudly rather than sampling wrongly.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      maxWeight: Int = 64,
      salt: String = "",
  ): DataFrame = {
    require(n >= 1, s"sample size must be >= 1: $n")
    require(!salt.contains("'"), s"salt must not contain quotes: $salt")
    val ticket = polySpark(
      s"concat(CAST($idCol AS STRING), ':', CAST(ws_i AS STRING), ':', '$salt')")
    val priority =
      s"array_max(transform(sequence(1L, CAST($weightCol AS BIGINT)), ws_i -> $ticket))"
    val guarded = df.filter(
      expr(s"$weightCol >= 1 AND $weightCol <= $maxWeight OR " +
        s"raise_error(concat('weightedSample: weight out of [1, $maxWeight]: ', " +
        s"CAST($weightCol AS STRING)))"))
    import org.apache.spark.sql.expressions.Window
    guarded
      .withColumn("priority", expr(priority).cast("long"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(n)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("priority").desc, col(idCol))).cast("long"))
  }

  /** Domain-mixing rate planner: given target corpus shares per
    * stratum and a total token budget, compute the per-stratum keep
    * rate that [[stratifiedSample]] should run with. For each stratum:
    * available tokens (aggregated here), the budget slice
    * (`budget × share_bp / 10000`), the keep rate capped at 10000 bp
    * when the slice exceeds availability, and the shortfall
    * (`deficit_tokens` > 0 means the target is unreachable without
    * up-sampling/epoching — surfaced, never silently absorbed).
    *
    * All-integer arithmetic (DIV/caps) so the plan is bit-exact on any
    * engine. One partial-agg shuffle on the stratum key; the share
    * lookup is a codegen'd CASE, no join.
    */
  def mixingRates(
      df: DataFrame,
      strataCol: String,
      tokenCountCol: String,
      targetsBp: Map[String, Int],
      budgetTokens: Long,
  ): DataFrame = {
    require(targetsBp.values.forall(bp => bp >= 0 && bp <= 10000) && budgetTokens >= 0,
      s"target shares are basis points in [0, 10000]: $targetsBp budget=$budgetTokens")
    def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"
    val cases = targetsBp.toSeq.sortBy(_._1)
      .map { case (s, bp) => s"WHEN ${sqlStr(s)} THEN $bp" }.mkString(" ")
    df.groupBy(col(strataCol))
      .agg(sum(col(tokenCountCol)).cast("long").as("available_tokens"))
      .withColumn("share_bp", expr(s"CAST(CASE $strataCol $cases ELSE 0 END AS BIGINT)"))
      .withColumn("target_tokens", expr(s"($budgetTokens * share_bp) DIV 10000"))
      .withColumn("rate_bp",
        expr("CASE WHEN available_tokens = 0 THEN 0 " +
          "ELSE least(CAST(10000 AS BIGINT), (target_tokens * 10000) DIV available_tokens) END"))
      .withColumn("deficit_tokens", expr("greatest(CAST(0 AS BIGINT), target_tokens - available_tokens)"))
  }

  /** Per-doc top-`k` rarity-weighted terms: score = tf / df (term
    * frequency over corpus document frequency), rank by (score desc,
    * term asc). The TF-IDF family with a RATIONAL weight: 1/df is
    * monotone in the usual ln((N+1)/(df+1)) idf, and a single IEEE
    * division is correctly rounded — bit-identical across engines —
    * where ln is not (libm vs JDK differ in the last ulp). Rankings
    * with mixed tf can order differently than ln-idf; for
    * cross-engine-exact pipelines that trade is right.
    *
    * Scale shape: explode -> (doc, term) partial-agg groupBy, (term)
    * groupBy for df, shuffle join back on term (zipf-skewed on common
    * terms — AQE skew split applies; common terms score near zero but
    * still flow through the join), then one row_number window per doc.
    */
  def rarityTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = df.selectExpr(idCol, s"explode(${tokensSpark(textCol)}) AS term")
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  /** Sliding-window document chunking — long docs split into fixed
    * token windows (`size` tokens every `stride`; overlap = size −
    * stride), the standard pre-tokenizer layout for context-bounded
    * training and retrieval indexing. One row per (doc, chunk) with
    * the 0-based token offset, actual token count (the tail chunk may
    * be short), and the chunk text.
    *
    * Map-only: tokenize + integer-sequence explode + slice inside one
    * scan pipeline — no shuffle, no join; output rows ≈ input tokens /
    * stride. Exact integer arithmetic and a deterministic string join
    * keep it oracle-checkable.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    df.selectExpr(idCol, s"${tokensSpark(textCol)} AS __tok")
      .selectExpr(idCol, "__tok", "CAST(size(__tok) AS BIGINT) AS __n")
      .filter(col("__n") >= 1)
      .selectExpr(idCol, "__tok", "__n",
        s"explode(sequence(CAST(0 AS BIGINT), __n - 1, CAST($stride AS BIGINT))) AS __s")
      .selectExpr(
        idCol,
        s"__s DIV $stride AS chunk_id",
        "__s AS chunk_start",
        s"CAST(least(CAST($size AS BIGINT), __n - __s) AS BIGINT) AS n_chunk_tokens",
        s"array_join(slice(__tok, CAST(__s + 1 AS INT), $size), ' ') AS chunk_text")
  }

  /** Per-domain document cap — at most `k` docs per domain, best
    * first (`orderCol` descending, id ascending tie-break): the
    * over-represented-domain guard every web-crawl curation pass runs
    * (a handful of hosts contribute an outsized share of pages).
    *
    * Scale shape: ONE shuffle on the domain key, and the rank filter
    * is pushed into the exchange — Spark's WindowGroupLimit rewrite
    * (rank-limit pushdown) inserts a partial group-limit on the map
    * side, so the shuffle carries at most `k` rows per (input
    * partition, domain) instead of the whole corpus. The plan shape is
    * pinned by PlanSpecs.
    */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String, orderCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(domainCol).orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Corpus-trained add-one-smoothed bigram language-model fluency
    * score per document — the engine-native stand-in for
    * perplexity-based quality filtering (CCNet-style): documents whose
    * bigrams are common in the corpus score high, word-soup scores
    * low.
    *
    * p(w2|w1) = (c(w1 w2) + 1) / (ctx(w1) + V), with ctx(w1) = # of
    * bigram occurrences starting with w1 and V = unigram vocabulary
    * size. Per doc: bigram count, minimum probability, and the mean
    * probability accumulated as a strict left fold in token order —
    * each p is ONE IEEE division of exact integers and the fold order
    * is pinned, so results are bit-identical cross-engine (ln-space
    * scores would not be; same trade as rarityTerms).
    *
    * Scale shape: train small, score once. The instance-sized exploded
    * frame feeds exactly ONE partial-agg groupBy (bigram counts) and
    * ONE probe join; context counts come from re-aggregating the
    * already-aggregated bigram table (c1(w1) = Σ c2 over bigrams
    * starting w1 — vocabulary-sized, not corpus-sized), V is a 1-row
    * broadcast, and the per-bigram probability is attached to the
    * model table BEFORE the probe join. The per-doc collect_list is
    * bounded by document length. No n², no corpus-sized broadcast,
    * and the zipf-skewed probe join is AQE-skew-splittable.
    *
    * Hot-key contract: the per-doc ordered fold buffers ONE document's
    * (pos, p) pairs in its aggregation task — memory is O(longest
    * single document), never O(corpus) or O(partition). That bound is
    * structural (a "key" here is one document, and a document is at
    * most its own token count — unlike per-USER folds, where one bot
    * key can be unbounded; see [[graft.operators.Funnel]] for that
    * case). LmHotDocSpec pins a pathologically long document through
    * this path. Truly pathological single documents (100M+ tokens)
    * should be length-capped upstream — the curation pipeline's
    * quality gate drops them anyway.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreWithModel(df, idCol, textCol, bigramModel(df, textCol))

  /** The trained bigram model as a frame: one row per distinct corpus
    * bigram with its count, context count, vocabulary size, and
    * add-one probability. Vocabulary-sized (never corpus-sized) — the
    * persistable train-once artifact behind [[lmScore]].
    */
  def bigramModel(df: DataFrame, textCol: String): DataFrame = {
    val bg = df.selectExpr(s"explode(${textBigramsSpark(textCol)}) AS bg")
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = c2.withColumn("w1", expr("substring_index(bg, ' ', 1)"))
      .groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = df
      .selectExpr(s"explode(${tokensSpark(textCol)}) AS w")
      .agg(countDistinct(col("w")).as("v"))
    c2.withColumn("w1", expr("substring_index(bg, ' ', 1)"))
      .join(c1, "w1")
      .join(broadcast(vocab))
      .withColumn("p", (col("c2") + 1L).cast("double") / (col("c1") + col("v")).cast("double"))
      .select("bg", "c2", "c1", "v", "p")
  }

  /** Train [[bigramModel]] once and persist it at `path` — the LM
    * twin of [[buildPhraseIndex]]/[[buildLshIndex]]: score any number
    * of batches against the stored model without re-counting the
    * corpus.
    */
  def trainBigramLm(df: DataFrame, textCol: String, path: String): Unit =
    bigramModel(df, textCol)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Score documents against a PERSISTED [[trainBigramLm]] model: the
    * serve path is one probe join (batch bigrams x stored model) plus
    * the per-doc ordered fold — no training pass. Bigrams absent from
    * the model drop out of the join, so serve a batch only against a
    * model trained on a superset (as q80 does) or accept unseen-bigram
    * rows being skipped.
    */
  def lmScoreIndexed(df: DataFrame, idCol: String, textCol: String, modelPath: String): DataFrame =
    scoreWithModel(df, idCol, textCol,
      df.sparkSession.read.parquet(modelPath).select("bg", "p"))

  private def scoreWithModel(df: DataFrame, idCol: String, textCol: String, model: DataFrame): DataFrame = {
    val bg = df
      .selectExpr(idCol, s"${tokensSpark(textCol)} AS __tok")
      .selectExpr(idCol, s"posexplode(${bigramsSpark("__tok")}) AS (pos, bg)")
    bg.join(model.select("bg", "p"), "bg")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        min(col("p")).as("min_prob"),
        expr("aggregate(sort_array(collect_list(struct(pos, p))), CAST(0.0 AS DOUBLE), (lm_acc, lm_x) -> lm_acc + lm_x.p)").as("__sum"),
      )
      .withColumn("avg_prob", col("__sum") / col("n_bigrams").cast("double"))
      .drop("__sum")
  }

  /** The training-data EXPORT pipeline, end to end: exact-dedup
    * canonicals → deterministic stratified sampling → fixed-window
    * tiling chunks → reproducible corpus shuffle-shard → per-shard
    * token packing. The write-side twin of [[curate]] (which filters;
    * this lays out): the output says, for every surviving chunk,
    * exactly which shard, position, pack, and offset it trains from —
    * reproducible on any engine or partitioning.
    *
    * Scale: dedup is one shuffle on the content hash; sampling is
    * map-only; chunking is map-only; the shard index is the
    * [[graft.operators.GlobalOrder]] fixed-bucket layout (no
    * single-partition window); packing is one window per shard key.
    */
  def exportCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      ratesBp: Map[String, Int],
      defaultBp: Int,
      salt: String,
      chunkTokens: Int,
      nshards: Int,
      packBudget: Long,
  ): DataFrame = {
    val wCanon = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    val canon = df.withColumn("__rn", row_number().over(wCanon))
      .filter(col("__rn") === 1).drop("__rn")
    val sampled = stratifiedSample(canon, idCol, strataCol, ratesBp, defaultBp, salt)
    // string chunk key, NOT id*K + chunk_id arithmetic: a packed integer
    // key silently collides once a doc exceeds K chunks, which at corpus
    // scale some doc always does — and a collided key breaks the total
    // order's determinism
    val chunks = chunkDocuments(sampled, idCol, textCol, chunkTokens, chunkTokens)
      .withColumn("__cid", concat_ws(":", col(idCol), col("chunk_id")))
    val sharded = graft.operators.GlobalOrder.shuffleShard(chunks, "__cid", nshards)
    val w = Window.partitionBy("shard").orderBy("global_pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("__cum", sum("n_chunk_tokens").over(w) - col("n_chunk_tokens"))
      .select(col(idCol), col("chunk_id"), col("shard"), col("global_pos"),
        expr(s"__cum DIV $packBudget").as("pack_id"),
        pmod(col("__cum"), lit(packBudget)).as("pack_offset"),
        col("n_chunk_tokens"))
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
    // near-dup sweep through the CAPPED candidate path (the q26 lever):
    // provably identical below the volume budget, linear-by-construction
    // above it — curation is exactly the boilerplate-heavy-corpus
    // workload the uncapped inverted index goes quadratic on
    val neardup = jaccardNearDupsAuto(df, idCol, textCol, jaccardThreshold)._1
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

  /** Chi-squared term–label association (one-vs-rest): the supervised
    * feature-selection / domain-signature primitive — which terms are
    * over-represented in each label's documents relative to the rest of
    * the corpus. For each (term, label) 2×2 contingency table
    * (a = label docs containing the term, b = other docs containing it,
    * c = label docs without it, d = other docs without it):
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * with (a+b) = df, (c+d) = N−df, (a+c) = n_label, (b+d) = N−n_label.
    * Numerator and denominator are EXACT BIGINTs (term presence is
    * doc-level — `array_distinct` before the explode); the single IEEE
    * division makes the double bit-identical on any partitioning or
    * engine (q133 is hash-gated). BIGINT headroom caps N at ~10⁷ docs
    * per corpus shard (N·(ad−bc)² < 2⁶³); beyond that, run per shard on
    * stratified counts or move the two products to DECIMAL(38,0).
    *
    * Returns the top-`topK` terms per label by χ² (ties broken by
    * term) among terms with document frequency in [minDf, N): columns
    * (label, term, n_label_docs, df, chi2, rnk). Sparse contingency:
    * a label is scored only for terms observed in it at least once
    * (a = 0 rows are never materialized — at corpus scale the dense
    * |terms|×|labels| cross product is exactly what this layout
    * avoids; absence-only signals surface via the other labels' rows).
    *
    * Scale shape: one explode + two keyed aggregations over the corpus
    * (the (term,label) and term marginals), then per-(term,label)
    * scalar math; label marginals broadcast. The rank window partitions
    * by label but only over the df-filtered term table — never the
    * corpus.
    */
  def chiSquaredTerms(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      minDf: Long = 5L,
      topK: Int = 15): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    require(topK > 0, s"topK must be positive: $topK")
    val docs = df.filter(col(labelCol).isNotNull)
    val dt = docs.selectExpr(s"$labelCol AS label",
      s"explode(array_distinct(${tokensSpark(textCol)})) AS term")
    val a = dt.groupBy("term", "label").agg(count(lit(1)).cast("long").as("n_tl"))
    val tdf = a.groupBy("term").agg(sum("n_tl").cast("long").as("df"))
    val nl = docs.groupBy(col(labelCol).as("label")).agg(count(lit(1)).cast("long").as("n_label"))
    val n = docs.select(count(lit(1)).cast("long").as("n_docs"))
    val x = a.join(tdf, "term")
      .filter(col("df") >= minDf)
      .join(broadcast(nl), "label")
      .crossJoin(broadcast(n))
      // a term in every doc, or a single-label corpus, has a zero
      // marginal — χ² is undefined (and uninformative): drop up front
      .filter(col("df") < col("n_docs") && col("n_label") < col("n_docs"))
    val bC = col("df") - col("n_tl")
    val dC = col("n_docs") - col("n_label") - bC
    val diff = col("n_tl") * dC - bC * (col("n_label") - col("n_tl"))
    val num = col("n_docs") * diff * diff
    val den = col("df") * (col("n_docs") - col("df")) *
      col("n_label") * (col("n_docs") - col("n_label"))
    val scored = x.select(col("label"), col("term"),
      col("n_tl").as("n_label_docs"), col("df"),
      (num.cast("double") / den.cast("double")).as("chi2"))
    val w = Window.partitionBy("label").orderBy(col("chi2").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
  }
}
