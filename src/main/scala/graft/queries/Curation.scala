package graft.queries

import graft.Tables
import graft.api.{TextCuration, VectorSearch}
import graft.operators.TextKit._
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond the similarity/dedup family —
  * the remaining passes a 100 TB LLM-training-data pipeline runs
  * between raw crawl and tokenizer: repetition-based quality filtering
  * (Gopher), PII/pattern redaction (C4-style), benchmark
  * decontamination (GPT-3 appendix C), token-budget sequence packing,
  * and int8 embedding compression for the ANN serving tier.
  *
  * Every query delegates to the public APIs
  * ([[graft.api.TextCuration]], [[graft.api.VectorSearch]]) and is
  * hash-matched against a bit-identical DuckDB oracle: counts are
  * integers, fractions single IEEE divisions, reductions strict left
  * folds — deterministic under any partitioning.
  *
  * Scale design: repetition/redaction/packing/quantization are one
  * corpus scan each (the only shuffle is the repetition groupBy and the
  * per-shard packing window); decontamination broadcasts the distinct
  * benchmark shingle set and streams the training corpus once. No
  * corpus-sized joins, no n².
  */
object Curation {

  /** A redaction class that actually hits this corpus's vocabulary —
    * exercises the replacement path alongside the zero-hit PII
    * defaults (the synthetic word-soup contains no emails or IPs,
    * which the oracle confirms by matching the all-zero counts).
    */
  private val termClass: (String, String, String) =
    ("term", """\b(key|hash|token|secret)\b""", "[TERM]")

  private val packBudget = 256L

  /** Shared recursive-CTE text: MinHash-LSH candidate pairs (q28's
    * oracle CTEs verbatim — same TextKit dialect helpers, so the
    * clustering is checked on the exact same edge set the Spark side
    * derives) -> connected components -> every doc labeled with its
    * component min. Ends with `lab(doc_id, cluster_id)`; q70 sizes the
    * clusters, q82 assigns splits on them.
    */
  private lazy val clusterLabelCtes: String = {
    val mins = (0 until MinhashK).map(i => s"min(${permExpr(i, "x")}) AS m$i").mkString(", ")
    val bandSelects = (0 until LshBands).map { bnd =>
      val key = (0 until LshRows).map(r => s"m${bnd * LshRows + r}").mkString(", ")
      s"SELECT doc_id, $bnd AS band, concat_ws(',', $key) AS bk FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH RECURSIVE
        t AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM documents),
        shi AS (SELECT doc_id, ${shinglesDuck("tok")} AS sh FROM t),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shi),
        hx AS (SELECT doc_id, ${polyDuck("s")} AS x FROM ex),
        sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id),
        bands AS ($bandSelects),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
        edges AS (SELECT doc_a AS eu, doc_b AS ev FROM cand
                  UNION ALL SELECT doc_b, doc_a FROM cand),
        walk(node, root) AS (
          SELECT eu, eu FROM edges
          UNION
          SELECT e.ev, w.root FROM walk w JOIN edges e ON e.eu = w.node),
        comp AS (SELECT node, min(root) AS cluster_id FROM walk GROUP BY node),
        lab AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)"""
  }

  val qs: Seq[Q] = Seq(
    Q(
      "q65_repetition",
      "Gopher-style repetition filter signals: per-doc word-bigram " +
        "duplicate fraction and top-bigram coverage + the repetitive flag. " +
        "Map-only: the one-pass graft_rep_stats kernel counts bigrams " +
        "per row — no explode, no shuffle (oracle keeps the composed " +
        "two-level aggregation form).",
      Some(s"""
        WITH t AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM documents),
        bg AS (SELECT doc_id, unnest(${bigramsDuck("tok")}) AS b FROM t),
        c AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY doc_id, b),
        m AS (SELECT doc_id,
                CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                count(*) AS n_distinct_bigrams,
                CAST(max(cnt) AS BIGINT) AS top_bigram_n
              FROM c GROUP BY doc_id)
        SELECT doc_id, n_bigrams, n_distinct_bigrams, top_bigram_n,
          CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS dup_bigram_frac,
          CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac,
          (CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) > 0.2
            OR CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE) > 0.18) AS repetitive
        FROM m ORDER BY doc_id
      """.trim),
      (spark, dir) =>
        TextCuration.repetitionStats(Tables(spark, dir).documents, "doc_id", "text"),
    ),
    Q(
      "q66_redaction",
      "Pattern redaction with per-class hit counts: PII defaults " +
        "(email, IPv4 — zero hits on this corpus, plumbing proven by the " +
        "matched zero counts) plus a term class that does hit. Counts over " +
        "the original text, replacements applied in sequence; map-only pass.",
      {
        val (_, emailRe, emailRepl) = TextCuration.PiiPatterns(0)
        val (_, ipRe, ipRepl) = TextCuration.PiiPatterns(1)
        val (_, termRe, termRepl) = termClass
        Some(s"""
          WITH r AS (SELECT doc_id, text,
            len(regexp_extract_all(text, '$emailRe')) AS n_email,
            len(regexp_extract_all(text, '$ipRe')) AS n_ipv4,
            len(regexp_extract_all(text, '$termRe')) AS n_term,
            regexp_replace(regexp_replace(regexp_replace(text,
              '$emailRe', '$emailRepl', 'g'),
              '$ipRe', '$ipRepl', 'g'),
              '$termRe', '$termRepl', 'g') AS redacted
          FROM documents)
          SELECT doc_id, n_email, n_ipv4, n_term, redacted,
            (redacted <> text) AS changed
          FROM r ORDER BY doc_id
        """.trim)
      },
      (spark, dir) =>
        // Sorting.projected: a plain orderBy's range sampling would run
        // the three regex passes twice over every doc
        graft.Sorting.projected(Tables(spark, dir).documents, col("doc_id"))(
          TextCuration.redactPatterns(_, "doc_id", "text",
            TextCuration.PiiPatterns :+ termClass)),
    ),
    Q(
      "q67_decontaminate",
      "Benchmark decontamination: distinct-trigram overlap of every " +
        "training doc against the held-out eval set (doc_id % 97 = 0), " +
        "GPT-3-style. Bench shingle set distinct-reduced and broadcast; " +
        "training corpus streams once.",
      Some(s"""
        WITH sh AS (SELECT doc_id, ${shinglesDuck(tokensDuck("text"))} AS sh FROM documents),
        b AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0),
        e AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM sh WHERE doc_id % 97 <> 0)
        SELECT e.doc_id,
          CAST(max(e.n_shingles) AS BIGINT) AS n_shingles,
          count(b.s) AS n_overlap,
          (count(b.s) > 0) AS contaminated
        FROM e LEFT JOIN b ON e.s = b.s
        GROUP BY e.doc_id ORDER BY e.doc_id
      """.trim),
      (spark, dir) => {
        val docs = Tables(spark, dir).documents
        TextCuration.decontaminate(
          docs.filter("doc_id % 97 <> 0"), docs.filter("doc_id % 97 = 0"),
          "doc_id", "text")
      },
    ),
    Q(
      "q68_seq_packing",
      "Token-budget sequence packing (concat-then-chunk, budget " +
        s"$packBudget): per-shard cumulative token offsets -> pack id / " +
        "offset / boundary-span flag. One window partitioned on the shard " +
        "key, exact BIGINT arithmetic; shards pack independently (no " +
        "global sort).",
      Some(s"""
        WITH t AS (SELECT doc_id, source, len(${tokensDuck("text")}) AS n_tokens FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
                sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM t)
        SELECT doc_id, source, n_tokens,
          CAST((cum - n_tokens) // $packBudget AS BIGINT) AS pack_id,
          CAST((cum - n_tokens) % $packBudget AS BIGINT) AS pack_offset,
          ((cum - n_tokens) % $packBudget + n_tokens > $packBudget) AS spans_boundary
        FROM c ORDER BY doc_id
      """.trim),
      (spark, dir) =>
        TextCuration.packSequences(Tables(spark, dir).documents,
          "doc_id", "text", "source", packBudget),
    ),
    Q(
      "q70_dedup_clusters",
      "Near-dup cluster assignment: MinHash-LSH candidate pairs -> " +
        "connected components (alternating large-star/small-star, " +
        "O(log^2 n) rounds) -> every doc labeled with its cluster id " +
        "(component min), size, and canonical flag. The transitive-closure " +
        "step pair generation alone can't give; oracle = recursive CTE.",
      Some(s"""
        $clusterLabelCtes,
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
        SELECT l.doc_id, l.cluster_id, s.cluster_size,
          (l.doc_id = l.cluster_id) AS is_canonical
        FROM lab l JOIN sz s ON l.cluster_id = s.cluster_id
        ORDER BY l.doc_id
      """.trim),
      (spark, dir) =>
        TextCuration.dedupClusters(Tables(spark, dir).documents, "doc_id", "text"),
    ),
    Q(
      "q71_stratified_sample",
      "Deterministic stratified sampling (domain mixing): per-source keep " +
        "rates in basis points, coin = poly_hash(id ':' salt) % 10000 — " +
        "reproducible on any engine/partitioning, nested as rates grow. " +
        "Map-only pass, rate lookup is a codegen'd CASE (no join).",
      {
        val coin = s"${polyDuck("CAST(doc_id AS VARCHAR) || ':mix1'")} % 10000"
        Some(s"""
          SELECT doc_id, source, $coin AS sample_coin
          FROM documents
          WHERE $coin < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 0
                        WHEN 'src2' THEN 5000 ELSE 2500 END
        """.trim)
      },
      (spark, dir) =>
        TextCuration.stratifiedSample(Tables(spark, dir).documents, "doc_id", "source",
          Map("src0" -> 10000, "src1" -> 0, "src2" -> 5000), defaultBp = 2500, salt = "mix1")
          .select("doc_id", "source", "sample_coin"),
    ),
    Q(
      "q72_rarity_terms",
      "Per-doc top-3 rarity-weighted terms: score = tf/df (rational TF-IDF " +
        "weight — a single correctly-rounded IEEE division keeps it " +
        "cross-engine exact where ln-idf is not). Explode -> two partial-agg " +
        "groupBys, shuffle join on term, one row_number window per doc.",
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(${tokensDuck("text")}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                CAST(tf.tf AS DOUBLE) / CAST(dfq.df AS DOUBLE) AS score
              FROM tf JOIN dfq USING (term)),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM s)
        SELECT doc_id, term, tf, df, score, rnk FROM r WHERE rnk <= 3
        ORDER BY doc_id, rnk
      """.trim),
      (spark, dir) =>
        TextCuration.rarityTerms(Tables(spark, dir).documents, "doc_id", "text", 3),
    ),
    Q(
      "q73_doc_chunking",
      "Sliding-window document chunking (64-token windows every 48): one " +
        "row per chunk with token offset, actual length, and text — the " +
        "pre-tokenizer layout for context-bounded training. Map-only: " +
        "tokenize + integer-sequence explode + slice in one scan pipeline.",
      Some(s"""
        WITH t AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM documents),
        n AS (SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS n FROM t WHERE len(tok) >= 1),
        s AS (SELECT doc_id, tok, n, unnest(generate_series(0, n - 1, 48)) AS st FROM n)
        SELECT doc_id,
          CAST(st // 48 AS BIGINT) AS chunk_id,
          st AS chunk_start,
          CAST(least(64, n - st) AS BIGINT) AS n_chunk_tokens,
          array_to_string(tok[st + 1 : st + 64], ' ') AS chunk_text
        FROM s
      """.trim),
      (spark, dir) =>
        TextCuration.chunkDocuments(Tables(spark, dir).documents, "doc_id", "text",
          size = 64, stride = 48),
    ),
    Q(
      "q75_incremental_lsh",
      "Incremental near-dup check: a new crawl batch (doc_id % 3 = 0) vs " +
        "a PERSISTED LSH band index of the existing corpus (the rest) — " +
        "only the batch is signed, the corpus side reads the stored band " +
        "table; work scales with batch size, not corpus size. Oracle " +
        "recomputes the same cross-pairs from scratch.",
      {
        val mins = (0 until MinhashK).map(i => s"min(${permExpr(i, "x")}) AS m$i").mkString(", ")
        val bandSelects = (0 until LshBands).map { bnd =>
          val key = (0 until LshRows).map(r => s"m${bnd * LshRows + r}").mkString(", ")
          s"SELECT doc_id, $bnd AS band, concat_ws(',', $key) AS bk FROM sig"
        }.mkString(" UNION ALL ")
        val matches = (0 until MinhashK).map(i => s"(CASE WHEN x.m$i = y.m$i THEN 1 ELSE 0 END)").mkString(" + ")
        Some(s"""
          WITH t AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM documents),
          shi AS (SELECT doc_id, ${shinglesDuck("tok")} AS sh FROM t),
          ex AS (SELECT doc_id, unnest(sh) AS s FROM shi),
          hx AS (SELECT doc_id, ${polyDuck("s")} AS x FROM ex),
          sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id),
          bands AS ($bandSelects),
          cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk
                   WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0)
          SELECT c.id_a, c.id_b,
            CAST($matches AS BIGINT) AS n_match,
            CAST($matches AS DOUBLE) / $MinhashK.0 AS est_sim
          FROM cand c JOIN sig x ON c.id_a = x.doc_id JOIN sig y ON c.id_b = y.doc_id
          ORDER BY id_a, id_b
        """.trim)
      },
      (spark, dir) => {
        // the corpus index is the train-once artifact (q99_lsh_build
        // times a fresh build); this entry times the SERVE path: sign
        // the batch, band equi-join against the stored band table
        val docs = Tables(spark, dir).documents
        val idx = graft.Artifacts.cached(s"lsh-index:$dir") { p =>
          TextCuration.buildLshIndex(docs.filter("doc_id % 3 <> 0"), "doc_id", "text", p)
        }
        TextCuration.lshCandidatesIndexed(docs.filter("doc_id % 3 = 0"), "doc_id", "text", idx)
      },
    ),
    Q(
      "q99_lsh_build",
      "LSH corpus-index build pass, timed separately from q75's serve " +
        "path: signs the corpus side (doc_id % 3 <> 0), writes the band " +
        "table partitioned by band, and returns the per-band summary " +
        "(row count + distinct bucket keys) the oracle recomputes from " +
        "the same MinHash signatures.",
      {
        val mins = (0 until MinhashK).map(i => s"min(${permExpr(i, "x")}) AS m$i").mkString(", ")
        val bandSelects = (0 until LshBands).map { bnd =>
          val key = (0 until LshRows).map(r => s"m${bnd * LshRows + r}").mkString(", ")
          s"SELECT doc_id, $bnd AS band, concat_ws(',', $key) AS bk FROM sig"
        }.mkString(" UNION ALL ")
        Some(s"""
          WITH t AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM documents
                     WHERE doc_id % 3 <> 0),
          shi AS (SELECT doc_id, ${shinglesDuck("tok")} AS sh FROM t),
          ex AS (SELECT doc_id, unnest(sh) AS s FROM shi),
          hx AS (SELECT doc_id, ${polyDuck("s")} AS x FROM ex),
          sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id),
          bands AS ($bandSelects)
          SELECT CAST(band AS BIGINT) AS band, count(*) AS n_rows,
            CAST(count(DISTINCT bk) AS BIGINT) AS n_buckets
          FROM bands GROUP BY band ORDER BY band
        """.trim)
      },
      (spark, dir) => {
        val docs = Tables(spark, dir).documents
        val path = graft.Artifacts.scratch("lshbuild")
        TextCuration.buildLshIndex(docs.filter("doc_id % 3 <> 0"), "doc_id", "text", path)
        spark.read.parquet(path)
          .groupBy(col("band").cast("long").as("band"))
          .agg(count(lit(1)).as("n_rows"), countDistinct(col("bk")).as("n_buckets"))
      },
    ),
    Q(
      "q76_mixing_rates",
      "Domain-mixing rate planner: per-source available tokens vs target " +
        "corpus shares under a 40k-token budget -> keep rate (bp, capped " +
        "at 100%) + unreachable-target deficit. All-integer arithmetic; " +
        "one partial-agg shuffle; feeds q71's stratifiedSample.",
      Some(s"""
        WITH a AS (SELECT source,
                     CAST(sum(len(${tokensDuck("text")})) AS BIGINT) AS available_tokens
                   FROM documents GROUP BY source),
        p AS (SELECT source, available_tokens,
                CAST(CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 500
                     WHEN 'src2' THEN 1500 ELSE 0 END AS BIGINT) AS share_bp
              FROM a),
        t AS (SELECT source, available_tokens, share_bp,
                (40000 * share_bp) // 10000 AS target_tokens
              FROM p)
        SELECT source, available_tokens, share_bp, target_tokens,
          CASE WHEN available_tokens = 0 THEN 0
               ELSE least(CAST(10000 AS BIGINT), (target_tokens * 10000) // available_tokens) END AS rate_bp,
          greatest(CAST(0 AS BIGINT), target_tokens - available_tokens) AS deficit_tokens
        FROM t ORDER BY source
      """.trim),
      (spark, dir) =>
        TextCuration.mixingRates(
          Tables(spark, dir).documents
            .selectExpr("source", s"CAST(size(${graft.operators.TextKit.tokensSpark("text")}) AS BIGINT) AS n_tokens"),
          "source", "n_tokens",
          Map("src0" -> 4000, "src1" -> 500, "src2" -> 1500),
          budgetTokens = 40000L),
    ),
    Q(
      "q93_corpus_export",
      "The training-data EXPORT capstone, end to end: exact-dedup " +
        "canonicals -> deterministic stratified sample -> 64-token tiling " +
        "chunks -> reproducible shuffle-shard (8 shards) -> per-shard " +
        "256-token packing. Every chunk's (shard, position, pack, offset) " +
        "hash-checked against the oracle recomputing the whole layout.",
      {
        val coin = s"${polyDuck("CAST(doc_id AS VARCHAR) || ':exp1'")} % 10000"
        Some(s"""
          WITH canon AS (
            SELECT doc_id, text, source FROM (
              SELECT doc_id, text, source,
                row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1),
          samp AS (SELECT doc_id, text FROM canon
                   WHERE $coin < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 0 ELSE 5000 END),
          tk AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM samp),
          tn AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n FROM tk WHERE len(tok) >= 1),
          st AS (SELECT doc_id, n, unnest(generate_series(0, n - 1, 64)) AS s0 FROM tn),
          ch AS (SELECT doc_id, CAST(s0 // 64 AS BIGINT) AS chunk_id,
                   CAST(least(64, n - s0) AS BIGINT) AS n_chunk_tokens FROM st),
          keyed AS (SELECT *, CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR) AS cid FROM ch),
          h AS (SELECT *, md5(cid) AS shuffle_key FROM keyed),
          r AS (SELECT *, row_number() OVER (ORDER BY shuffle_key, cid) - 1 AS global_pos FROM h),
          sh AS (SELECT *, global_pos % 8 AS shard FROM r),
          p AS (SELECT *, CAST(sum(n_chunk_tokens) OVER (PARTITION BY shard ORDER BY global_pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chunk_tokens AS BIGINT) AS cum
                FROM sh)
          SELECT doc_id, chunk_id, shard, global_pos,
            cum // 256 AS pack_id, cum % 256 AS pack_offset, n_chunk_tokens
          FROM p ORDER BY doc_id, chunk_id
        """.trim)
      },
      (spark, dir) =>
        TextCuration.exportCorpus(Tables(spark, dir).documents, "doc_id", "text", "source",
          Map("src0" -> 10000, "src1" -> 0), defaultBp = 5000, salt = "exp1",
          chunkTokens = 64, nshards = 8, packBudget = 256L),
    ),
    Q(
      "q82_leakage_split",
      "Leakage-safe train/validation split: the split coin hashes the " +
        "NEAR-DUP CLUSTER id (q70's components), not the doc id — so " +
        "near-duplicates can never straddle train and val (the doc-level " +
        "coin's silent contamination). 15% to val; oracle re-derives the " +
        "clusters via the recursive CTE and applies the same coin.",
      {
        val coin = s"${polyDuck("CAST(cluster_id AS VARCHAR) || ':split1'")} % 10000"
        Some(s"""
          $clusterLabelCtes
          SELECT doc_id, cluster_id, $coin AS split_coin,
            CASE WHEN $coin < 1500 THEN 'val' ELSE 'train' END AS split
          FROM lab ORDER BY doc_id
        """.trim)
      },
      (spark, dir) =>
        TextCuration.leakageSafeSplit(Tables(spark, dir).documents, "doc_id", "text",
          valBp = 1500, salt = "split1"),
    ),
    Q(
      "q77_corpus_shuffle",
      "Deterministic corpus shuffle-shard (training-data export layout): " +
        "md5 shuffle key -> distributed 0-based total-order index -> " +
        "round-robin shard. No single-partition window: fixed hex-prefix " +
        "range buckets + per-bucket counts (control-plane) + bucket-local " +
        "ranks; oracle = the global row_number the layout must equal.",
      Some("""
        WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key FROM documents),
        r AS (SELECT doc_id, shuffle_key,
                row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS global_pos
              FROM h)
        SELECT doc_id, shuffle_key, global_pos, global_pos % 8 AS shard
        FROM r ORDER BY doc_id
      """.trim),
      (spark, dir) =>
        graft.operators.GlobalOrder.shuffleShard(
          Tables(spark, dir).documents.select("doc_id"), "doc_id", nshards = 8)
          .select("doc_id", "shuffle_key", "global_pos", "shard"),
    ),
    Q(
      "q78_domain_caps",
      "Per-domain document cap (over-represented-host guard): keep the " +
        "top 10 docs per source by n_chars (id tie-break). One shuffle on " +
        "the domain; the rank filter is pushed map-side by Spark's " +
        "WindowGroupLimit rewrite (plan pinned), so the exchange carries " +
        "at most k rows per (partition, domain).",
      Some("""
        WITH r AS (SELECT doc_id, source, n_chars,
                     CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
                   FROM documents)
        SELECT doc_id, source, n_chars, rnk FROM r WHERE rnk <= 10
        ORDER BY doc_id
      """.trim),
      (spark, dir) =>
        TextCuration.capPerDomain(
          Tables(spark, dir).documents.select("doc_id", "source", "n_chars"),
          "doc_id", "source", "n_chars", k = 10),
    ),
    Q(
      "q80_bigram_lm",
      "Corpus-trained add-one bigram LM fluency score per doc (the " +
        "perplexity-filter stand-in): p(w2|w1) = (c2+1)/(ctx+V), per-doc " +
        "min and mean probability, mean accumulated as a strict left fold " +
        "in token order — every p one IEEE division of exact integers, so " +
        "cross-engine hash-exact where ln-space scores are not.",
      Some(s"""
        WITH t AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM documents),
        b0 AS (SELECT doc_id, ${bigramsDuck("tok")} AS bl FROM t),
        bp AS (SELECT doc_id, bl, unnest(generate_series(1, len(bl))) AS pos FROM b0),
        bg AS (SELECT doc_id, pos, bl[pos] AS bgr FROM bp),
        c2 AS (SELECT bgr, count(*) AS c2 FROM bg GROUP BY bgr),
        c1 AS (SELECT string_split(bgr, ' ')[1] AS w1, count(*) AS c1 FROM bg GROUP BY 1),
        vq AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(tok) AS w FROM t)),
        p AS (SELECT bg.doc_id, bg.pos,
                CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + vq.v AS DOUBLE) AS p
              FROM bg JOIN c2 ON bg.bgr = c2.bgr
                      JOIN c1 ON string_split(bg.bgr, ' ')[1] = c1.w1
                      CROSS JOIN vq),
        a AS (SELECT doc_id, count(*) AS n_bigrams, min(p) AS min_prob,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
                  (lm_a, lm_b) -> lm_a + lm_b) AS sum_p
              FROM p GROUP BY doc_id)
        SELECT doc_id, n_bigrams, min_prob,
          sum_p / CAST(n_bigrams AS DOUBLE) AS avg_prob
        FROM a ORDER BY doc_id
      """.trim),
      (spark, dir) => {
        // train-once/serve-many: the model is persisted on first use
        // (q100_lm_train times a fresh build); this entry times the
        // SERVE path — one probe join against the stored model
        val docs = Tables(spark, dir).documents
        val model = graft.Artifacts.cached(s"bigram-lm:$dir") { p =>
          TextCuration.trainBigramLm(docs, "text", p)
        }
        TextCuration.lmScoreIndexed(docs, "doc_id", "text", model)
          .select("doc_id", "n_bigrams", "min_prob", "avg_prob")
      },
    ),
    Q(
      "q100_lm_train",
      "Bigram-LM training pass, timed separately from q80's serve path: " +
        "builds the full add-one model (one partial-agg bigram count + " +
        "vocab-sized context re-agg + 1-row vocab broadcast), persists " +
        "it, and returns the model summary the oracle recomputes — " +
        "distinct bigrams, vocabulary size, total bigram mass, and the " +
        "probability extremes.",
      Some(s"""
        WITH t AS (SELECT doc_id, ${tokensDuck("text")} AS tok FROM documents),
        bg AS (SELECT unnest(${bigramsDuck("tok")}) AS bgr FROM t),
        c2 AS (SELECT bgr, count(*) AS c2 FROM bg GROUP BY bgr),
        c1 AS (SELECT string_split(bgr, ' ')[1] AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
        vq AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(tok) AS w FROM t)),
        m AS (SELECT c2.bgr, c2.c2, c1.c1, vq.v,
                CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + vq.v AS DOUBLE) AS p
              FROM c2 JOIN c1 ON string_split(c2.bgr, ' ')[1] = c1.w1 CROSS JOIN vq)
        SELECT CAST(count(*) AS BIGINT) AS n_model_bigrams,
          CAST(max(v) AS BIGINT) AS vocab_size,
          CAST(sum(c2) AS BIGINT) AS total_bigrams,
          min(p) AS min_p, max(p) AS max_p
        FROM m
      """.trim),
      (spark, dir) => {
        val docs = Tables(spark, dir).documents
        val path = graft.Artifacts.scratch("lmtrain")
        TextCuration.trainBigramLm(docs, "text", path)
        spark.read.parquet(path).agg(
          count(lit(1)).as("n_model_bigrams"),
          max("v").as("vocab_size"),
          sum("c2").as("total_bigrams"),
          min("p").as("min_p"),
          max("p").as("max_p"))
      },
    ),
    Q(
      "q69_embed_quantize",
      "Symmetric int8 embedding quantization: per-vector scale " +
        "(max|x|/127), explicit floor(x/scale + 0.5) rounding, " +
        "reconstruction error via strict left-fold SSE. Narrow map-only " +
        "pass — the compression step of an ANN serving tier.",
      {
        val qDuck = "greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), " +
          "CAST(floor(CAST(qx AS DOUBLE) / scale + 0.5) AS BIGINT)))"
        val errDuck = s"(CAST(qx AS DOUBLE) - $qDuck * scale) * (CAST(qx AS DOUBLE) - $qDuck * scale)"
        Some(s"""
          WITH m AS (SELECT vec_id, embedding,
                       list_max(list_transform(embedding, qm -> abs(CAST(qm AS DOUBLE)))) AS mx
                     FROM embeddings),
          s AS (SELECT vec_id, embedding, mx / 127.0 AS scale FROM m),
          e AS (SELECT vec_id,
                  CAST(len(embedding) AS BIGINT) AS n_dims,
                  scale,
                  CASE WHEN scale = 0.0 THEN 0.0 ELSE
                    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(embedding, qx -> $errDuck)),
                      (qe_a, qe_b) -> qe_a + qe_b))
                  END AS err_l2
                FROM s)
          SELECT vec_id, n_dims, scale, err_l2,
            err_l2 / sqrt(CAST(n_dims AS DOUBLE)) AS rmse
          FROM e ORDER BY vec_id
        """.trim)
      },
      (spark, dir) =>
        VectorSearch.quantizeInt8(Tables(spark, dir).embeddings, "vec_id", "embedding"),
    ),
    Q(
      "q186_weighted_sample",
      "Deterministic weighted sampling without replacement (the " +
        "Efraimidis-Spirakis ticket model with integer coins, no libm): " +
        "each doc holds w tickets (w = 1 + min(7, len/500) — a " +
        "quality-weight stand-in), ticket i hashes (id, i, salt), the " +
        "doc's priority is its best ticket, sample = top-60 by " +
        "(priority, id). Map-only priorities (generated sequence + " +
        "array_max, no explode), top-n via per-partition heaps. " +
        "Doubling a doc's weight doubles its tickets — selection " +
        "pressure scales with weight, reproducibly on any engine.",
      Some(s"""
        WITH w AS (SELECT doc_id, 1 + least(7, length(text) // 500) AS w FROM documents),
        p AS (SELECT doc_id, w,
                list_aggregate(list_transform(range(1, w + 1),
                  ws_i -> ${polyDuck("CAST(doc_id AS VARCHAR) || ':' || CAST(ws_i AS VARCHAR) || ':ws1'")}),
                  'max') AS priority
              FROM w)
        SELECT doc_id, w, priority,
          CAST(row_number() OVER (ORDER BY priority DESC, doc_id) AS BIGINT) AS rk
        FROM p ORDER BY priority DESC, doc_id LIMIT 60
      """.trim),
      (spark, dir) => {
        val weighted = Tables(spark, dir).documents
          .selectExpr("doc_id", "CAST(1 + least(7, length(text) div 500) AS BIGINT) AS w")
        TextCuration.weightedSample(weighted, "doc_id", "w", n = 60, salt = "ws1")
      },
    ),
  )
}
