package graft.queries

import graft.Tables
import graft.operators.VectorKit._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>`, dim 64):
  * brute-force cosine top-k as the exact baseline, an IVF-style
  * probed search and a sign-LSH bucketed search as the scale paths, and a
  * cosine-threshold near-duplicate join.
  *
  * All cosines flow through [[graft.operators.VectorKit]]'s left-fold
  * dot product, so results are bit-exact vs the DuckDB oracle — every
  * query here is hash-matched, including the ANN paths.
  */
object Similarity {

  private val duckNorm =
    s"SELECT vec_id, label, embedding, sqrt(${dotDuck("embedding", "embedding")}) AS nrm FROM embeddings"

  val qs: Seq[Q] = Seq(
    Q(
      "q31_knn_brute",
      "Brute-force cosine top-k (k=5) for 10 query vectors: broadcast the " +
        "query set, stream the corpus once, per-query heap via ranking window. " +
        "The exact-recall baseline every ANN variant is judged against.",
      Some(s"""
        WITH n AS ($duckNorm),
        q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        s AS (SELECT q_id, vec_id, ${dotDuck("qv", "embedding")} / (qn * nrm) AS cosine
              FROM q JOIN n ON vec_id <> q_id),
        r AS (SELECT q_id, vec_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
              FROM s)
        SELECT q_id, rank, vec_id, cosine FROM r WHERE rank <= 5 ORDER BY q_id, rank
      """.trim),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        graft.api.VectorSearch.knn(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      },
    ),
    Q(
      "q32_ann_ivf",
      "IVF-style probed search: coarse quantizer = one representative per " +
        "label partition (deterministic medoid: min vec_id), probe the top-2 " +
        "partitions per query, exact-search only those partitions. The " +
        "classic inverted-file ANN layout: per-query work bounded by nprobe " +
        "partitions, corpus partition-pruned on the cluster key.",
      Some(s"""
        WITH n AS ($duckNorm),
        rid AS (SELECT label, min(vec_id) AS rep_id FROM embeddings GROUP BY label),
        rep AS (SELECT r.label, n.embedding AS rv, n.nrm AS rn FROM rid r JOIN n ON n.vec_id = r.rep_id),
        q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        pr AS (SELECT q_id, qv, qn, label,
                 CAST(row_number() OVER (PARTITION BY q_id ORDER BY ${dotDuck("qv", "rv")} / (qn * rn) DESC, label) AS BIGINT) AS prank
               FROM q CROSS JOIN rep),
        probe AS (SELECT q_id, qv, qn, label FROM pr WHERE prank <= 2),
        s AS (SELECT p.q_id, n.vec_id, ${dotDuck("p.qv", "n.embedding")} / (p.qn * n.nrm) AS cosine
              FROM probe p JOIN n ON n.label = p.label AND n.vec_id <> p.q_id),
        r AS (SELECT q_id, vec_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
              FROM s)
        SELECT q_id, rank, vec_id, cosine FROM r WHERE rank <= 5 ORDER BY q_id, rank
      """.trim),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        graft.api.VectorSearch.annIvf(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", nprobe = 2, k = 5)
      },
    ),
    Q(
      "q33_embedding_neardup",
      "Embedding-cosine near-duplicate pairs (cos >= 0.45). Exact " +
        "threshold join — correct-recall baseline for q34's LSH prefilter; " +
        "at 100 TB the LSH bucketing replaces this quadratic candidate set.",
      Some(s"""
        WITH n AS ($duckNorm)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45
        ORDER BY vec_a, vec_b
      """.trim),
      (spark, dir) => {
        graft.api.VectorSearch.cosineNearDups(Tables(spark, dir).embeddings, "vec_id", "embedding", 0.45)
          .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cosine"))
      },
    ),
    Q(
      "q34_ann_lsh",
      s"Sign-LSH bucketed similarity: $LshPlanes deterministic hyperplanes " +
        "-> 16 buckets; candidate pairs only within a bucket (one shuffle on " +
        "bucket id), exact cosine on candidates, kept at cos >= 0.4. The " +
        "LSH-bucketed scale path for near-dup detection.",
      Some(s"""
        WITH n AS ($duckNorm),
        bk AS (SELECT vec_id, embedding, nrm, ${bucketDuck("embedding")} AS bucket FROM n)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
          ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
        ORDER BY vec_a, vec_b
      """.trim),
      (spark, dir) => {
        graft.api.VectorSearch.lshNearDups(Tables(spark, dir).embeddings, "vec_id", "embedding", 0.4)
          .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("bucket"), col("cosine"))
      },
    ),
    Q(
      "q103_kcenter",
      "Greedy k-center clustering (Gonzalez farthest-first, k=4 from " +
        "vec_id 0): the deterministic, EXACT-arithmetic diversity selector " +
        "— centers are data vectors, never averaged floats, so unlike " +
        "k-means every distance is a bit-exact left-fold dot product. " +
        "Selection = k scans, each ending in a 1-row per-partition-heap " +
        "top-1; assignment is MAP-ONLY (literal centers folded with " +
        "greatest over (cosine, -rank) structs — no join, no shuffle).",
      Some(kcenterOracleSql(k = 4)),
      (spark, dir) =>
        graft.api.VectorSearch.kcenterAssign(Tables(spark, dir).embeddings,
          "vec_id", "embedding", k = 4, startId = 0L),
    ),
    Q(
      "q106_rrf_hybrid",
      "Hybrid retrieval: BM25 lexical top-50 (q104's scorer) fused with " +
        "cosine vector top-50 (q31's knn, query = vec 0) by reciprocal-rank " +
        "fusion, 1/(60+rank) each side (Cormack et al., SIGIR'09). Both " +
        "input lists are rank-bounded, so the fusion join and final top-20 " +
        "never touch the corpus.",
      Some({
        import graft.operators.{SearchKit, TextKit}
        s"""
        WITH ${SearchKit.bm25DuckCtes(TextKit.tokensDuck("text"), Seq("vector", "hash", "join"), 1.2, 0.75)},
        trank AS (SELECT doc_id, rank AS text_rank FROM brank WHERE rank <= 50),
        n AS ($duckNorm),
        q AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0),
        vs AS (SELECT p.vec_id, ${dotDuck("p.embedding", "q.qv")} / (p.nrm * q.qn) AS cosine
               FROM n p CROSS JOIN q WHERE p.vec_id <> 0),
        vr AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS vec_rank FROM vs),
        vrank AS (SELECT vec_id, vec_rank FROM vr WHERE vec_rank <= 50),
        fused AS (SELECT coalesce(t.doc_id, v.vec_id) AS doc_id, t.text_rank, v.vec_rank,
                    ${SearchKit.rrfTerm("t.text_rank", 60.0)} + ${SearchKit.rrfTerm("v.vec_rank", 60.0)} AS rrf_score
                  FROM trank t FULL OUTER JOIN vrank v ON t.doc_id = v.vec_id),
        fr AS (SELECT doc_id, rrf_score, text_rank, vec_rank,
                 CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
               FROM fused)
        SELECT doc_id, rrf_score, text_rank, vec_rank, rank FROM fr WHERE rank <= 20 ORDER BY rank
      """.trim
      }),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val text = graft.api.Retrieval.bm25Rank(t.documents, "doc_id", "text",
          Seq("vector", "hash", "join"), topK = 50)
        val vec = graft.api.VectorSearch.knn(t.embeddings,
          t.embeddings.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        graft.api.Retrieval.rrfFuse(
            text, "doc_id", "rank", vec.select(col("vec_id"), col("rank")), "vec_id", "rank",
            k0 = 60.0, topK = 20)
          .select(col("id").as("doc_id"), col("rrf_score"),
            col("rank_a").as("text_rank"), col("rank_b").as("vec_rank"), col("rank"))
      },
    ),
    Q(
      "q124_semdedup",
      "SemDeDup-style semantic deduplication (Abbas et al. 2023): " +
        "k-center-cluster the embeddings (k=8, exact arithmetic), then " +
        "drop any vector with a lower-id near-twin (cos >= 0.4) IN THE " +
        "SAME CLUSTER. Clustering bounds candidates to sum(cluster^2) " +
        "instead of corpus^2 — the method's entire point at web scale; " +
        "assignment is map-only, the pair probe is one shuffle on " +
        "center_id. Selection, assignment, pairs, and keep flags are " +
        "all bit-exact, so the END-TO-END pipeline is hash-gated.",
      Some(semDedupOracleSql(k = 8, tau = "0.4")),
      (spark, dir) =>
        graft.api.VectorSearch.semDedup(Tables(spark, dir).embeddings,
          "vec_id", "embedding", k = 8, startId = 0L, minCosine = 0.4),
    ),
    Q(
      "q184_pq_adc",
      "Product-quantization ANN with asymmetric distance (Jégou et al. " +
        "2011): 64-dim vectors encode to 8 subspace codes against a " +
        "deterministic 4-seed codebook (32x compression — the memory " +
        "arithmetic that serves billion-vector ANN from RAM); queries " +
        "score corpus rows as the sum of exact subspace L2² to the " +
        "CODED centroids, never the original vectors. Encode is one " +
        "map-only pass over a broadcast codebook row; serve streams " +
        "the corpus once per broadcast query set. Codes, distances and " +
        "the final ranking are all index-order-fold exact, so the " +
        "whole approximate pipeline is hash-gated like q32/q34.",
      Some(pqOracleSql(dim = 64, m = 8, k = 4, nQueries = 10, topK = 5)),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        graft.api.VectorSearch.pqAdcSearch(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", dim = 64, m = 8, k = 4, topK = 5)
      },
    ),
    Q(
      "q188_ivfpq",
      "IVF + PQ composed (IVFADC, Jégou et al. 2011 §IV — the " +
        "billion-vector FAISS serving layout): the inverted file bounds " +
        "WHICH rows a query scores (nprobe=2 coarse label partitions, " +
        "min-id medoid reps), PQ bounds WHAT each scored row reads (8 " +
        "codes of its RESIDUAL to the coarse rep — residual encoding is " +
        "what separates IVFADC from q184's flat PQ: the bits encode the " +
        "within-partition offset once the coarse id is known). Reps and " +
        "codebook broadcast; residual+encode are ONE corpus map pass; " +
        "the probe list equi-joins on the partition key (partition-" +
        "pruned on a clustered layout), so per-query work is nprobe " +
        "partitions of m-byte codes. Every distance is the exact index-" +
        "order fold, so the COMPOSED pipeline is hash-gated end to end.",
      Some(ivfPqOracleSql(dim = 64, m = 8, k = 4, nprobe = 2, nQueries = 10, topK = 5)),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        graft.api.VectorSearch.ivfPqSearch(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", dim = 64, m = 8, k = 4, nprobe = 2, topK = 5)
      },
    ),
    Q(
      "q197_ann_route",
      "The closed measure→route loop for similarity search " +
        "(VectorSearch.annRoute — q162's autoplan discipline applied " +
        "to the ANN family): one bounded O(metadata) corpus probe " +
        "decides brute (small corpus: the exact answer IS the cheap " +
        "answer) vs IVF probed (cluster column present) vs " +
        "IVF-with-trained-quantizer (no cluster column) — the RIGHT " +
        "serving layout chosen by data, not by the query author; all " +
        "branches share one output shape. Here the probe finds the " +
        "corpus under the brute threshold and routes there, so the " +
        "entry shares q31's exact oracle; ApiSpecs pins that the " +
        "IVF branches engage (and stay recall-correct) above it.",
      Some(s"""
        WITH n AS ($duckNorm),
        q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        s AS (SELECT q_id, vec_id, ${dotDuck("qv", "embedding")} / (qn * nrm) AS cosine
              FROM q JOIN n ON vec_id <> q_id),
        r AS (SELECT q_id, vec_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
              FROM s)
        SELECT q_id, rank, vec_id, cosine FROM r WHERE rank <= 5 ORDER BY q_id, rank
      """.trim),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        graft.api.VectorSearch.annRoute(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, partCol = Some("label"))._1
      },
    ),
    Q(
      "q198_ann_route_indexed",
      "The measure→route loop SERVING FROM A PERSISTED INDEX (the " +
        "branch a real 100 TB deployment runs): annRoute finds the " +
        "corpus above the brute threshold and a built buildIvfIndex " +
        "artifact whose pinned schema matches — so it serves via " +
        "annIvfIndexed with ZERO training, ZERO corpus labeling and a " +
        "static cluster IN (...) partition filter (only probed " +
        "cluster=N dirs are listed), instead of re-training the coarse " +
        "quantizer per call. Probing ALL nClusters here makes indexed " +
        "serving exactly equal to the brute answer, so the whole " +
        "routed path is hash-gated against q31's exact oracle; " +
        "ApiSpecs pins the selective-probe recall, the decision " +
        "string, and the fall-through on a torn/drifted index.",
      Some(s"""
        WITH n AS ($duckNorm),
        q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        s AS (SELECT q_id, vec_id, ${dotDuck("qv", "embedding")} / (qn * nrm) AS cosine
              FROM q JOIN n ON vec_id <> q_id),
        r AS (SELECT q_id, vec_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
              FROM s)
        SELECT q_id, rank, vec_id, cosine FROM r WHERE rank <= 5 ORDER BY q_id, rank
      """.trim),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        val ix = graft.Artifacts.cached(s"ivf-route-index:$dir") { p =>
          graft.api.VectorSearch.buildIvfIndex(emb, "vec_id", "embedding", p, nClusters = 4)
        }
        val (res, decision) = graft.api.VectorSearch.annRoute(
          emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
          nprobe = 4, bruteMaxRows = 10L, indexPath = Some(ix))
        assert(decision == "ivf-indexed", s"route must serve from the index, got $decision")
        res
      },
    ),
    Q(
      "q208_lsh_auto",
      "Sign-LSH near-dups with the plane count DERIVED FROM THE CORPUS " +
        "(VectorSearch.lshNearDupsAuto — the sf1 slope run's lever " +
        "delivered as the serving path): one bounded count probe picks " +
        "planes = ceil(log2(n / targetBucketRows)), so expected bucket " +
        "occupancy stays at the target and candidate volume scales " +
        "LINEARLY with the corpus, where q34's fixed 16-bucket config " +
        "grows pairs quadratically. At oracle scales the derived count " +
        "coincides with the pinned 4-plane config (asserted — the " +
        "q197/q198 decision-pin discipline), so the routed path shares " +
        "q34's oracle verbatim; ApiSpecs pins the scaling behavior " +
        "above the target (planes grow, candidates shrink >4x at 10x " +
        "corpus, extra planes only ever REMOVE candidate pairs).",
      Some(s"""
        WITH n AS ($duckNorm),
        bk AS (SELECT vec_id, embedding, nrm, ${bucketDuck("embedding")} AS bucket FROM n)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
          ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
        ORDER BY vec_a, vec_b
      """.trim),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        val (pairs, planes) = graft.api.VectorSearch.lshNearDupsAuto(
          emb, "vec_id", "embedding", 0.4)
        // decision pin: the derived count must follow the occupancy
        // formula for THIS corpus — at oracle scale that is exactly the
        // pinned 4-plane config (so the routed path shares q34's oracle
        // verbatim); at slope-run scales it grows with the corpus,
        // which is the point
        val n = emb.count()
        var expected = graft.operators.VectorKit.LshPlanes
        while (expected < 16 && (n >> expected) > 250L) expected += 1
        assert(planes == expected,
          s"derived plane count must follow the occupancy probe: got $planes, want $expected")
        pairs.select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
          col("bucket"), col("cosine"))
      },
    ),
    Q(
      "q193_hard_negatives",
      "Hard-negative mining for contrastive training (the ANCE/DPR " +
        "data-prep step): for each of 10 anchors, the top-5 most-" +
        "similar embeddings with a DIFFERENT label — maximally " +
        "confusing non-matches, the negatives that actually move a " +
        "contrastive loss. Same scale shape as q31 (broadcast anchors, " +
        "one corpus stream, per-anchor ranking window) with the label " +
        "inequality riding the join condition so mismatches drop " +
        "before the window. Exact left-fold cosines: hash-gated.",
      Some(s"""
        WITH n AS ($duckNorm),
        q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS qv, nrm AS qn
              FROM n WHERE vec_id < 10),
        s AS (SELECT q.q_id, q.q_label, p.vec_id, p.label AS neg_label,
                ${dotDuck("q.qv", "p.embedding")} / (q.qn * p.nrm) AS cosine
              FROM q JOIN n p ON p.vec_id <> q.q_id AND p.label <> q.q_label),
        r AS (SELECT q_id, q_label, vec_id, neg_label, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
              FROM s)
        SELECT q_id, q_label, rank, vec_id, neg_label, cosine
        FROM r WHERE rank <= 5 ORDER BY q_id, rank
      """.trim),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        graft.api.VectorSearch.hardNegatives(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", k = 5)
      },
    ),
    Q(
      "q224_cosine_auto",
      "Exact-cosine near-dups with the candidate volume BOUNDED BY A " +
        "CORPUS-PROBED budget (VectorSearch.cosineNearDupsAuto — q33's " +
        "budget-bounded member, the embedding-space twin of q26/q160's " +
        "jaccard df cap): below the budget the exact n² join runs " +
        "verbatim (the oracle-gate regime — provable no-op, this " +
        "oracle is q33's verbatim); above it, multi-band sign-LSH " +
        "amplification generates ~budget*n candidates (measured by an " +
        "eager occupancy audit, planes grow until the TRUE volume " +
        "fits) and exact left-fold cosine verifies each, so precision " +
        "is 1 and reported cosines are bit-identical to q33's for " +
        "every surviving pair — the recall trade buys the linear sf1 " +
        "slope q33's O(n²)-by-contract baseline cannot have.",
      Some(s"""
        WITH n AS ($duckNorm)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45
        ORDER BY vec_a, vec_b
      """.trim),
      (spark, dir) => {
        val emb = Tables(spark, dir).embeddings
        val (pairs, decision) = graft.api.VectorSearch.cosineNearDupsAuto(
          emb, "vec_id", "embedding", 0.45)
        // decision pin: the regime must follow the probe formula for
        // THIS corpus — exact (= q33 verbatim, oracle-comparable) iff
        // the full quadratic volume fits the budget, LSH-blocked above
        // (the q208 decision-pin discipline)
        val n = emb.count()
        val expectExact = n <= 2L * 500L + 1L
        assert(decision.startsWith(if (expectExact) "exact(" else "lsh("),
          s"regime must follow the volume probe: n=$n got $decision")
        pairs.select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cosine"))
      },
    ),
  )

  /** q188's oracle: the q32 rep chain (min-id medoid per label), the
    * residual transform as an explicit per-index list_transform, q184's
    * argmin-code/ADC generators over RESIDUALS, probe ranked by exact
    * full-vector L2. Generated so (dim, m, k, nprobe) change in one
    * place; seeds assume the dense 0-based vec_id TESTDATA layout
    * (same assumption as q184's `vec_id = c` scalar subqueries).
    */
  private def ivfPqOracleSql(dim: Int, m: Int, k: Int, nprobe: Int,
                             nQueries: Int, topK: Int): String = {
    val sub = dim / m
    def res(v: String, r: String) =
      s"list_transform(range(1, ${dim + 1}), ri -> CAST($v[ri] AS DOUBLE) - CAST($r[ri] AS DOUBLE))"
    val seedCols = (0 until k).map(c =>
      s"(SELECT res FROM cres WHERE vec_id = $c) AS s$c").mkString(",\n  ")
    val codes = (0 until m).map { j =>
      val ds = (0 until k).map(c => l2SubDuck("c.res", s"s$c", j * sub, sub)).mkString(", ")
      s"CAST(list_position([$ds], list_aggregate([$ds], 'min')) - 1 AS INT)"
    }.mkString(",\n    ")
    val adc = (0 until m).map { j =>
      val cases = (0 until k)
        .map(c => s"WHEN $c THEN ${l2SubDuck("p.qres", s"s$c", j * sub, sub)}").mkString(" ")
      s"(CASE c.codes[${j + 1}] $cases END)"
    }.mkString("\n      + ")
    s"""
      WITH rid AS (SELECT label, min(vec_id) AS rep_id FROM embeddings GROUP BY label),
      rep AS (SELECT r.label, e.embedding AS rv FROM rid r JOIN embeddings e ON e.vec_id = r.rep_id),
      cres AS (SELECT e.label, e.vec_id, ${res("e.embedding", "r.rv")} AS res
               FROM embeddings e JOIN rep r ON e.label = r.label),
      sw AS (SELECT
        $seedCols),
      enc AS (SELECT c.label, c.vec_id, [
        $codes] AS codes
        FROM cres c CROSS JOIN sw),
      q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
      pr0 AS (SELECT q.q_id, r.label, q.qv, r.rv,
                ${l2SubDuck("q.qv", "r.rv", 0, dim)} AS pdist
              FROM q CROSS JOIN rep r),
      pr AS (SELECT q_id, label, qv, rv,
               row_number() OVER (PARTITION BY q_id ORDER BY pdist, label) AS prank
             FROM pr0),
      probe AS (SELECT q_id, label, ${res("qv", "rv")} AS qres FROM pr WHERE prank <= $nprobe),
      s AS (SELECT p.q_id, c.vec_id,
        $adc AS adc
        FROM enc c JOIN probe p ON c.label = p.label CROSS JOIN sw
        WHERE c.vec_id <> p.q_id),
      r AS (SELECT q_id, vec_id, adc,
              CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS BIGINT) AS rank
            FROM s)
      SELECT q_id, rank, vec_id, adc FROM r WHERE rank <= $topK ORDER BY q_id, rank
    """.trim
  }

  /** q184's oracle: seed codebook via scalar subqueries, per-subspace
    * argmin codes (list_position of min — first index on ties, the
    * same smallest-code tie-break as array_position), ADC sum via
    * CASE over the committed code. Generated so (dim, m, k) change in
    * one place; every distance is the identical index-order fold as
    * the engine's l2SubSpark.
    */
  private def pqOracleSql(dim: Int, m: Int, k: Int, nQueries: Int, topK: Int): String = {
    val sub = dim / m
    val seedCols = (0 until k).map(c =>
      s"(SELECT embedding FROM embeddings WHERE vec_id = $c) AS s$c").mkString(",\n  ")
    val codes = (0 until m).map { j =>
      val ds = (0 until k).map(c => l2SubDuck("e.embedding", s"s$c", j * sub, sub)).mkString(", ")
      s"CAST(list_position([$ds], list_aggregate([$ds], 'min')) - 1 AS INT)"
    }.mkString(",\n    ")
    val adc = (0 until m).map { j =>
      val cases = (0 until k)
        .map(c => s"WHEN $c THEN ${l2SubDuck("q.qv", s"s$c", j * sub, sub)}").mkString(" ")
      s"(CASE c.codes[${j + 1}] $cases END)"
    }.mkString("\n      + ")
    s"""
      WITH sw AS (SELECT
        $seedCols),
      enc AS (SELECT e.vec_id, [
        $codes] AS codes
        FROM embeddings e CROSS JOIN sw),
      q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
      s AS (SELECT q.q_id, c.vec_id,
        $adc AS adc
        FROM enc c CROSS JOIN q CROSS JOIN sw WHERE c.vec_id <> q.q_id),
      r AS (SELECT q_id, vec_id, adc,
              CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS BIGINT) AS rank
            FROM s)
      SELECT q_id, rank, vec_id, adc FROM r WHERE rank <= $topK ORDER BY q_id, rank
    """.trim
  }

  /** q124's oracle: the q103 kcenter chain (k=8) as a subquery, the
    * same within-cluster pair probe, and NOT IN for the keep flag.
    */
  private def semDedupOracleSql(k: Int, tau: String): String =
    s"""
      WITH asn AS (SELECT vec_id, center_id FROM (${kcenterOracleSql(k)})),
      n AS ($duckNorm),
      dup AS (SELECT DISTINCT b.vec_id AS dup_id
              FROM asn a JOIN asn b ON a.center_id = b.center_id AND a.vec_id < b.vec_id
              JOIN n na ON na.vec_id = a.vec_id
              JOIN n nb ON nb.vec_id = b.vec_id
              WHERE ${dotDuck("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) >= $tau)
      SELECT s.vec_id, s.center_id,
        s.vec_id NOT IN (SELECT dup_id FROM dup) AS keep
      FROM asn s ORDER BY s.vec_id
    """.trim

  /** q103's oracle: the same farthest-first chain as the engine, as
    * k-1 chained CTEs (each c_i a 1-row ORDER BY s, vec_id LIMIT 1;
    * each d_i folds the new center in with greatest) plus one
    * assignment ranking. Generated, so k changes in one place.
    */
  private def kcenterOracleSql(k: Int): String = {
    require(k >= 2, s"oracle chain needs k >= 2: $k")
    def cos(p: String, c: String) = s"${dotDuck(s"$p.embedding", s"$c.embedding")} / ($p.nrm * $c.nrm)"
    val sb = new StringBuilder
    sb ++= s"WITH n AS ($duckNorm),\n"
    sb ++= "c1 AS (SELECT vec_id, embedding, nrm FROM n WHERE vec_id = 0),\n"
    sb ++= s"d1 AS (SELECT p.vec_id, p.embedding, p.nrm, ${cos("p", "c")} AS s" +
      " FROM n p CROSS JOIN c1 c WHERE p.vec_id <> c.vec_id),\n"
    for (i <- 2 to k) {
      sb ++= s"c$i AS (SELECT vec_id, embedding, nrm FROM d${i - 1} ORDER BY s ASC, vec_id LIMIT 1),\n"
      if (i < k)
        sb ++= s"d$i AS (SELECT p.vec_id, p.embedding, p.nrm, greatest(p.s, ${cos("p", "c")}) AS s" +
          s" FROM d${i - 1} p CROSS JOIN c$i c WHERE p.vec_id <> c.vec_id),\n"
    }
    sb ++= (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS center_rank, vec_id, embedding, nrm FROM c$i")
      .mkString("cen AS (", " UNION ALL ", "),\n")
    sb ++= s"asn AS (SELECT p.vec_id, c.vec_id AS center_id, ${cos("p", "c")} AS cosine,\n" +
      s"  row_number() OVER (PARTITION BY p.vec_id ORDER BY ${cos("p", "c")} DESC, c.center_rank) AS rn\n" +
      "  FROM n p CROSS JOIN cen c)\n"
    sb ++= "SELECT vec_id, center_id, cosine FROM asn WHERE rn = 1"
    sb.toString
  }
}
