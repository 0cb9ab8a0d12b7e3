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
  )
}
