package graft

import graft.api.{TextCuration, VectorSearch}
import org.apache.spark.sql.functions._

/** The public API must work on ANY frame shape — not just the TESTDATA
  * `documents`/`embeddings` schemas the catalog queries use (those
  * already oracle-gate the semantics; these specs pin the genericity).
  */
class ApiSpecs extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (11L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup
    (12L, "the quick brown fox jumps over the lazy dog and walks away fast"), // near dup
    (13L, "completely different content about spark shuffles and joins here"),
  ).toDF("post_id", "body")

  test("exactDedup on a (post_id, body) frame finds the exact pair") {
    val out = TextCuration.exactDedup(corpus, "post_id", "body")
      .orderBy("canonical_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((10L, 2L), (12L, 1L), (13L, 1L)))
  }

  test("jaccardNearDups on custom columns finds the near pair and not the unrelated doc") {
    val pairs = TextCuration.jaccardNearDups(corpus, "post_id", "body", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L))) // exact dup is also a near dup
    assert(!pairs.exists { case (a, b) => a == 13L || b == 13L })
  }

  test("curate keeps one canonical of the dup cluster and the distinct doc") {
    val kept = TextCuration.curate(corpus, "post_id", "body",
      jaccardThreshold = 0.5, qualityFloor = 0.0, langs = Seq("en", "und"))
      .select("post_id").collect().map(_.getLong(0)).sorted.toSeq
    // 11 (exact dup) and 12 (near dup of 10) fall; 10 and 13 survive
    assert(kept === Seq(10L, 13L))
  }

  test("knn on a (vid, vec) frame returns k ranked neighbors excluding self") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)),
    ).toDF("vid", "vec")
    val out = VectorSearch.knn(vecs, vecs.filter($"vid" === 1L), "vid", "vec", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vid")).toSeq === Seq(2L, 3L)) // nearest then orthogonal
    assert(out.forall(_.getAs[Long]("q_id") == 1L))
  }
}
