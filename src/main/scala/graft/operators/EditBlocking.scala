package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Segment-based blocking for bounded edit-distance joins — the
  * scale-safe alternative to attribute blocking (q59's brand block),
  * after the partition-based method of Li/Deng/Feng, "PASS-JOIN"
  * (PVLDB 2011, public literature).
  *
  * Pigeonhole guarantee: split every string into `k + 1` segments; an
  * optimal alignment of a pair within edit distance `k` has at most `k`
  * edit operations, so at least one segment is copied verbatim into the
  * partner, shifted by at most `k` positions. Candidates therefore come
  * from an EQUI-join on (partner length, segment index, segment
  * content) — one shuffle, no all-pairs product, work proportional to
  * sum of bucket sizes squared with buckets far smaller than any
  * attribute block. Recall is exactly 100%: the result is provably
  * identical to the naive quadratic join, which is why the q62 catalog
  * entry can share q59's plain declarative oracle SQL.
  *
  * Complexity per probe row: O(k^2) emitted substrings (partner lengths
  * in [l-k, l+k], k+1 segments, start window +-k) — a fixed constant,
  * against block sizes that stay bounded as data grows.
  */
/** Codegen contract: these row types are TOP-LEVEL, not nested in the
  * object — a nested case class compiles to `EditBlocking$IndexKey`, and
  * Janino fails to resolve methods on `$`-named classes, silently
  * dropping the whole-stage-codegen'd flatMap stages to the interpreted
  * path (logged ERROR, ~2x slower). Qualified-private keeps them out of
  * the public API while emitting public classfiles.
  */
private[operators] final case class EditIndexKey(id: Long, str: String, blockKey: String, l: Int, seg: Int, content: String)
private[operators] final case class EditProbeKey(id: Long, str: String, blockKey: String, l2: Int, seg: Int, content: String)

object EditBlocking {

  /** Sorted-neighborhood candidate pairs (Hernández/Stolfo SIGMOD'95,
    * public literature): rank the corpus in `(keyCol, idCol)` total
    * order and emit every pair within `w` positions — the third
    * classic ER blocking scheme next to [[editPairs]]'s pigeonhole
    * segments and q59's attribute×length-band block. Unlike those two,
    * SNM is inherently LOSSY blocking: a true pair whose sort keys
    * land more than `w` apart is missed (the standard multi-pass
    * answer: union passes over different keys). The contract here is
    * exactly "pairs within the window", which is what the oracle
    * recomputes.
    *
    * Scale shape: the global rank is [[GlobalOrder.rankByPrefix]]'s
    * two-pass prefix-bucket layout (no single-partition window, no
    * sampling); pair generation explodes each row into its `w`
    * successor positions and equi-joins on the position — one shuffle
    * on a dense LONG key, `w·n` candidate rows by construction.
    * Returns (id_a, id_b, key_a, key_b, pos_a, pos_b) with
    * pos_a < pos_b <= pos_a + w; verification (edit distance, jaccard)
    * is the caller's.
    */
  def sortedNeighborPairs(df: DataFrame, idCol: String, keyCol: String, w: Int,
                          bucketChars: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1: $w")
    val ranked = GlobalOrder.rankByPrefix(
        df.select(col(idCol), col(keyCol)), keyCol, idCol, bucketChars, "pos")
    val a = ranked.select(col(idCol).as("id_a"), col(keyCol).as("key_a"), col("pos").as("pos_a"))
      .withColumn("__probe", explode(array((1 to w).map(i => col("pos_a") + i): _*)))
    val b = ranked.select(col(idCol).as("id_b"), col(keyCol).as("key_b"), col("pos").as("pos_b"))
    a.join(b, col("__probe") === col("pos_b"))
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"), col("pos_a"), col("pos_b"))
  }

  /** Deterministic segment scheme for a string of length `l` with
    * threshold `k`: `k + 1` segments, first `k + 1 - (l mod (k+1))`
    * of length `l / (k+1)`, the rest one longer (even split, fixed
    * order — both join sides must agree on the scheme).
    */
  def segmentScheme(l: Int, k: Int): Array[(Int, Int)] = {
    val n = k + 1
    val base = l / n
    val longFrom = n - l % n
    val out = new Array[(Int, Int)](n)
    var start = 0
    var i = 0
    while (i < n) {
      val len = if (i >= longFrom) base + 1 else base
      out(i) = (start, len)
      start += len
      i += 1
    }
    out
  }

  /** Candidate-verified edit-distance self-join: all pairs (id_a < id_b)
    * with identical `blockCol` and edit distance <= k, exactly — segment
    * blocking generates candidates, thresholded Levenshtein verifies.
    * `blockCol` is an additional exact-match attribute (pass a constant
    * column for unblocked joins).
    */
  def editPairs(df: DataFrame, idCol: String, strCol: String, blockCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // drop rows with a null id/string/block BEFORE the flatMaps: the
    // segment emitters dereference s.length/block, so one null row would
    // NPE the job — whereas the equivalent naive join silently drops such
    // rows via null-propagating equality/levenshtein. Match that.
    val rows = df.select(col(idCol).cast("long"), col(strCol).cast("string"), col(blockCol).cast("string"))
      .filter(col(idCol).isNotNull && col(strCol).isNotNull && col(blockCol).isNotNull)
      .as[(Long, String, String)]

    // index side: each string's own segments under its own scheme
    val index: Dataset[EditIndexKey] = rows.flatMap { case (id, s, blk) =>
      val l = s.length
      segmentScheme(l, k).iterator.zipWithIndex.map { case ((st, len), i) =>
        EditIndexKey(id, s, blk, l, i, s.substring(st, st + len))
      }
    }
    // probe side: for every partner length within +-k, every segment of
    // THAT length's scheme, every +-k start shift that fits — the
    // verbatim-copied segment of any true partner is among these
    val probe: Dataset[EditProbeKey] = rows.flatMap { case (id, s, blk) =>
      val ls = s.length
      // identical (l2, seg, content) keys join identically — emit once
      val seen = scala.collection.mutable.HashSet.empty[(Int, Int, String)]
      for {
        l2 <- math.max(0, ls - k) to (ls + k)
        ((st2, len2), i) <- segmentScheme(l2, k).zipWithIndex
        st <- math.max(0, st2 - k) to math.min(ls - len2, st2 + k)
        sub = s.substring(st, st + len2)
        if seen.add((l2, i, sub))
      } yield EditProbeKey(id, s, blk, l2, i, sub)
    }

    val cand = index.toDF("id_a", "str_a", "blk", "l", "seg", "content")
      .join(probe.toDF("id_b", "str_b", "blk", "l2", "seg", "content"),
        Seq("blk", "seg", "content"))
      .filter(col("l") === col("l2") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "blk", "str_a", "str_b")
      // a pair can share several segments; verify each pair once
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("edit_dist", levenshtein(col("str_a"), col("str_b"), k).cast("long"))
      .filter(col("edit_dist") >= 0)
      .select(col("id_a"), col("id_b"), col("blk"), col("edit_dist"))
  }
}
