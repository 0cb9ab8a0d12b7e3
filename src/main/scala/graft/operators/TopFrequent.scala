package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed top-k frequent items from TRUNCATED per-shard summaries
  * with deterministic error bounds — the candidate-then-verify layout
  * (TPUT / SpaceSaving-merge family: Metwally et al. 2005, Cao &
  * Wang 2004) that finds heavy hitters at 100 TB without ever
  * shuffling the full key space to one place.
  *
  * Per shard (a date, an hour, an ingest partition — any existing
  * grouping): the EXACT per-key counts within the shard, truncated to
  * the top `c` by (count desc, key) — plus `eps` = the largest count
  * the truncation dropped. A key absent from a shard's summary has a
  * count of at most `eps` there, which gives, after a union of the
  * tiny summaries:
  *
  *   lb(key) = Σ kept counts    (shards that reported the key)
  *   ub(key) = lb(key) + Σ eps over shards that did NOT report it
  *
  * Completeness guarantee: a key absent from EVERY shard summary has
  * true total ≤ Σ eps over all shards, so any key whose true total
  * exceeds that Σ eps is guaranteed to be a candidate — the reported
  * top-k is provably complete whenever the k-th reported exact count
  * clears Σ eps (compare `n` at rank k against `ub - lb` of an
  * absent-everywhere key, which is exactly Σ eps). When it doesn't
  * clear, grow `c` (or shard coarser) — the classic TPUT refinement
  * knob. Verifying candidates is one semi-join-bounded exact count —
  * |candidates| ≤ shards × c, metadata-sized — which closes the gap
  * between lb and ub with exact numbers.
  *
  * Determinism: per-shard counts are exact, truncation ties break on
  * the key, eps is a max — every step reproduces bit-identically on
  * any engine or partitioning, unlike stream-order-dependent
  * Misra-Gries. Scale shape: one (shard, key) partial-agg shuffle,
  * per-shard windows over shard-local rows, a summary union that is
  * shards × c rows, and a broadcast semi join for the verify pass.
  * The full table never moves.
  */
object TopFrequent {

  /** Per-shard truncated summaries: (shardCol, keyCol, cnt) for the
    * kept keys, plus the per-shard `eps` on every row (0 when nothing
    * was dropped). `c` is the summary capacity per shard.
    */
  def shardSummaries(df: DataFrame, shardCol: String, keyCol: String, c: Int): DataFrame = {
    require(c >= 1, s"summary capacity must be >= 1: $c")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(shardCol), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(shardCol).orderBy(col("cnt").desc, col(keyCol))
    val ranked = counts.withColumn("__rk", row_number().over(w))
    val eps = ranked.filter(col("__rk") > c)
      .groupBy(shardCol).agg(max("cnt").as("eps"))
    ranked.filter(col("__rk") <= c).drop("__rk")
      .join(eps, Seq(shardCol), "left")
      .withColumn("eps", coalesce(col("eps"), lit(0L)))
  }

  /** Merged candidate bounds from [[shardSummaries]] output:
    * (keyCol, lb, ub) per candidate key. Pure summary algebra —
    * O(shards × c) rows in, one key-agg shuffle.
    */
  def mergeBounds(summaries: DataFrame, shardCol: String, keyCol: String): DataFrame = {
    // Σ eps over ALL shards is a 1-row aggregate; ub = lb + (totalEps -
    // Σ eps of shards that DID report the key)
    val totalEps = summaries.select(shardCol, "eps").distinct()
      .agg(coalesce(sum("eps"), lit(0L)).as("__te"))
    summaries
      .groupBy(col(keyCol))
      .agg(sum("cnt").as("lb"), sum("eps").as("__seenEps"))
      .crossJoin(broadcast(totalEps))
      .withColumn("ub", col("lb") + (col("__te") - col("__seenEps")))
      .select(col(keyCol), col("lb"), col("ub"))
  }

  /** End to end: summaries -> merged bounds -> exact verify of the
    * candidates only -> true top `k` by exact count (ties to the
    * smallest key), each row carrying its summary bounds and the
    * containment check `lb <= n <= ub` (TRUE by construction — a
    * drifted merge breaks it loudly, which is what the oracle gate
    * pins).
    */
  def topK(df: DataFrame, shardCol: String, keyCol: String, c: Int, k: Int): DataFrame = {
    val bounds = mergeBounds(shardSummaries(df, shardCol, keyCol, c), shardCol, keyCol)
    val exact = df.join(broadcast(bounds.select(keyCol)), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    exact.join(broadcast(bounds), Seq(keyCol))
      .withColumn("rank", row_number().over(Window.orderBy(col("n").desc, col(keyCol))).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("bounds_ok", col("lb") <= col("n") && col("n") <= col("ub"))
      .select(col("rank"), col(keyCol), col("n"), col("lb"), col("ub"), col("bounds_ok"))
  }

  /** The summary-only estimate (no verify pass): top `k` candidates by
    * (lb desc, key). What a monitoring dashboard reads when the exact
    * pass isn't worth a scan; [[topK]] is the closed-loop form.
    */
  def estimateTopK(df: DataFrame, shardCol: String, keyCol: String, c: Int, k: Int): DataFrame =
    mergeBounds(shardSummaries(df, shardCol, keyCol, c), shardCol, keyCol)
      .withColumn("rank", row_number().over(Window.orderBy(col("lb").desc, col(keyCol))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col(keyCol), col("lb"), col("ub"))
}
