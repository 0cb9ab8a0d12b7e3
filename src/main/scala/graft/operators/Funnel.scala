package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis with CONSTANT per-key state.
  *
  * The textbook funnel is a greedy left fold over each key's
  * time-ordered event codes (stage advances only on code ==
  * stage + 1) — which, implemented as
  * `aggregate(sort_array(collect_list(...)))`, buffers one key's
  * entire event list in one task: bounded for real users, but a
  * single bot key at corpus scale serializes 10^8 events through one
  * task with no spill path.
  *
  * This operator computes the SAME result via staged conditional
  * mins, using the greedy-earliest equivalence: the fold reaches
  * stage k iff `m_k = min{(ts, seq) : code = k, (ts, seq) > m_(k-1)}`
  * exists (the fold's advancement points are exactly these earliest
  * matches — greedy subsequence matching is canonical). Each stage is
  * one `min(when(...))` aggregate plus a co-partitioned join back;
  * every shuffle is on the key column, so AQE chains them in one
  * partitioning, and per-key state is ONE (ts, seq) struct per stage
  * regardless of the key's event count. Hot keys cost extra rows
  * through a min-aggregate — nothing buffers.
  *
  * `seqCol` breaks timestamp ties (events ordered by (ts, seq), both
  * engines); codes outside 1..maxStage never advance the funnel, like
  * the fold's no-op branch.
  */
object Funnel {

  /** Per-key funnel depth: (key, n_events, funnel_stage) where
    * funnel_stage in [0, maxStage] is the deepest stage reached by
    * the ordered code subsequence 1, 2, ..., maxStage.
    */
  def stages(df: DataFrame, keyCol: String, tsCol: String, seqCol: String,
      codeCol: String, maxStage: Int): DataFrame = {
    require(maxStage >= 1, s"maxStage must be >= 1: $maxStage")
    val ord = struct(col(tsCol), col(seqCol))
    val base = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_events"),
      min(when(col(codeCol) === 1, ord)).as("__m1"))
    var acc = base
    for (k <- 2 to maxStage) {
      val mk = df.filter(col(codeCol) === k)
        .join(acc.filter(col(s"__m${k - 1}").isNotNull)
          .select(col(keyCol), col(s"__m${k - 1}")), keyCol)
        .filter(ord > col(s"__m${k - 1}"))
        .groupBy(col(keyCol)).agg(min(ord).as(s"__m$k"))
      acc = acc.join(mk, Seq(keyCol), "left")
    }
    val stageExpr = (maxStage to 1 by -1)
      .map(k => s"WHEN __m$k IS NOT NULL THEN $k").mkString(" ")
    acc.selectExpr(keyCol, "n_events",
      s"CAST(CASE $stageExpr ELSE 0 END AS BIGINT) AS funnel_stage")
  }
}
