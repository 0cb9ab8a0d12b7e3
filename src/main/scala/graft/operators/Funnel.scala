package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** User-journey path mining: gap-sessionize (same 30-min inactivity
    * rule as q49), render each session's first `maxSteps` event types
    * in (ts, id) order as a `>`-joined path string, and count the
    * top-`topK` most common journeys — the "what do users actually do"
    * aggregate behind funnel design. Everything is
    * string/integer-exact; the step cap bounds both the path-string
    * length and the per-session buffer (the q114 fold family's hot-key
    * contract applies to a pathological single session).
    *
    * Scale shape: two windows on one user-key shuffle (lag + running
    * break count — same exchange), one per-session aggregation, one
    * path aggregation, top-k via TakeOrderedAndProject.
    */
  def sessionPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      gapMicros: Long = 1800000000L,
      maxSteps: Int = 8,
      topK: Int = 20): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive: $gapMicros")
    require(maxSteps > 0 && topK > 0, s"maxSteps/topK must be positive: $maxSteps, $topK")
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    events
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__brk",
        when(col("__prev_us").isNull ||
          (unix_micros(col(tsCol)) - col("__prev_us")) > gapMicros, 1L).otherwise(0L))
      .withColumn("__sess",
        sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sess"))
      .agg(sort_array(collect_list(struct(col(tsCol), col(idCol), col(typeCol).as("__t"))))
        .as("__seq"))
      .select(array_join(
        expr(s"transform(slice(__seq, 1, $maxSteps), sp_x -> sp_x.__t)"), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).cast("long").as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(topK)
  }
}
