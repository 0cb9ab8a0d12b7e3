package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental AGGREGATE-view maintenance driven by the manifest
  * table's row-level change feed — the composition that makes the
  * storage layer's CDF ([[ManifestTable.changes]]) more than a debug
  * surface: a materialized count/sum rollup advances from version to
  * version reading ONLY the files the commits touched, never the
  * table.
  *
  * The algebra is classic retraction-based IVM (self-maintainable
  * aggregates): each feed row carries +1 (insert) or -1 (delete), the
  * delta aggregate is one shuffle over the FEED (bounded by the
  * touched files), and the merge is a keyed union-aggregate with the
  * current view (one row per key on both sides). Counts that cancel
  * to zero drop out — with exact DECIMAL sums, a fully-retracted key's
  * total cancels to exactly zero too, so drop-on-zero-count is safe
  * (the float version of this operator would leak epsilons; that is
  * why the internal total is DECIMAL(30,2)-summed, same as every
  * exact aggregate in the catalog).
  *
  * Equivalence contract (q190 hash-gates it): for any version chain
  * v0 < v1 < … < vn,
  * `advance(…advance(init(v0), v0→v1)…, v(n-1)→vn) == init(vn)` —
  * fold the feed instead of rescanning, get bit-identical rollups.
  * At 100 TB the difference is reading a handful of copy-on-write
  * files per commit vs re-aggregating the whole table.
  *
  * Next to [[graft.streaming.AggMaintain]] (insert-only streaming
  * micro-batches, snapshot-chained store) this is the RETRACTION
  * member of the incremental-materialization family: updates and
  * deletes arrive as cancel-pairs from the feed, no LWW machinery
  * needed because the storage layer already resolved row identity.
  */
object ChangeFeedView {

  private val Dec = DecimalType(30, 2)

  /** The rollup reserves `n`/`total` for its outputs and reads the
    * feed's `_change` marker — a table column with one of those names
    * would make the merge ambiguous or silently wrong, so reject up
    * front rather than let analysis half-catch it.
    */
  private def requireNoReserved(keys: Seq[String], valCol: String): Unit = {
    val reserved = Set("n", "total", "_change")
    val clash = (keys :+ valCol).filter(reserved)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with the view's reserved " +
        "outputs (n, total, _change); alias them before materializing")
  }

  /** The materialized rollup (`keys…, n, total`) at snapshot `asOf` —
    * the one full-scan baseline an incremental chain starts from.
    */
  def init(
      spark: SparkSession, dir: String, keys: Seq[String], valCol: String,
      asOf: Option[Long] = None): DataFrame = {
    requireNoReserved(keys, valCol)
    ManifestTable.snapshot(spark, dir, asOf)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valCol).cast(Dec)).as("total"))
  }

  /** Advance `view` (shaped like [[init]]'s output) across the commit
    * range `fromV -> toV` using only the change feed. One feed-sized
    * delta aggregate + one view-sized keyed merge; zero-count keys
    * (every row retracted) drop out exactly.
    */
  def advance(
      spark: SparkSession, view: DataFrame, dir: String,
      keys: Seq[String], valCol: String, fromV: Long, toV: Long): DataFrame =
    fold(view, ManifestTable.changes(spark, dir, fromV, toV), keys, valCol)

  /** The merge half of [[advance]] on an ALREADY-DELIVERED feed frame
    * (rows with a `_change` marker) — the entry point a long-lived
    * consumer uses with [[graft.streaming.ChangeFeedStream]]'s per-poll
    * deliveries, where the stream owns the version range and the view
    * just folds whatever arrives.
    */
  def fold(view: DataFrame, feed: DataFrame, keys: Seq[String], valCol: String): DataFrame = {
    requireNoReserved(keys, valCol)
    val signedVal = when(col("_change") === "insert", col(valCol).cast(Dec))
      .otherwise(-col(valCol).cast(Dec))
    val sign = when(col("_change") === "insert", 1L).otherwise(-1L)
    val delta = feed.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("n"), sum(signedVal).as("total"))
    view.select((keys.map(col) :+ col("n") :+ col("total")): _*)
      .unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("total").as("total"))
      .filter(col("n") > 0)
  }
}
