package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (watermark-based) sync primitives — the Spark-native
  * re-expression of the reference's PostgreSQL→MySQL CDC-style
  * replication (/root/reference/postgresql_mysql_sync_dag.py:28-117).
  *
  * The reference hand-pushes a `(processing_ts, id)` range predicate
  * into its source query [inferred from :40,48-50,61-62,87] and records
  * a STARTED → COMPLETED | NO_DATA lifecycle row per entity per tick in
  * `data_sync_stats` (:64-71,83-101). Here the same range predicate is a
  * Catalyst filter — pushed into parquet scans or JDBC subqueries
  * automatically — and the stats row is a one-row aggregate of the batch.
  *
  * Replay-safety contract (same as the reference, §3.2 of SURVEY.md):
  * the watermark only advances AFTER the sink write commits, and the
  * sink must be idempotent (keyed upsert), so a crash between write and
  * advance re-processes the batch harmlessly.
  */
object SyncJob {

  /** Watermark: rows strictly after `ts`, or at `ts` with id > lastId. */
  final case class Watermark(ts: java.sql.Timestamp, lastId: Long)

  /** The ranged-scan predicate (postgresql_mysql_sync_dag.py:48-50
    * [inferred]); composable with any source so pushdown applies.
    */
  def rangePredicate(tsCol: String, idCol: String, wm: Watermark): Column =
    col(tsCol) > lit(wm.ts) || (col(tsCol) === lit(wm.ts) && col(idCol) > lit(wm.lastId))

  def rangedScan(table: DataFrame, tsCol: String, idCol: String, wm: Watermark): DataFrame =
    table.filter(rangePredicate(tsCol, idCol, wm))

  /** One lifecycle stats row for a batch: (entity, records_count,
    * from_id, to_id, new watermark (ts, id), status). Empty batch =>
    * NO_DATA with null range — exactly the reference's bookkeeping
    * (postgresql_mysql_sync_dag.py:64-71,83-101).
    *
    * The new watermark id is the max id AMONG ROWS AT the max ts
    * (lexicographic max over (ts, id)) — pairing max(ts) with the
    * batch-global max(id) would advance lastId past rows that commit
    * later at the same timestamp and silently skip them forever.
    */
  def syncStats(batch: DataFrame, tsCol: String, idCol: String, entity: String): DataFrame =
    batch.agg(
      count(lit(1)).as("records_count"),
      min(col(idCol)).as("from_id"),
      max(col(idCol)).as("to_id"),
      max(struct(col(tsCol), col(idCol))).as("wm"),
    ).select(
      lit(entity).as("entity"),
      col("records_count"),
      col("from_id"),
      col("to_id"),
      col("wm").getField(tsCol).as("new_watermark_ts"),
      col("wm").getField(idCol).as("new_watermark_id"),
      when(col("records_count") === 0, "NO_DATA").otherwise("COMPLETED").as("status"),
    )

  /** Driver-side watermark advance — a 1-row collect of the stats frame,
    * never of the data.
    */
  def advance(stats: DataFrame, prev: Watermark): Watermark = {
    val r = stats.select("new_watermark_ts", "new_watermark_id").collect()(0)
    if (r.isNullAt(0)) prev
    else Watermark(r.getTimestamp(0), r.getLong(1))
  }
}
