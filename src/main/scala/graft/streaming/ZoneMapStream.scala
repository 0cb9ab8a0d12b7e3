package graft.streaming

import graft.operators.ZoneMap
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of a [[graft.operators.ZoneMap]] skip index:
  * each micro-batch builds its own zone map (map-only over the new
  * data) and folds it into the stored one through the snapshot-chained
  * exactly-once store ([[SnapshotChain]]) — so the index that
  * accelerates interactive range scans stays fresh as data lands,
  * without ever re-scanning history.
  *
  * min/max/count merging is associative and replay-idempotent, so the
  * chain's guarantees carry over unconditionally. The batch-side cost
  * is one partial-agg shuffle of the BATCH (zones ≪ rows); the merge
  * touches O(zones) rows on both sides. Deletes inherit the zone-map
  * contract: envelopes only widen, pruning stays correct but less
  * selective until affected zones rebuild.
  */
object ZoneMapStream {

  def start(
      stream: DataFrame,
      zone: Column,
      track: Seq[String],
      storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
  ): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, zone, track, storeDir)
      }
      .start()

  /** One idempotent maintenance step (public so replay/crash windows
    * are spec-able without a streaming harness).
    */
  def processBatch(batch: DataFrame, batchId: Long, zone: Column, track: Seq[String], storeDir: String): Unit =
    SnapshotChain.step(storeDir, batchId, ZoneMap.build(batch, zone, track), ZoneMap.merge)

  /** The newest complete zone map (empty store ⇒ None); feed it to
    * [[graft.operators.ZoneMap.prunedScan]].
    */
  def current(spark: SparkSession, storeDir: String): Option[DataFrame] =
    SnapshotChain.current(spark, storeDir)
}
