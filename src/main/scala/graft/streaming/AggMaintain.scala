package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental materialized-aggregate maintenance: a streaming source
  * keeps a QUERYABLE parquet table of per-key running aggregates
  * (count + sum) up to date, one merge per micro-batch — the
  * "incremental materialized view" a metrics pipeline serves reads
  * from, without rescanning history.
  *
  * Exactly-once without a transaction log, by SNAPSHOT CHAINING:
  * batch N merges its own aggregate into the newest snapshot dir
  * `v=M` with M < N and writes the result as `v=N` (stage to a temp
  * dir, atomic rename — readers only ever see complete snapshots). A
  * replayed batch re-reads the SAME older snapshot (snapshots are
  * immutable once installed; only ones strictly older than the merge
  * input are pruned) and re-installs an identical `v=N` — idempotent.
  * A crash mid-stage leaves a `.tmp` dir the next attempt clears;
  * `current()` never looks at temp dirs. (The replay window is the
  * NEWEST batch only — the structured-streaming checkpoint guarantee:
  * batch N re-fires only if N never committed, so pruning must keep
  * exactly the newest merge input, which it does.)
  *
  * Scale shape: per batch, ONE partial-agg shuffle of the batch plus a
  * key-partitioned merge with the snapshot (both sides aggregate-sized
  * — one row per key, not per event). Merge order over batches is
  * fixed by the chain, so even double sums are reproducible for a
  * given batch sequence. The trade-off to know: each merge REWRITES
  * the whole aggregate table — right while the key space is far
  * smaller than the event volume (the usual metrics case); when the
  * key space itself is huge, use the bucketed-store layout
  * ([[VerifiedStream]]) where a batch rewrites only touched buckets.
  */
object AggMaintain {

  def start(
      events: DataFrame,
      keyCol: String,
      valCol: String,
      storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
  ): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, keyCol, valCol, storeDir)
      }
      .start()

  /** One idempotent merge step (public so replay and crash windows are
    * spec-able without a streaming harness).
    */
  def processBatch(batch: DataFrame, batchId: Long, keyCol: String, valCol: String, storeDir: String): Unit = {
    val bAgg = batch.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valCol).cast("double")).as("total"))
    SnapshotChain.step(storeDir, batchId, bAgg, (prev, b) =>
      prev.unionByName(b)
        .groupBy(col(keyCol))
        .agg(sum("cnt").as("cnt"), sum("total").as("total")))
  }

  /** The newest complete snapshot as a DataFrame (empty store ⇒ None). */
  def current(spark: SparkSession, storeDir: String): Option[DataFrame] =
    SnapshotChain.current(spark, storeDir)
}
