package graft.streaming

import graft.plans.AsofJoin
import graft.sources.ManifestTable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming AS-OF enrichment — the deployment shape of the q50/q187
  * temporal join: an unbounded fact stream (trades, purchases, sensor
  * readings) enriched per micro-batch against a VERSIONED dimension
  * ([[ManifestTable]]), each fact row matched to the dimension row
  * with equal keys and the greatest dimension time <= the fact's event
  * time. The reference's pipeline does this enrichment per file
  * against a Postgres dimension
  * (`/root/reference/parallelized_data_pipeline_dag.py:256-283`
  * enrichment steps); the streaming twin has to solve the extra
  * problem the batch form doesn't have: the dimension KEEPS CHANGING
  * while the stream runs.
  *
  * Semantics (the contract to know, spec-pinned):
  *  - WITHIN a batch, matching is pure event time — the custom
  *    [[AsofJoin]] sort-merge operator runs exactly as in batch, so a
  *    fact is never enriched by a dimension version dated after it;
  *  - ACROSS batches, the dimension is read at each batch's
  *    processing time (one manifest head resolution — O(segments)
  *    metadata): a dimension version that ARRIVES LATE enriches every
  *    later batch but never rewrites rows already emitted. That is
  *    the standard stream-enrichment trade (Flink temporal joins at
  *    processing time make the same one); when retroactive corrections
  *    must reach emitted rows, that is a batch backfill over the
  *    manifest history, not a streaming concern.
  *
  * Exactly-once: each batch's enriched rows append to the output
  * manifest table with `txn = asof-enrich-<batchId>`, so a replayed
  * batch short-circuits against the committed marker — the same
  * replay discipline as [[ManifestStream]], end-to-end atomic with the
  * output table's snapshot isolation.
  *
  * Scale shape per batch: the dimension side shuffles/sorts ONCE per
  * batch at its own size; the batch side is micro-batch-sized. For a
  * broadcast-sized dimension the as-of composition over a broadcast
  * would win — this operator targets the BIG-dimension regime where
  * the sort-merge as-of is the right plan, and inherits AQE's
  * partition re-planning through the exec's required distributions.
  */
object AsofEnrichStream {

  def start(
      events: DataFrame,
      dimDir: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      outDir: String, track: Seq[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
  ): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, dimDir,
          leftKeys, rightKeys, leftTime, rightTime, outDir, track)
      }
      .start()

  /** One enrichment step (public so replay and late-dimension windows
    * are spec-able without a streaming harness): resolve the CURRENT
    * dimension snapshot, as-of join the batch, append exactly-once.
    */
  def processBatch(
      batch: DataFrame, batchId: Long, dimDir: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      outDir: String, track: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val dim = ManifestTable.snapshot(spark, dimDir)
    val enriched = AsofJoin.asof(batch, dim, leftKeys, rightKeys, leftTime, rightTime)
    ManifestTable.commit(enriched, outDir, track, txn = Some(s"asof-enrich-$batchId")): Unit
  }
}
