package graft.streaming

import graft.api.Retrieval
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming BM25 index maintenance: each micro-batch of documents is
  * folded into the persisted inverted index
  * ([[Retrieval.appendToBm25Index]] — work scales with the batch's
  * touched term buckets, never the corpus), so queries served from
  * [[Retrieval.bm25Indexed]] see the corpus as of the last committed
  * batch. The retrieval-side twin of [[DedupStream]]'s ingest loop.
  *
  * Exactly-once without a transaction log: the foreachBatch id is
  * passed straight through as the append's batch id — postings
  * distinct-merge and the per-batch `stats/batch=<id>` partition row
  * make a redelivered batch converge to the same index instead of
  * double-counting (see appendToBm25Index's replay contract). The
  * first batch bootstraps the index with a fresh build.
  */
object RetrievalStream {

  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, idCol, textCol, indexDir)
      }
      .start()

  /** One idempotent ingest step (public so replay safety is spec-able
    * without a streaming harness). Bootstraps on a missing index; the
    * bootstrap itself is replay-safe (a fresh build overwrites).
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String, textCol: String,
                   indexDir: String): Unit = {
    val spark = batch.sparkSession
    val postings = new Path(s"$indexDir/postings")
    val fs = postings.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(postings)) Retrieval.buildBm25Index(batch, idCol, textCol, indexDir)
    else Retrieval.appendToBm25Index(batch, idCol, textCol, indexDir, batchId = batchId)
  }
}
