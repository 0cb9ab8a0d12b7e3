package graft.streaming

import graft.api.TextCuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus ingestion with INCREMENTAL near-duplicate
  * rejection: each micro-batch of documents is (1) deduped within the
  * batch (MinHash-LSH pairs at or above `threshold`; the higher id of
  * each pair drops — the curate() convention), (2) checked against the
  * PERSISTED band index of everything accepted so far
  * ([[TextCuration.lshCandidatesIndexed]] — work scales with batch
  * size, never corpus size), and (3) survivors are written to the
  * accept dir and their band rows appended to the index, so the NEXT
  * batch dedups against them too.
  *
  * Exactly-once without a transaction log: every write lands in a
  * deterministic `batch=<id>` partition dir with Overwrite — a
  * replayed batch recomputes the same survivors (decisions depend
  * only on batch content + strictly-older index partitions; the
  * replay prunes its own half-written partition) and overwrites the
  * same two dirs. Readers see the corpus as
  * `spark.read.parquet(acceptDir)`.
  *
  * Dedup policy note: a batch doc `b` dropped for matching batch doc
  * `a` keeps no copy even if `a` is itself rejected by the index —
  * correct, because `a` matching the corpus means `b`'s content is
  * already transitively represented there.
  */
object DedupStream {

  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      acceptDir: String,
      checkpointDir: String,
      threshold: Double,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, idCol, textCol, indexDir, acceptDir, threshold)
      }
      .start()

  /** One idempotent ingest step (public so replay safety is spec-able
    * without a streaming harness).
    */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      indexDir: String,
      acceptDir: String,
      threshold: Double,
  ): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession

    // (1) within-batch: drop the higher id of every near-dup pair
    val innerDups = TextCuration.minhashCandidates(batch, idCol, textCol)
      .filter(col("est_sim") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    val inner = batch.join(innerDups, Seq(idCol), "left_anti")

    // (2) vs the accepted corpus — strictly-older partitions only, so a
    // replay never reads its own half-written batch dir (partition
    // pruning keeps this a metadata-level exclusion)
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val priorBatches = {
      val p = new Path(indexDir)
      fs.exists(p) && fs.listStatus(p).exists { st =>
        st.getPath.getName match {
          case s if s.startsWith("batch=") => s.stripPrefix("batch=").toLong < batchId
          case _ => false
        }
      }
    }
    val survivors =
      if (!priorBatches) inner
      else {
        val idx = spark.read.parquet(indexDir).filter(col("batch") < batchId)
        val hits = TextCuration.lshCandidatesAgainst(inner, idCol, textCol, idx)
          .filter(col("est_sim") >= threshold)
          .select(col("id_a").as(idCol)).distinct()
        inner.join(hits, Seq(idCol), "left_anti")
      }

    // (3) idempotent writes: deterministic per-batch partition dirs
    survivors.write.mode(SaveMode.Overwrite).parquet(s"$acceptDir/batch=$batchId")
    TextCuration.buildLshIndex(survivors, idCol, textCol, s"$indexDir/batch=$batchId")
  }
}
