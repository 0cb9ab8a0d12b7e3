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
    val spark = batch.sparkSession
    new java.io.File(storeDir).mkdirs()
    // Chain-regression guard: a snapshot STRICTLY newer than this batch
    // means the stream was restarted with a fresh checkpoint (batch ids
    // reset to 0) against a store built by an older chain — merging
    // would silently fork the chain and later overtake the old head on
    // the wrong base. Fail fast: resume with the matching checkpoint,
    // or point at a fresh store dir. (An EQUAL snapshot is the normal
    // replay window — batch N re-fires only if N never committed — and
    // re-installs an identical v=N, so == stays allowed.)
    val newer = snapshots(storeDir).filter(_ > batchId)
    require(newer.isEmpty,
      s"chain regression: store $storeDir already holds snapshot v=${newer.max} > batch $batchId " +
        "(stream restarted with a fresh checkpoint against an existing store); " +
        "resume with the original checkpoint or use a fresh store dir")
    // clear any crashed half-stage for this batch, then stage fresh
    val tmp = new java.io.File(storeDir, s".tmp-v$batchId")
    deleteRec(tmp)

    val prev = snapshots(storeDir).filter(_ < batchId).maxOption
    val bAgg = batch.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valCol).cast("double")).as("total"))
    val merged = prev match {
      case None => bAgg
      case Some(m) =>
        spark.read.parquet(s"$storeDir/v=$m")
          .unionByName(bAgg)
          .groupBy(col(keyCol))
          .agg(sum("cnt").as("cnt"), sum("total").as("total"))
    }
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)

    // install atomically; a replay overwrites the identical snapshot
    val dst = new java.io.File(storeDir, s"v=$batchId")
    deleteRec(dst)
    require(tmp.renameTo(dst), s"could not install snapshot v=$batchId")
    // prune snapshots strictly older than the merge input — the input
    // itself stays so a replay of THIS batch can re-derive v=batchId
    prev.foreach(m => snapshots(storeDir).filter(_ < m)
      .foreach(old => deleteRec(new java.io.File(storeDir, s"v=$old"))))
  }

  /** The newest complete snapshot as a DataFrame (empty store ⇒ None). */
  def current(spark: SparkSession, storeDir: String): Option[DataFrame] =
    snapshots(storeDir).maxOption.map(m => spark.read.parquet(s"$storeDir/v=$m"))

  private def snapshots(storeDir: String): Seq[Long] =
    Option(new java.io.File(storeDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .toSeq

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}
