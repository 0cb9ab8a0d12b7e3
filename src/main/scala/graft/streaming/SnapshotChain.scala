package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-chained exactly-once state store — the mechanics behind
  * [[AggMaintain]], extracted so any associative-merge maintainer
  * (running aggregates, [[graft.operators.ZoneMap]] skip indexes, …)
  * gets the same guarantees from one implementation:
  *
  *  - batch N merges into the newest snapshot `v=M` (M < N) and
  *    installs `v=N` via stage-to-temp + atomic rename — readers only
  *    ever see complete snapshots;
  *  - a REPLAYED batch re-reads the same immutable older snapshot and
  *    re-installs an identical `v=N` (idempotent; the structured-
  *    streaming checkpoint re-fires only a batch that never committed);
  *  - a snapshot strictly NEWER than the incoming batch means a fresh
  *    checkpoint was pointed at an old store — fail fast instead of
  *    silently forking the chain;
  *  - snapshots strictly older than the merge input are pruned; the
  *    input itself stays so a replay of THIS batch can re-derive its
  *    output.
  *
  * The caller provides only the algebra: the batch's own state frame
  * and an associative `merge`. Determinism of the merged CONTENT is the
  * algebra's business (exact decimals/integers make it bit-stable);
  * determinism of the chain order is this store's.
  */
object SnapshotChain {

  /** One idempotent chain step: merge `batchState` into the newest
    * older snapshot (if any) and install the result as `v=batchId`.
    */
  def step(
      storeDir: String,
      batchId: Long,
      batchState: DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val spark = batchState.sparkSession
    new java.io.File(storeDir).mkdirs()
    val newer = snapshots(storeDir).filter(_ > batchId)
    require(newer.isEmpty,
      s"chain regression: store $storeDir already holds snapshot v=${newer.max} > batch $batchId " +
        "(stream restarted with a fresh checkpoint against an existing store); " +
        "resume with the original checkpoint or use a fresh store dir")
    // clear any crashed half-stage for this batch, then stage fresh
    val tmp = new java.io.File(storeDir, s".tmp-v$batchId")
    deleteRec(tmp)
    val prev = snapshots(storeDir).filter(_ < batchId).maxOption
    val merged = prev match {
      case None => batchState
      case Some(m) => merge(spark.read.parquet(s"$storeDir/v=$m"), batchState)
    }
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    // install atomically; a replay overwrites the identical snapshot
    val dst = new java.io.File(storeDir, s"v=$batchId")
    deleteRec(dst)
    require(tmp.renameTo(dst), s"could not install snapshot v=$batchId")
    prev.foreach(m => snapshots(storeDir).filter(_ < m)
      .foreach(old => deleteRec(new java.io.File(storeDir, s"v=$old"))))
  }

  /** The newest complete snapshot as a DataFrame (empty store ⇒ None). */
  def current(spark: SparkSession, storeDir: String): Option[DataFrame] =
    snapshots(storeDir).maxOption.map(m => spark.read.parquet(s"$storeDir/v=$m"))

  private[streaming] def snapshots(storeDir: String): Seq[Long] =
    Option(new java.io.File(storeDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .toSeq

  private[streaming] def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}
