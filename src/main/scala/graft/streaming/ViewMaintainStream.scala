package graft.streaming

import graft.pipeline.ViewMaintain
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming deployment of [[graft.pipeline.ViewMaintain]] on the
  * hash-bucketed state-store layout ([[BucketStore]], the protocol
  * [[VerifiedStream]] pioneered) — the wiring VERDICT r10 flagged as
  * the missing end-to-end: q141 verifies the ALGEBRA (delta-join view
  * maintenance, O(|Δ|) per batch), the bucket protocol was spec'd on
  * VerifiedStream's store, and this joins them the way
  * AggMaintain/RetrievalStream/ZoneMapStream wire their operators.
  *
  * Layout: `storeDir/fact` and `storeDir/view`, each a bucketed table
  * routed on the FACT KEY (`pmod(hash(key), n)`) — the view keeps the
  * fact's key column, so both route identically and one batch touches
  * the same bucket ids in both tables. Per micro-batch:
  *
  *  1. route the batch's keys -> touched bucket ids (a driver-side
  *     collect bounded by nbuckets, control-plane metadata);
  *  2. read ONLY the touched buckets of fact and view as the base
  *     states — a 1-key batch reads one bucket of each however large
  *     the tables are;
  *  3. [[ViewMaintain.applyBatch]] — LWW upserts, tombstones, and the
  *     O(|Δ|) dim re-join;
  *  4. stage + atomically swap the touched buckets back
  *     ([[BucketStore.stageAndSwap]]), with empty-result touched
  *     buckets RETIRED (full-state semantics: a tombstone that removed
  *     a bucket's last key must empty that bucket, unlike
  *     VerifiedStream's update-only store).
  *
  * Restricting applyBatch to the touched buckets is sound because every
  * key the batch can affect routes to a touched bucket, and applyBatch
  * only changes rows whose key is in the batch (fact ⊖ Δ ∪ …) — rows
  * of untouched buckets are definitionally outside Δ.
  *
  * Crash/replay: the fact swap and view swap are separate windows; a
  * crash between them replays the batch (un-committed checkpoint), and
  * applyBatch's LWW resolution makes re-application converge — the
  * replayed batch's rows are already the stored winners, tombstoned
  * keys stay gone (ViewMaintainStreamSpec walks the windows).
  *
  * The dim side is treated as slowly-changing reference data read fresh
  * per batch (the enrichment-dim contract of the reference's sync DAGs);
  * a dim UPDATE only propagates to view rows whose fact keys arrive in
  * a later batch — the documented delta-join trade, same as q141.
  */
object ViewMaintainStream {

  val defaultBuckets: Int = 16

  def start(
      batches: DataFrame,
      keyCol: String,
      seqCol: String,
      deletedCol: String,
      dim: DataFrame,
      factJoinCol: String,
      dimJoinCol: String,
      storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
      nBuckets: Int = defaultBuckets,
  ): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), keyCol, seqCol, deletedCol,
          dim, factJoinCol, dimJoinCol, storeDir, nBuckets)
      }
      .start()

  /** One idempotent maintenance step (public so batch/stream parity and
    * crash windows are spec-able without a streaming harness).
    */
  def processBatch(
      batch: DataFrame,
      keyCol: String,
      seqCol: String,
      deletedCol: String,
      dim: DataFrame,
      factJoinCol: String,
      dimJoinCol: String,
      storeDir: String,
      nBuckets: Int = defaultBuckets,
  ): Unit = {
    val spark = batch.sparkSession
    val factPath = s"$storeDir/fact"
    val viewPath = s"$storeDir/view"
    val keyCols = Seq(keyCol)

    val factSchemaDf = batch.drop(deletedCol).limit(0)
    val viewSchemaDf = factSchemaDf.join(dim, col(factJoinCol) === col(dimJoinCol)).limit(0)

    val ffs = BucketStore.hadoopFs(spark, factPath)
    BucketStore.recoverRoot(ffs, factPath)
    BucketStore.recoverRoot(ffs, viewPath)
    val nb = BucketStore.ensureBucketed(spark, ffs, factPath, nBuckets, keyCols, factSchemaDf)
    val nbView = BucketStore.ensureBucketed(spark, ffs, viewPath, nb, keyCols, viewSchemaDf)
    require(nbView == nb,
      s"fact/view bucket counts diverged ($nb vs $nbView) — rebucket offline to realign")
    BucketStore.recoverBuckets(ffs, factPath)
    BucketStore.recoverBuckets(ffs, viewPath)

    // hash() is type-sensitive: normalize the batch's key dtype to the
    // stored fact table's before routing (BucketStore.bucketCol doc)
    val storedKeyType = BucketStore
      .storedSchema(spark, ffs, factPath, factSchemaDf.schema)
      .fields.find(_.name == keyCol).map(_.dataType)
    // pinned: the touched-bucket collect, applyBatch's touched-key
    // distinct, and its LWW union all consume the batch — each
    // reference otherwise re-executes the batch's source plan
    val routed = graft.operators.Lineage.pin(storedKeyType match {
      case Some(t) if t != batch.schema(keyCol).dataType =>
        batch.withColumn(keyCol, col(keyCol).cast(t))
      case _ => batch
    })

    val touched = routed.select(BucketStore.bucketCol(keyCols, nb).as("__b"))
      .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
    def baseOf(path: String, schemaDf: DataFrame): DataFrame = {
      val dirs = touched.map(b => s"$path/bucket=$b")
        .filter(d => ffs.exists(new org.apache.hadoop.fs.Path(d)))
      if (dirs.nonEmpty) spark.read.parquet(dirs: _*) else schemaDf
    }
    val (fact2, view2) = ViewMaintain.applyBatch(
      baseOf(factPath, factSchemaDf), baseOf(viewPath, viewSchemaDf), routed,
      keyCol, seqCol, deletedCol, dim, factJoinCol, dimJoinCol)

    // Stage BOTH tables before swapping EITHER: view2's lazy plan reads
    // the old fact bucket files, so a fact swap before the view staging
    // would pull those files out from under it. Then fact first, view
    // second: a crash between the two swaps replays the batch, whose
    // LWW re-application against the already-new fact resolves to the
    // same rows — both tables converge.
    val stagedFact = BucketStore.stage(ffs, factPath, fact2, keyCols, nb, touched)
    val stagedView = BucketStore.stage(ffs, viewPath, view2, keyCols, nb, touched)
    BucketStore.swapStaged(ffs, stagedFact, emptyTouchedIsDelete = true)
    BucketStore.swapStaged(ffs, stagedView, emptyTouchedIsDelete = true)
  }

  /** Current maintained states (bucket routing column dropped). */
  def currentFact(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/fact").drop("bucket")

  def currentView(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/view").drop("bucket")
}
