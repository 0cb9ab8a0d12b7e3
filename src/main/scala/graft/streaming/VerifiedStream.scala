package graft.streaming

import graft.pipeline.VerifiedUpdates
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Verified-data corrections stream — the Spark-native re-expression of
  * SQS_VERIFIED_DATA_SYNC_SENSOR_DAG (/root/reference/
  * sqs_sync_verified_data_dag.py:37-68): a stream of
  * `{entity, company_id, external_id, verified_data}` messages applied
  * as keyed last-writer-wins updates to per-entity `verified_{entity}`
  * tables.
  *
  * Each micro-batch groups by entity driver-side (the dynamic
  * `verified_{entity}` table dispatch of :61) and applies the batch as
  * ONE set-oriented upsert per entity via [[VerifiedUpdates]] — not
  * per-row UPDATE round trips. At the real sink this is
  * [[graft.pipeline.JdbcUpsert]]; the local state tables are parquet,
  * PARTITIONED BY KEY-HASH BUCKET (`bucket=N` subdirs): a batch
  * rewrites only the buckets its keys fall in, so a point-update tick
  * costs O(touched buckets), not a full-table rewrite — the property
  * that keeps a 2-minute cadence viable when the state table is large.
  * Every bucket swap is atomic (hidden `.bN.tmp`/`.bN.old` + renames),
  * so a crash mid-apply never destroys the only copy of any bucket;
  * the un-committed streaming checkpoint replays the batch and the
  * cross-batch seq guard makes re-application a no-op. Pre-bucketing
  * flat tables are migrated in one crash-safe root-level swap on first
  * touch; `_nbuckets` pins the routing across restarts so a changed
  * default can never split a key over two buckets.
  */
object VerifiedStream {

  /** Columns every verified-data message carries (:54-58). */
  val keyCols: Seq[String] = Seq("company_id", "external_id")

  /** Buckets a NEW state table is created with. Existing tables keep the
    * count pinned in their `_nbuckets` marker regardless of this default
    * (a changed default must never split a key over two buckets). Sized
    * so each bucket of a large table stays a comfortable rewrite unit;
    * at 100 TB you'd bootstrap with a few thousand.
    */
  val defaultBuckets: Int = 16

  /** Entity names become filesystem path segments — restrict to a safe
    * charset (a message with entity='../x' must not escape stateDir).
    */
  private val EntityName = "^[A-Za-z0-9_]+$".r

  def start(
      messages: DataFrame,
      stateDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
      nBuckets: Int = defaultBuckets,
  ): StreamingQuery = {
    val spark = messages.sparkSession
    messages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch, stateDir, nBuckets)
        ()
      }
      .start()
  }

  /** Schema a bootstrapped (first-seen entity) state table starts with.
    * verified_seq persists the last-applied message seq per row so LWW
    * holds ACROSS micro-batches: a stale redelivery in a later batch
    * (at-least-once delivery) must not regress newer state.
    */
  private def bootstrapSchema: StructType = StructType(Seq(
    StructField("company_id", LongType),
    StructField("external_id", LongType),
    StructField("verified_data", StringType),
    StructField("verified_seq", LongType),
  ))

  /** Apply one batch of messages to the per-entity state tables.
    * Factored out of the stream for direct testing and replay.
    */
  def applyBatch(
      spark: SparkSession,
      batch: Dataset[Row],
      stateDir: String,
      nBuckets: Int = defaultBuckets,
  ): Unit = {
    // one source scan for the whole fan-out (distinct + per-entity filters)
    val cached = batch.persist()
    try {
      val entities = cached.select("entity").distinct().collect()
        .flatMap(r => Option(r.getString(0))).sorted
      entities.foreach {
        case entity @ EntityName() =>
          val path = s"$stateDir/verified_$entity"
          val updates = cached
            .filter(col("entity") === entity)
            .select(col("company_id"), col("external_id"), col("seq"),
              col("verified_data").as("verified_data_new"))
          applyToTable(spark, updates, path, nBuckets)
        case bad =>
          // log-and-continue, the reference's own failure policy (:59-68)
          System.err.println(s"[verified-stream] skipping unsafe entity name: $bad")
      }
    } finally cached.unpersist()
  }

  /** Read a state table regardless of layout generation: bucketed tables
    * come back through partition discovery (the synthetic `bucket`
    * routing column is dropped), legacy flat tables read as-is.
    */
  def readState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("bucket")

  /** Key -> bucket routing: Murmur3 over the key columns, mod the count
    * pinned in the table's `_nbuckets` marker. Deterministic across
    * sessions and restarts (fixed-seed [[org.apache.spark.sql.functions.hash]]).
    * Protocol primitives live in [[BucketStore]] (extracted r11 so
    * [[ViewMaintainStream]] shares the same storage discipline).
    */
  private def bucketCol(nb: Int) = BucketStore.bucketCol(keyCols, nb)

  private def hadoopFs(spark: SparkSession, path: String): FileSystem =
    BucketStore.hadoopFs(spark, path)

  /** Apply one entity's updates to its bucketed state table: route each
    * key to `pmod(hash(key), nbuckets)`, read ONLY the touched buckets
    * as the join base, and swap only those buckets back in — a 1-key
    * batch costs one bucket read + one bucket rewrite however large the
    * table is. The touched-bucket list is a driver-side collect bounded
    * by nbuckets (control-plane metadata, never data).
    */
  private def applyToTable(
      spark: SparkSession,
      updates: DataFrame,
      path: String,
      nBuckets: Int,
  ): Unit = {
    val fs = hadoopFs(spark, path)
    recoverRoot(fs, path)
    val nb = ensureBucketed(spark, fs, path, nBuckets)
    recoverBuckets(fs, path)

    // Spark's hash() is TYPE-sensitive (hash(1) != hash(1L)): if a
    // stream batch's key dtypes drift from the stored table's (int vs
    // bigint after a producer change), hashing the raw batch would route
    // updates to buckets the matching base rows were never written to —
    // a silently dropped update. Normalize the batch's key columns to
    // the STORED key types (one footer read of one bucket dir) before
    // any routing or joining.
    val storedSchema = BucketStore.storedSchema(spark, fs, path, bootstrapSchema)
    val keyType = storedSchema.fields.iterator
      .filter(f => keyCols.contains(f.name)).map(f => f.name -> f.dataType).toMap
    val routed = keyCols.foldLeft(updates) { (df, k) =>
      if (keyType.get(k).forall(_ == df.schema(k).dataType)) df
      else df.withColumn(k, col(k).cast(keyType(k)))
    }

    val touched = routed.select(bucketCol(nb).as("__b")).distinct()
      .collect().map(_.getInt(0)).sorted
    val existing = touched.map(b => s"$path/bucket=$b")
      .filter(d => fs.exists(new Path(d)))
    // reading the bucket dirs directly (no partition discovery) keeps the
    // base schema = the data schema; all buckets share one schema because
    // migration/bootstrap normalize it (incl. verified_seq)
    val base =
      if (existing.nonEmpty) spark.read.parquet(existing.toIndexedSeq: _*)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], bootstrapSchema)
    // tables created before the seq column existed get it added
    val guarded =
      if (base.columns.contains("verified_seq")) base
      else base.withColumn("verified_seq", lit(null).cast(LongType))
    val applied = VerifiedUpdates(guarded, routed, keyCols, "seq",
      Map("verified_data" -> "verified_data_new"),
      baseSeqCol = Some("verified_seq"))

    // Stage + atomic per-bucket swap via the shared protocol. UPDATE
    // semantics: a touched bucket with an empty staged result (updates
    // to absent keys) is correctly left alone; replay of an interrupted
    // batch re-applies as a no-op under the verified_seq guard.
    BucketStore.stageAndSwap(fs, path, applied, keyCols, nb, touched.toIndexedSeq,
      emptyTouchedIsDelete = false)
  }

  /** Offline re-bucketing of a verified state table: rewrite every row
    * into `newBuckets` bucket dirs and re-pin `_nbuckets`. The bucket
    * count a table was created with (`_nbuckets`) is otherwise pinned
    * forever — correct for routing, but a table that has grown 100x
    * since bootstrap ends up with rewrite units 100x the intended size.
    * This is the operational escape hatch: run it OFFLINE (no concurrent
    * applyBatch on the same table — the root swap would pull the table
    * out from under a running batch's reads).
    *
    * Crash-safe via the same root-level swap as flat->bucketed
    * migration: the new layout is staged at `path.tmp`, then
    * old root -> `.old`, staging -> root. [[recoverRoot]] covers every
    * window — a crash before the first rename leaves the old table
    * live (stray `.tmp` discarded); between the renames, `.old` is
    * restored; after, the leftover `.old` is cleared. Re-running
    * rebucket after any crash completes the job.
    *
    * A legacy flat table is migrated straight to `newBuckets`; a table
    * already at `newBuckets` is a no-op.
    */
  def rebucket(spark: SparkSession, path: String, newBuckets: Int): Unit = {
    require(newBuckets > 0, s"newBuckets must be positive: $newBuckets")
    val fs = hadoopFs(spark, path)
    recoverRoot(fs, path)
    require(fs.exists(new Path(path)), s"no state table at $path")
    // flat tables migrate directly to the requested count inside
    // ensureBucketed; already-bucketed tables report their pinned count
    val nb = ensureBucketed(spark, fs, path, newBuckets)
    if (nb != newBuckets) {
      recoverBuckets(fs, path)
      val all = readState(spark, path)
      val tmp = s"$path.tmp"
      all.withColumn("bucket", bucketCol(newBuckets))
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(tmp)
      // an empty table writes no partition dirs; keep one footer-only
      // bucket so the table stays readable (same as migration/bootstrap)
      if (!fs.listStatus(new Path(tmp)).exists(_.getPath.getName.startsWith("bucket=")))
        all.limit(0).write.mode(SaveMode.Overwrite).parquet(s"$tmp/bucket=0")
      writeMarker(fs, new Path(s"$tmp/_nbuckets"), newBuckets)
      val root = new Path(path)
      val old = new Path(path + ".old")
      require(fs.rename(root, old), s"rename failed: $root -> $old")
      require(fs.rename(new Path(tmp), root), s"rename failed: $tmp -> $root")
      require(fs.delete(old, true), s"could not clear $old")
    }
  }

  /** Root/bucket recovery and bucketed bootstrap/migration — the
    * [[BucketStore]] protocol with the verified-specific schema rules
    * plugged in: a migrated legacy flat table gains the verified_seq
    * column (both migration and bootstrap normalize the schema so
    * every bucket of a table always shares one schema).
    */
  private def recoverRoot(fs: FileSystem, path: String): Unit =
    BucketStore.recoverRoot(fs, path)

  private def recoverBuckets(fs: FileSystem, path: String): Unit =
    BucketStore.recoverBuckets(fs, path)

  private def ensureBucketed(spark: SparkSession, fs: FileSystem, path: String, nBuckets: Int): Int =
    BucketStore.ensureBucketed(
      spark, fs, path, nBuckets, keyCols,
      bootstrap = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], bootstrapSchema),
      normalizeFlat = flat =>
        if (flat.columns.contains("verified_seq")) flat
        else flat.withColumn("verified_seq", lit(null).cast(LongType)),
    )

  private def writeMarker(fs: FileSystem, at: Path, nBuckets: Int): Unit =
    BucketStore.writeMarker(fs, at, nBuckets)
}
