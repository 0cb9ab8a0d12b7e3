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
  * replaced atomically (write-to-temp + rename) so a crash mid-apply
  * never destroys the only copy of the state.
  */
object VerifiedStream {

  /** Columns every verified-data message carries (:54-58). */
  val keyCols: Seq[String] = Seq("company_id", "external_id")

  /** Entity names become filesystem path segments — restrict to a safe
    * charset (a message with entity='../x' must not escape stateDir).
    */
  private val EntityName = "^[A-Za-z0-9_]+$".r

  def start(
      messages: DataFrame,
      stateDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
  ): StreamingQuery = {
    val spark = messages.sparkSession
    messages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch, stateDir)
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
  def applyBatch(spark: SparkSession, batch: Dataset[Row], stateDir: String): Unit = {
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
          val base = readOrBootstrap(spark, path)
          // tables created before the seq column existed get it added
          val guarded =
            if (base.columns.contains("verified_seq")) base
            else base.withColumn("verified_seq", lit(null).cast(LongType))
          val applied = VerifiedUpdates(guarded, updates, keyCols, "seq",
            Map("verified_data" -> "verified_data_new"),
            baseSeqCol = Some("verified_seq"))
          replaceDurably(spark, applied, path)
        case bad =>
          // log-and-continue, the reference's own failure policy (:59-68)
          System.err.println(s"[verified-stream] skipping unsafe entity name: $bad")
      }
    } finally cached.unpersist()
  }

  /** First message for an entity creates its table (empty base) instead
    * of poison-pilling the stream with a missing-path error. Before
    * reading, recover from an interrupted swap (see [[replaceDurably]]):
    * a missing target with a surviving `.old` means the crash hit
    * between the two renames — restore the old table; a leftover `.tmp`
    * is an incomplete write and is discarded (the streaming checkpoint
    * replays its batch).
    */
  private def readOrBootstrap(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val old = new Path(path + ".old")
    if (!fs.exists(p) && fs.exists(old)) require(fs.rename(old, p), s"recovery rename failed: $old -> $p")
    val tmp = new Path(path + ".tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], bootstrapSchema)
  }

  /** Overwriting the path we just read from would depend on cache
    * residency (evicted blocks would recompute from deleted files).
    * Instead: write the new state next to the old one, then swap with
    * renames. Every transition keeps at least one complete copy on disk
    * (tmp is durable before target moves; `.old` is only deleted after
    * the new target lands) and [[readOrBootstrap]] knows how to recover
    * from a crash at any point between them. Hadoop rename/delete report
    * failure by RETURNING false — each is checked, so a failed swap
    * fails the batch (and the un-committed checkpoint replays it)
    * instead of silently dropping the updates.
    */
  private def replaceDurably(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val fs = FileSystem.get(new Path(path).toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val old = new Path(path + ".old")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) require(fs.delete(old, true), s"could not clear $old")
    val target = new Path(path)
    if (fs.exists(target)) require(fs.rename(target, old), s"rename failed: $target -> $old")
    require(fs.rename(tmp, target), s"rename failed: $tmp -> $target")
    if (fs.exists(old)) require(fs.delete(old, true), s"could not clear $old")
  }
}
