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

  /** Schema a bootstrapped (first-seen entity) state table starts with. */
  private def bootstrapSchema: StructType = StructType(Seq(
    StructField("company_id", LongType),
    StructField("external_id", LongType),
    StructField("verified_data", StringType),
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
          val applied = VerifiedUpdates(base, updates, keyCols, "seq",
            Map("verified_data" -> "verified_data_new"))
          replaceAtomically(spark, applied, path)
        case bad =>
          // log-and-continue, the reference's own failure policy (:59-68)
          System.err.println(s"[verified-stream] skipping unsafe entity name: $bad")
      }
    } finally cached.unpersist()
  }

  /** First message for an entity creates its table (empty base) instead
    * of poison-pilling the stream with a missing-path error.
    */
  private def readOrBootstrap(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], bootstrapSchema)
  }

  /** Overwriting the path we just read from would depend on cache
    * residency (evicted blocks would recompute from deleted files).
    * Instead: write the new state next to the old one, then swap with
    * renames — the temp table is complete and durable before the old
    * path is touched.
    */
  private def replaceAtomically(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val fs = FileSystem.get(new Path(path).toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val old = new Path(path + ".old")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    val target = new Path(path)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    fs.delete(old, true)
  }
}
