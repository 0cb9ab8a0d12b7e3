package graft.streaming

import graft.pipeline.VerifiedUpdates
import org.apache.spark.sql.{DataFrame, Row, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
  * [[graft.pipeline.JdbcUpsert]]; the local state tables are parquet.
  */
object VerifiedStream {

  /** Columns every verified-data message carries (:54-58). */
  val keyCols: Seq[String] = Seq("company_id", "external_id")

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

  /** Apply one batch of messages to the per-entity state tables.
    * Factored out of the stream for direct testing and replay.
    */
  def applyBatch(spark: SparkSession, batch: Dataset[Row], stateDir: String): Unit = {
    val entities = batch.select("entity").distinct().collect().map(_.getString(0)).sorted
    entities.foreach { entity =>
      val path = s"$stateDir/verified_$entity"
      val updates = batch
        .filter(col("entity") === entity)
        .select(col("company_id"), col("external_id"), col("seq"), col("verified_data").as("verified_data_new"))
      val base = spark.read.parquet(path)
      val applied = VerifiedUpdates(base, updates, keyCols, "seq", Map("verified_data" -> "verified_data_new"))
      // materialize before overwriting the path we read from
      val rows = applied.cache()
      rows.count()
      try rows.write.mode(SaveMode.Overwrite).parquet(path)
      finally rows.unpersist()
    }
  }
}
