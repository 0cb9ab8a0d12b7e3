package graft.streaming

import graft.pipeline.PipelineRunner
import graft.pipeline.PipelineRunner.PipelineSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File-arrival sensor + dynamic fan-out — the Spark-native
  * re-expression of SQS_SENSOR_DAG + TriggerMultiDagRunOperator
  * (/root/reference/sqs_sensor_dag.py:26-56,120-142): poll a message
  * source on a fixed cadence, parse `{bucket, path}` bodies, and start
  * one pipeline run per file.
  *
  * The message source is a Structured-Streaming file-drop directory
  * (each dropped .json file = one SQS message body); micro-batch
  * execution gives the reference's `max_active_runs=1` single-flight
  * for free, and `Trigger.ProcessingTime` is the 2-minute schedule. Run
  * ids are deterministic (batchId + row index), replacing the
  * reference's wall-clock `trig__{utcnow}` ids (sqs_sensor_dag.py:41-42;
  * SURVEY §7.4 non-determinism note).
  */
object SensorLoop {

  /** SQS-message-body schema: the fields projected at
    * sqs_sensor_dag.py:70-75.
    */
  val messageSchema: StructType = StructType(Seq(
    StructField("s3_bucket", StringType),
    StructField("s3_file_path", StringType),
  ))

  /** Start the sensor: watch `inboxDir` for message files; for each
    * message run the per-file pipeline (zip at s3_file_path) with
    * `specFor(runId, path)`. foreachBatch collects only the tiny message
    * batch to the driver (control plane), never payload data.
    */
  def start(
      spark: SparkSession,
      inboxDir: String,
      checkpointDir: String,
      specFor: (String, String) => PipelineSpec,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
  ): StreamingQuery = {
    val messages = spark.readStream
      .schema(messageSchema)
      .json(inboxDir)
    messages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val files = batch
          .select(col("s3_file_path"))
          .collect()
          .map(_.getString(0))
          .sorted
        files.zipWithIndex.foreach { case (path, i) =>
          val runId = s"run_${batchId}_$i"
          PipelineRunner.runFromZip(spark, path, specFor(runId, path))
        }
        ()
      }
      .start()
  }
}
