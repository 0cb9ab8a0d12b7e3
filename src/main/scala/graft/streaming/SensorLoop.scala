package graft.streaming

import graft.pipeline.{Dag, PipelineRunner}
import graft.pipeline.PipelineRunner.PipelineSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.concurrent.ExecutionContext
import scala.concurrent.duration._

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
    *
    * Per-file runs within a batch execute CONCURRENTLY — the reference
    * triggers one independent DAG run per message
    * (sqs_sensor_dag.py:34-56), and Airflow runs those in parallel.
    * Fan-out goes through [[Dag]] as an edge-free node set on a pool of
    * `maxParallelFiles` threads: each node issues Spark actions (which
    * parallelize across the cluster themselves), so the bound is on
    * concurrent driver-side run orchestration, not compute. Any failed
    * run fails the whole batch AFTER every run has settled (no
    * cancellation of siblings mid-flight), so the streaming checkpoint
    * does not commit and the batch replays on restart — the reference's
    * retry unit is the same (one message = one DAG run). Per-run
    * `retries`/`retryDelay` mirror the reference's task-level
    * default_args (0 retries, 30-min delay configured) and re-run a
    * failed file's pipeline in place before the batch verdict.
    */
  def start(
      spark: SparkSession,
      inboxDir: String,
      checkpointDir: String,
      specFor: (String, String) => PipelineSpec,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
      maxParallelFiles: Int = 4,
      // default is effectively unbounded — a slow-but-progressing batch
      // must never flip into a deterministic timeout/replay loop (the
      // pre-fan-out sequential loop had no deadline either). A finite
      // deadline must cover (retries+1) * (runTime + retryDelay) for the
      // slowest file (Dag.run's contract).
      batchTimeout: FiniteDuration = 365.days,
      retries: Int = 0, // the reference's default_args (retries=0, 30-min delay configured)
      retryDelay: FiniteDuration = 30.minutes,
  ): StreamingQuery = {
    require(maxParallelFiles >= 1, s"maxParallelFiles must be >= 1 (got $maxParallelFiles)")
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
        if (files.nonEmpty) {
          val nodes: Map[String, () => Unit] = files.zipWithIndex.map { case (path, i) =>
            val runId = s"run_${batchId}_$i"
            runId -> { () => PipelineRunner.runFromZip(spark, path, specFor(runId, path)); () }
          }.toMap
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(maxParallelFiles, files.length))
          try {
            val result = Dag.run(Dag.Spec(nodes, Seq.empty, retries = retries, retryDelay = retryDelay),
              batchTimeout)(
              ExecutionContext.fromExecutorService(pool))
            result.states.collectFirst { case (runId, f: Dag.FailedState) => (runId, f) }
              .foreach { case (runId, f) =>
                throw new IllegalStateException(
                  s"pipeline $runId failed after ${f.attempts} attempt(s)", f.error)
              }
          } finally pool.shutdownNow()
        }
        ()
      }
      .start()
  }
}
