package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.Engine
import graft.operators.FieldMapping
import graft.pipeline.PipelineRunner.PipelineSpec
import graft.streaming.SensorLoop
import org.apache.spark.sql.streaming.Trigger

/** End-to-end demo of the event-driven pipeline topology (the
  * reference's sensor -> fan-out -> per-entity ETL flow) against a local
  * file-drop inbox: drops a zip + message, runs the sensor once with
  * Trigger.AvailableNow, prints the persisted entity tables and stats.
  *
  * Usage: sbt "runMain graft.tools.DemoPipeline"
  */
object DemoPipeline {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-demo", "4")
    val dir = Files.createTempDirectory("graft_demo")
    val inbox = Files.createDirectories(dir.resolve("inbox"))
    val sink = dir.resolve("sink").toString

    // author an input zip (FIXTURES.md §B1 shape) + its arrival message
    val zip = dir.resolve("batch-0001.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    Seq(
      "metadata.json" -> """{"workflow_system_name": "crm", "company_id": 42}""",
      "contact.json" -> Seq(
        """{"cid": {"$oid": "aa01"}, "name": "alice", "segment": "building"}""",
        """{"cid": {"$oid": "bb02"}, "name": "bob", "segment": null}""").mkString("\n"),
      "transaction.json" -> Seq(
        """{"tid": 1, "amount": 9.99}""",
        """{"tid": 2, "amount": 1.25}""").mkString("\n"),
    ).foreach { case (n, c) =>
      zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes(StandardCharsets.UTF_8)); zos.closeEntry()
    }
    zos.close()
    Files.writeString(inbox.resolve("msg-0001.json"),
      s"""{"s3_bucket": "local", "s3_file_path": "$zip"}""")

    val spec = (runId: String, path: String) => PipelineSpec(
      runId = runId,
      mappings = Map(
        "contact" -> Seq(
          FieldMapping("cid['$oid']", "contact_id"),
          FieldMapping("upper(name)", "full_name"),
          FieldMapping("segment", "segment", default = Some("'unknown'"))),
        "transaction" -> Seq(
          FieldMapping("tid", "txn_id", Some("bigint")),
          FieldMapping("amount", "amount", Some("double")))),
      sinkDir = sink,
    )
    val q = SensorLoop.start(spark, inbox.toString, dir.resolve("ckpt").toString, spec,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    q.stop()

    println("== contact sink ==")
    spark.read.parquet(s"$sink/contact").show(false)
    println("== transaction sink ==")
    spark.read.parquet(s"$sink/transaction").show(false)
    spark.stop()
  }
}
