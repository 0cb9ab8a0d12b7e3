package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Zip-archive ingest: one input file = a zip holding `metadata.json`
  * plus one JSON-lines member per entity — the file shape the reference
  * pulls from S3 and unpacks driver-side
  * (/root/reference/sqs_sensor_dag.py:92-98, metadata.json member read
  * at :96-98; payload parse inside ReaderStep [inferred],
  * parallelized_data_pipeline_dag.py:183).
  *
  * The zip member extraction is inherently a single stream, exactly as
  * in the reference — it happens once on the driver per (small) control
  * file. Payload rows immediately become distributed DataFrames
  * (`spark.createDataset(lines)` + `spark.read.json`); at 100 TB the
  * payload would land unzipped on object storage and be read with
  * `spark.read.json(path)` directly — this reader is the control-plane
  * path, not the bulk path.
  */
object ZipIngest {

  final case class ZipPayload(metadata: Map[String, String], entities: Map[String, DataFrame])

  /** Read a zip through the Hadoop FS API (works for file://, hdfs://,
    * s3a:// alike), returning parsed metadata and one DataFrame per
    * data member (member name without .json = entity name).
    */
  def read(spark: SparkSession, path: String): ZipPayload = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val zin = new ZipInputStream(fs.open(p))
    val members = mutable.Map[String, Vector[String]]()
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val reader = new BufferedReader(new InputStreamReader(zin, StandardCharsets.UTF_8))
          val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null).toVector
          members(entry.getName) = lines
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()

    val metadata = members.get("metadata.json").map(ls => parseMetadata(ls.mkString("\n"))).getOrElse(Map.empty)
    val entities = (members - "metadata.json").map { case (name, lines) =>
      import spark.implicits._
      val entity = name.stripSuffix(".json")
      entity -> spark.read.json(spark.createDataset(lines))
    }.toMap
    ZipPayload(metadata, entities)
  }

  /** metadata.json -> flat string map (workflow_system_name, company_id,
    * ... — the keys read at sqs_sensor_dag.py:100-103).
    */
  private[graft] def parseMetadata(json: String): Map[String, String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(json) match {
      case JObject(fields) =>
        fields.collect {
          case (k, JString(v)) => k -> v
          case (k, JInt(v))    => k -> v.toString
          case (k, JLong(v))   => k -> v.toString
          case (k, JDouble(v)) => k -> v.toString
          case (k, JBool(v))   => k -> v.toString
        }.toMap
      case _ => Map.empty
    }
  }
}
