package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with a typed metadata struct
  * (modality, declared size, source uri) — the schema a 100 TB
  * training-data lake uses: bytes stay columnar (parquet binary, never
  * driver-side), decode/feature-extract runs partition-parallel with
  * per-partition batch amortization (codec/model init once per
  * partition, not once per row — the JVM analog of a Pandas-UDF
  * `mapInPandas` batch loop).
  *
  * The actual codec is STUBBED (no image/audio libs in this container):
  * `decodeStub` derives deterministic pseudo-features from the raw
  * bytes. The Spark-side plumbing — schema, binary handling, typed
  * Dataset round-trip, partitioning, batch shape — is real and
  * oracle-tested (q48).
  */
object Multimodal {

  /** One media record: id + raw payload + metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], modality: String, declared_bytes: Long)

  /** Extracted features: byte stats standing in for codec output. */
  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      byte_sum: Long,
      head_byte: Long,
      feature: Array[Double],
  )

  /** Wrap a text table as media records (binary payload = utf-8 bytes):
    * the ingestion shape for real media, testable on TESTDATA.
    */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      lit("text/plain").as("modality"),
      length(col("text")).cast("long").as("declared_bytes"),
    )

  /** Deterministic fake "decode" — in production this is the codec /
    * model-forward call, initialized once per batch.
    */
  private def decodeStub(payload: Array[Byte]): Array[Double] = {
    val n = payload.length
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    Array(n.toDouble, sum.toDouble, (sum % 256).toDouble, if (n > 0) (payload(0) & 0xff).toDouble else 0.0)
  }

  /** Partition-parallel feature extraction with per-partition batching.
    * `batchSize` controls the amortization unit (the `mapInPandas` batch
    * analog); features are computed per batch, streamed out lazily.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 256): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "modality", "declared_bytes")
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init happens HERE (codec handles, model weights);
        // the stub has none, but the batch shape is the real contract.
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val feat = decodeStub(r.payload)
            MediaFeatures(
              doc_id = r.doc_id,
              modality = r.modality,
              n_bytes = r.payload.length.toLong,
              byte_sum = feat(1).toLong,
              head_byte = feat(3).toLong,
              feature = feat,
            )
          }
        }
      }
  }

  /** Frame-sampling stub: deterministic stride sampling over a byte
    * payload (stands in for video frame extraction — same partitioning
    * and explode shape as the real thing).
    */
  def sampleFrames(media: DataFrame, stride: Int = 64): DataFrame =
    media.select(
      col("doc_id"),
      posexplode(expr(s"transform(sequence(0, CAST((declared_bytes - 1) / $stride AS INT)), i -> i * $stride)"))
        .as(Seq("frame_idx", "byte_offset")),
    )

  /** Resize/downsample stub: keep every `factor`-th byte of the payload
    * (stands in for image resizing — the real codec call sits where the
    * slice loop is; schema, binary round-trip, and the narrow map shape
    * are the production contract).
    */
  def resize(media: DataFrame, factor: Int = 4): Dataset[(Long, Array[Byte], Long)] = {
    require(factor > 0, "factor must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "modality", "declared_bytes")
      .as[MediaRecord]
      .map { r =>
        val out = Array.ofDim[Byte]((r.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        (r.doc_id, out, out.length.toLong)
      }
  }
}
