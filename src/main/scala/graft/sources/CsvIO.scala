package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink with a pinned dialect — the interchange format the
  * reference's pipelines move between systems as flat files (its zip
  * ingest fans out per-entity flat files; see
  * /root/reference/parallelized_data_pipeline_dag.py:171 unzip + split
  * [inferred]). One explicit dialect on both sides makes the round trip
  * lossless: header on, RFC-4180-style doubled-quote escaping (not the
  * backslash default, which silently corrupts fields that END in a
  * backslash), ISO-8601 micros timestamps, and an explicit NULL
  * sentinel distinct from the empty string.
  *
  * Scale notes (100 TB):
  *  - [[read]] REQUIRES a schema: `inferSchema` is a full extra pass
  *    over every byte before the real scan — never acceptable at scale
  *    (and non-deterministic under sampling). CSV scans push filters
  *    but not column pruning benefits (row-major format) — land CSV,
  *    convert to parquet, query parquet; this module is the landing
  *    ramp, not the query path.
  *  - [[write]] emits one file per partition — `df.repartition(n)`
  *    upstream controls shard count/size exactly like the parquet
  *    sinks.
  */
object CsvIO {

  private val dialect = Map(
    "header" -> "true",
    "quote" -> "\"",
    // RFC 4180: escape a quote by doubling it. Spark's default escape
    // of backslash writes `\"` which its own reader only re-parses
    // with the matching option — pin both sides to the portable form.
    "escape" -> "\"",
    // NULL sentinel distinct from the empty string; empty strings take
    // the writer's default quoted-empty form, which the reader already
    // maps back to "" (overriding emptyValue on read would instead
    // yield the literal token). KNOWN in-band limitation (spec-pinned):
    // a data string equal to the sentinel itself reads back as NULL —
    // the writer has no Postgres-COPY-style backslash escaping to put
    // it out of band. Data that can contain literal "\N" belongs in
    // parquet/JSON, not CSV.
    "nullValue" -> "\\N",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "dateFormat" -> "yyyy-MM-dd",
    // the writer default TRIMS leading whitespace — fidelity demands
    // both sides keep every byte
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false",
  )

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").options(dialect).csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(dialect).schema(schema).csv(path)
}
