package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed point-update application — the Spark-native re-expression of
  * the reference's verified-data corrections applier
  * (/root/reference/sqs_sync_verified_data_dag.py:37-68): per message,
  * `UPDATE verified_{entity} SET ... WHERE company_id = ? AND
  * external_id = ?` [inferred from :52-58,61-67], at-least-once with
  * last-writer-wins.
  *
  * As a set operation: dedup the update stream to the latest update per
  * key (one shuffle on the key), then left-join onto the base table and
  * coalesce — no per-row driver loop, no point UPDATEs; at 100 TB both
  * sides shuffle-partition on the same key and the join is co-located.
  * In streaming this runs inside foreachBatch against a JDBC sink.
  */
object VerifiedUpdates {

  /** Apply `updates` to `base` by `keys`, last writer (max seqCol) wins
    * per key; `payload` maps base-column -> update-column carrying its
    * replacement value (null update values leave the base value).
    */
  def apply(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      seqCol: String,
      payload: Map[String, String],
  ): DataFrame = {
    // deterministic winner even when two updates share a seq value
    // (e.g. second-resolution timestamps): tie-break on the payload
    // columns, so a crash-replay of the same batch picks the same row
    val tieBreak = payload.values.toSeq.sorted.map(col(_).desc_nulls_last)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc +: tieBreak: _*)
    val latest = updates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select((keys.map(col) ++ payload.values.map(col)).toSeq: _*)
    val joined = base.join(latest, keys, "left")
    val applied = payload.foldLeft(joined) { case (df, (baseCol, updCol)) =>
      df.withColumn(baseCol, coalesce(col(updCol), col(baseCol)))
    }
    applied.select(base.columns.map(col).toSeq: _*)
  }
}
