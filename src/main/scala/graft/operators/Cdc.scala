package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture derivations: building slowly-changing-dimension
  * history (SCD type 2) from a keyed change log — the history-keeping
  * counterpart of the reference's overwrite-style sync jobs
  * (/root/reference/postgresql_mysql_sync_dag.py:73-81 persists only
  * the latest state; an auditable warehouse also wants every prior
  * version with its validity interval).
  */
object Cdc {

  /** SCD2 history from a change log: one row per (key, version) with
    * `[valid_from, valid_to)` validity and an `is_current` flag on the
    * open interval.
    *
    *  1. duplicate timestamps reduce last-write-wins by `seqCol`
    *     (max_by — same contract as the keyed point-update applier);
    *  2. no-op changes collapse: a row opens a version only if its
    *     value differs from the previous change's (runs keep their
    *     first row);
    *  3. `valid_to` = next version's `valid_from`; null ⇒ current.
    *
    * Scale shape: ONE shuffle on the key — the LWW aggregate and both
    * window passes (lag-compare, lead/row_number) share the same
    * partitioning, so Spark chains them in a single keyed stage. Work
    * per key is linear in that key's change count; no self-join, no
    * driver state. Values are carried, never recomputed —
    * cross-engine hash-exact.
    */
  def scd2History(df: DataFrame, keyCol: String, tsCol: String, valCol: String, seqCol: String): DataFrame = {
    val lww = df.groupBy(col(keyCol), col(tsCol).as("valid_from"))
      .agg(max_by(col(valCol), col(seqCol)).as("value"))
    val byTs = Window.partitionBy(keyCol).orderBy("valid_from")
    val changes = lww
      .withColumn("__prev", lag(col("value"), 1).over(byTs))
      // first row (__prev null) always opens; equal-value runs collapse
      .filter(col("__prev").isNull || col("value") =!= col("__prev"))
      .drop("__prev")
    changes
      .withColumn("version", row_number().over(byTs).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byTs))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col("value"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
