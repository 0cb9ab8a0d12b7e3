package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Change-data-capture derivations: building slowly-changing-dimension
  * history (SCD type 2) from a keyed change log — the history-keeping
  * counterpart of the reference's overwrite-style sync jobs
  * (/root/reference/postgresql_mysql_sync_dag.py:73-81 persists only
  * the latest state; an auditable warehouse also wants every prior
  * version with its validity interval).
  */
object Cdc {

  /** Snapshot reconciliation: diff two keyed table versions into
    * added / removed / changed rows — the validation step after a
    * migration, backfill, or CDC replication (the reference's sync
    * jobs have no way to PROVE the MySQL copy matches Postgres; this
    * is that proof, distributed).
    *
    * One full-outer shuffle join on the key; payloads compare via a
    * null-safe struct equality (no hashing — false equality is
    * impossible, and Catalyst compares binary-equal structs without
    * materializing strings). Unchanged rows are dropped: at scale the
    * diff is small and the output should be too.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty, "need key and compare columns")
    val aSide = a.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__a", struct(compareCols.map(col): _*)).select((keyCols :+ "__a").map(col): _*)
    val bSide = b.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__b", struct(compareCols.map(col): _*)).select((keyCols :+ "__b").map(col): _*)
    aSide.join(bSide, keyCols, "full_outer")
      .withColumn("status",
        when(col("__a").isNull, lit("added"))
          .when(col("__b").isNull, lit("removed"))
          .when(!(col("__a") <=> col("__b")), lit("changed")))
      .filter(col("status").isNotNull)
      .select((keyCols :+ "status").map(col): _*)
  }

  /** SCD2 history from a change log: one row per (key, version) with
    * `[valid_from, valid_to)` validity and an `is_current` flag on the
    * open interval.
    *
    *  1. duplicate timestamps reduce last-write-wins by `seqCol`
    *     (max_by — same contract as the keyed point-update applier);
    *  2. no-op changes collapse: a row opens a version only if its
    *     value differs from the previous change's (runs keep their
    *     first row). The comparison is null-safe (`<=>`): a transition
    *     TO null opens a version, and a null run collapses like any
    *     other run;
    *  3. `valid_to` = next version's `valid_from`; null ⇒ current.
    *
    * Scale shape: ONE shuffle on the key — the LWW aggregate and both
    * window passes (lag-compare, lead/row_number) share the same
    * partitioning, so Spark chains them in a single keyed stage. Work
    * per key is linear in that key's change count; no self-join, no
    * driver state. Values are carried, never recomputed —
    * cross-engine hash-exact.
    */
  /** Point-in-time (temporal) join: every fact row picks up the
    * dimension version valid AT its timestamp — the consumer side of
    * [[scd2History]], and the reason history is kept at all (reports
    * must see the dimension as it was, not as it is).
    *
    * Composition, not a non-equi join: union facts (tag 1) with
    * version-open rows (tag 0), ONE shuffle on the key, running
    * `last(ignoreNulls)` carries every dim column forward; dim rows
    * sort before facts at equal timestamps so `valid_from <= ts` is
    * inclusive (ASOF semantics — the same union trick as the as-of
    * join, proven against DuckDB's native ASOF JOIN by q94). At 100 TB
    * this is a single sort-merge pass; the naive inequality-join
    * formulation is a nested loop.
    *
    * `dim` must be unique per (key, `dimFromCol`) — scd2History output
    * is, by construction. Facts earlier than their key's first version
    * carry nulls. Fact and dim payload column names must not collide.
    *
    * Null semantics: the dim payload is carried as ONE struct through a
    * single `last(ignoreNulls)` — a version is matched atomically, so a
    * version whose payload column is legitimately NULL yields NULL for
    * that column (it does NOT inherit the previous version's value),
    * and one output row can never stitch fields from different
    * versions. This matches DuckDB ASOF: the joined row's own fields,
    * nulls included.
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCol: String, factTsCol: String, dimFromCol: String): DataFrame = {
    val factCols = facts.columns.toSeq.filterNot(c => c == keyCol || c == factTsCol)
    val carry = dim.columns.toSeq.filterNot(c => c == keyCol || c == dimFromCol)
    require(factCols.intersect(carry).isEmpty,
      s"fact/dim column collision: ${factCols.intersect(carry).mkString(", ")}")
    val dimStruct = StructType(carry.map(c => dim.schema(c)))
    val fSide = facts.select(
      Seq(col(keyCol), col(factTsCol).as("__t"), lit(1).as("__tag")) ++
        factCols.map(col) :+
        lit(null).cast(dimStruct).as("__d"): _*)
    val dSide = dim.select(
      Seq(col(keyCol), col(dimFromCol).as("__t"), lit(0).as("__tag")) ++
        factCols.map(c => lit(null).cast(facts.schema(c).dataType).as(c)) :+
        struct(carry.map(col): _*).as("__d"): _*)
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fSide.unionByName(dSide)
      .withColumn("__d", last(col("__d"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(Seq(col(keyCol), col("__t").as(factTsCol)) ++
        factCols.map(col) ++ carry.map(c => col("__d")(c).as(c)): _*)
  }

  def scd2History(df: DataFrame, keyCol: String, tsCol: String, valCol: String, seqCol: String): DataFrame = {
    val lww = df.groupBy(col(keyCol), col(tsCol).as("valid_from"))
      .agg(max_by(col(valCol), col(seqCol)).as("value"))
    val byTs = Window.partitionBy(keyCol).orderBy("valid_from")
    val changes = lww
      // lag over a struct: null ONLY at the first row, so a change TO
      // null still opens a version (null-safe <=> comparison) — a
      // bare lag(value) could not tell "first row" from "prev was null"
      .withColumn("__prev", lag(struct(col("value").as("v")), 1).over(byTs))
      .filter(col("__prev").isNull || !(col("value") <=> col("__prev")("v")))
      .drop("__prev")
    changes
      .withColumn("version", row_number().over(byTs).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byTs))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col("value"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
