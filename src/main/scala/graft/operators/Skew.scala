package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key carries a disproportionate share of rows (hot
  * tenant, null-ish default key), a plain shuffle join lands the whole
  * key on one reducer. Salting splits each hot key into `salts`
  * sub-keys: the skewed (large) side gets a deterministic per-row salt,
  * the other side is replicated once per salt value, and the join runs
  * on (key, salt) — the hot key now spreads over `salts` reducers.
  *
  * AQE's skew-join handling (on by default in Engine.session) covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * aggregations and for joins AQE can't split (e.g. bucketed inputs or
  * hash joins), so the engine ships both.
  */
object Skew {

  /** Equi-join `skewed` (large, hot-keyed) with `other` on `key`,
    * spreading each key over `salts` reducers. Result equals
    * `skewed.join(other, key)` exactly; only the physical distribution
    * changes. The salt is deterministic (hash of the whole row), so
    * replays produce identical partitioning.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = skewed.withColumn(
      "__salt", pmod(xxhash64(struct(skewed.columns.map(col).toSeq: _*)), lit(salts)).cast("int"))
    val replicatedRight = other.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
