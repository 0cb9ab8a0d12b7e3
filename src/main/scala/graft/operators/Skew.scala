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
    // pick a salt column name neither input owns (a user __salt column
    // must survive the join untouched)
    val taken = (skewed.columns ++ other.columns).toSet
    val salt = Iterator.from(0).map(i => s"__graft_salt$i").find(!taken.contains(_)).get
    // salt from hashable columns only (hash() rejects MapType); the join
    // key itself is always hashable, so the set is never empty
    val hashable = skewed.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    val saltedLeft = skewed.withColumn(
      salt, pmod(xxhash64(struct(hashable: _*)), lit(salts)).cast("int"))
    val replicatedRight = other.withColumn(
      salt, explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, salt)).drop(salt)
  }
}
