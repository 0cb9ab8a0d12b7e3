package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * USING-style convenience (same key name both sides, merged key
    * column in the output, no distributor to choose). For distinct key
    * names or a cheaper explicit salt distributor, use the general
    * [[ScaleJoins.saltedEquiJoin]].
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

  /** Key-skew diagnostic — the measurement that decides whether
    * [[saltedJoin]] (or AQE's skew split) is needed at all: for a
    * prospective join/group key, the top-`topK` hottest keys with their
    * row share, plus corpus-wide concentration stats (key count, row
    * count, max and exact-p99 multiplicity, Gini coefficient of the key
    * distribution; Gini 0 = uniform, → 1 = one key owns everything).
    *
    * Exactness at scale: everything derives from the
    * frequency-of-frequency table (multiplicity → how many keys have
    * it), whose size is bounded by the max multiplicity, not the key
    * count — so the only ordered window runs over that tiny table,
    * never a global sort of keys. A tie block of `k` keys sharing
    * multiplicity `c` contributes ranks (cumk−k+1)..cumk, whose rank
    * sum is (2·cumk−k+1)·k/2 — kept doubled (S2 = Σ c·(2·cumk−k+1)·k,
    * always an integer) so Gini = (S2 − (n+1)·T) / (n·T) is a ratio of
    * exact DECIMAL(38,0)s with ONE IEEE division: bit-identical on any
    * partitioning. p99 multiplicity uses the same
    * ceil-position-on-cumulative-counts definition as
    * [[Stats.histogramQuantiles]].
    *
    * Returns topK rows: (key..., cnt, share, n_keys, n_rows, max_cnt,
    * p99_cnt, gini) — summary columns repeated per row.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val f = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).cast("long").as("cnt"))
    val ff = f.groupBy("cnt").agg(count(lit(1)).cast("long").as("k"))
    // |distinct multiplicities| rows: a single-partition window here is
    // safe at any corpus scale (bounded by max multiplicity)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cnt"))
    val c = ff.withColumn("cumk", sum("k").over(w))
    val summary = c.selectExpr(
      "CAST(cnt AS DECIMAL(38,0)) * CAST(2 * cumk - k + 1 AS DECIMAL(38,0)) * CAST(k AS DECIMAL(38,0)) AS s2p",
      "cnt", "k", "cumk")
      .agg(
        sum("s2p").as("s2"),
        sum("k").cast("long").as("n_keys"),
        sum(col("cnt") * col("k")).cast("long").as("n_rows"),
        max("cnt").as("max_cnt"))
    val p99 = c.crossJoin(broadcast(summary.select("n_keys")))
      .filter(expr("cumk >= (n_keys * 9900 + 9999) DIV 10000"))
      .agg(min("cnt").as("p99_cnt"))
    val g = summary.crossJoin(broadcast(p99)).selectExpr(
      "n_keys", "n_rows", "max_cnt", "p99_cnt",
      "CAST(s2 - CAST(n_keys + 1 AS DECIMAL(38,0)) * CAST(n_rows AS DECIMAL(38,0)) AS DOUBLE) " +
        "/ CAST(CAST(n_keys AS DECIMAL(38,0)) * CAST(n_rows AS DECIMAL(38,0)) AS DOUBLE) AS gini")
    f.orderBy(col("cnt").desc, col(keyCol)).limit(topK)
      .crossJoin(broadcast(g))
      .withColumn("share", col("cnt").cast("double") / col("n_rows").cast("double"))
      .select((Seq(col(keyCol), col("cnt"), col("share")) ++
        Seq("n_keys", "n_rows", "max_cnt", "p99_cnt", "gini").map(col)): _*)
  }

  /** What [[autoPlan]] decided and the measurements that decided it —
    * returned alongside the joined frame so pipelines can log/assert the
    * routing instead of trusting it blindly.
    *
    * `strategy` ∈ {"broadcast", "salted", "plain"}; `imbalance` is the
    * hot key's row count divided by the average per-reducer load
    * (n_rows / shuffle partitions) — 1.0 means the hot key fills exactly
    * one average reducer, `skewFactor`× that engages salting.
    */
  final case class AutoPlanDecision(
      strategy: String,
      dimRows: Long,
      factRows: Long,
      maxKeyRows: Long,
      imbalance: Double,
      salts: Int)

  /** The closed skew loop: measure, then pick the join plan the
    * measurements justify — the diagnostic ([[keySkewProfile]]) and the
    * mitigations ([[ScaleJoins.saltedEquiJoin]], broadcast) wired
    * together instead of left as separate manual tools.
    *
    * Decision procedure (each step one control-plane-bounded job):
    *
    *  1. `dim.count() <= broadcastMaxRows` → '''broadcast''' the dim:
    *     no fact shuffle at all, skew irrelevant. The row cap is the
    *     caller's safety contract exactly as in
    *     [[graft.api.VectorSearch]]'s byte-aware guard — default 1 M
    *     rows stays well under executor memory for any sane dim width.
    *  2. Otherwise profile the fact key ([[keySkewProfile]], topK=1 —
    *     one keyed count + the tiny frequency-of-frequency pass) and
    *     compute `imbalance = max_cnt / (n_rows / shufflePartitions)`:
    *     how many average reducer loads the hottest key alone carries.
    *     Above `skewFactor` → '''salted''' via
    *     [[ScaleJoins.saltedEquiJoin]], with
    *     `salts = ceil(imbalance)` capped at `maxSalts` — just enough
    *     replication to bring the hot key back to ~average load, never
    *     a blanket dim × 64 blowup on mild skew.
    *  3. Else → '''plain''' shuffle join (AQE still handles residual
    *     runtime skew in the sort-merge case).
    *
    * All three branches produce the IDENTICAL inner-join multiset with
    * the same column layout (fact columns then dim columns, both key
    * columns kept); only the physical distribution differs. The
    * measurement jobs are deterministic, so replays route identically.
    *
    * At 100 TB the two measurement jobs cost one scan of the dim and
    * one partial-agged keyed count of the fact — noise against a
    * mis-planned hot-key join that serializes terabytes through one
    * reducer, which is the failure this closes out.
    */
  def autoPlan(
      fact: DataFrame,
      factKey: String,
      distributor: Column,
      dim: DataFrame,
      dimKey: String,
      broadcastMaxRows: Long = 1000000L,
      skewFactor: Double = 4.0,
      maxSalts: Int = 64): (DataFrame, AutoPlanDecision) = {
    require(broadcastMaxRows >= 0, s"broadcastMaxRows must be >= 0: $broadcastMaxRows")
    require(skewFactor > 0, s"skewFactor must be positive: $skewFactor")
    require(maxSalts >= 2, s"maxSalts must be >= 2: $maxSalts")
    val dimRows = dim.count()
    if (dimRows <= broadcastMaxRows) {
      val joined = fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "inner")
      (joined, AutoPlanDecision("broadcast", dimRows, -1L, -1L, 0.0, 1))
    } else {
      val prof = keySkewProfile(fact, factKey, topK = 1)
        .select(col("max_cnt"), col("n_rows")).collect()
      val (maxCnt, nRows) =
        if (prof.isEmpty) (0L, 0L) else (prof(0).getLong(0), prof(0).getLong(1))
      val parts = fact.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      val imbalance =
        if (nRows == 0L) 0.0 else maxCnt.toDouble * parts.toDouble / nRows.toDouble
      if (imbalance > skewFactor) {
        val salts = math.min(maxSalts.toLong, math.ceil(imbalance).toLong).toInt
        val joined = ScaleJoins.saltedEquiJoin(fact, factKey, distributor, dim, dimKey, salts)
        (joined, AutoPlanDecision("salted", dimRows, nRows, maxCnt, imbalance, salts))
      } else {
        val joined = fact.join(dim, fact(factKey) === dim(dimKey), "inner")
        (joined, AutoPlanDecision("plain", dimRows, nRows, maxCnt, imbalance, 1))
      }
    }
  }
}
