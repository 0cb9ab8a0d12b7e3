package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the two shapes that break naive shuffle joins at
  * 100 TB: a selective small side (most fact rows will NOT match, yet a
  * plain join shuffles all of them) and a skewed key (one reducer gets
  * the hot key's entire partition while the rest idle).
  *
  * The reference outsources joins wholesale to Postgres/MySQL (SURVEY.md
  * §2.6 — postgresql_mysql_sync_dag.py hand-pushes one ranged scan and
  * lets the warehouse join); a warehouse has exactly these remedies
  * (bloom/zone pruning, hash distribution) built in, so a Spark
  * re-expression must supply them explicitly where Catalyst's automatic
  * versions cannot see the opportunity.
  */
object ScaleJoins {

  private val nameSeq = new AtomicLong()

  /** Semi join of `big` against `small`'s keys, pruned by a bloom filter
    * BEFORE the join's shuffle/broadcast machinery sees the big side.
    *
    * Shape: `bloom = agg(small)` runs as a distributed aggregate (each
    * task builds a partial filter over its partition, partials OR-merge;
    * no driver materialization of keys), delivered to the probe side as
    * a scalar subquery — the same delivery Spark's own
    * InjectRuntimeFilter uses, so the filter evaluates inside the big
    * side's scan stage and composes with whole-stage codegen. Rows that
    * fail `might_contain` never reach the exact semi join; false
    * positives (rate set by `numBits` vs distinct keys) are removed by
    * the exact semi join that follows, so the RESULT is bit-identical to
    * a plain `LEFT SEMI` — the bloom only cuts shuffled bytes.
    *
    * At the design point: a 2 M-key dimension at 8 bits/key is a 2 MB
    * filter against a 100 TB fact scan; with 1% fact selectivity the
    * pre-shuffle prune drops ~99% of shuffle traffic that the exact join
    * would otherwise move. Spark's automatic runtime filter fires only
    * under conf thresholds and creation-side-cost heuristics; this
    * operator is the explicit form for when the pipeline KNOWS the
    * selectivity (e.g. an entity-split fan-out joining one tenant's ids
    * against the full event log).
    *
    * `expectedItems`/`numBits` bound the filter (capped by Spark's
    * bloom-filter session limits); both sides' key expressions must be
    * bloom-hashable (xxhash64 is applied here, matching the aggregate's
    * expectation of a LONG hash).
    */
  def bloomPrunedSemiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long,
      numBits: Long): DataFrame = {
    val spark = big.sparkSession
    val id = nameSeq.incrementAndGet()
    val bigV = s"graft_bloom_big_$id"
    val smallV = s"graft_bloom_small_$id"
    big.createOrReplaceTempView(bigV)
    small.createOrReplaceTempView(smallV)
    try {
      // scalar subquery, not a collected literal: the filter bytes live
      // in the subquery's exchange, never in the plan/task binaries.
      val pruned = spark.sql(
        s"""SELECT b.* FROM $bigV b
           |WHERE graft_bloom_contains(
           |        (SELECT graft_bloom_agg(xxhash64(s.$smallKey),
           |                                CAST($expectedItems AS BIGINT),
           |                                CAST($numBits AS BIGINT))
           |         FROM $smallV s),
           |        xxhash64(b.$bigKey))""".stripMargin)
      // exact semi join over the survivors removes bloom false positives
      val dimKeys = small.select(col(smallKey)).distinct()
      pruned.join(dimKeys, pruned(bigKey) === dimKeys(smallKey), "left_semi")
    } finally {
      spark.catalog.dropTempView(bigV)
      spark.catalog.dropTempView(smallV)
    }
  }

  /** Inner equi-join with the fact side salted across `salts` reducers.
    *
    * The GENERAL form of [[Skew.saltedJoin]]: distinct key names on the
    * two sides (each side keeps its own key column in the output, as
    * with any expression join) and a caller-chosen `distributor` for
    * the salt — pick the cheapest unique column instead of hashing the
    * whole row. Use [[Skew.saltedJoin]] when both sides share the key
    * name and the USING-style merged key column is wanted.
    *
    * A shuffled hash/sort-merge join partitions both sides by the join
    * key, so one hot key (a null-like sentinel tenant, a bot user, a
    * default SKU) serializes its entire volume through one task. AQE's
    * skew-join split handles the sort-merge case but cannot help when
    * the join feeds a same-key aggregation, when the layout is bucketed,
    * or in a shuffled-hash plan. Salting is the layout-level remedy:
    *
    *  - fact rows get `salt = pmod(xxhash64(distributor), salts)` —
    *    `distributor` is any fact column with per-row spread (a line
    *    number, an event id); the hot key's rows now land on `salts`
    *    reducers instead of one;
    *  - every dim row is replicated once per salt value (an `explode` of
    *    a `sequence`, dim × salts rows — the knob trades dim replication
    *    for fact spread, so it fits dims that are small relative to the
    *    fact but too large or too dynamic to broadcast);
    *  - the join key becomes (key, salt), and every fact row still meets
    *    exactly the dim rows it met before, each exactly once — result
    *    multiset is IDENTICAL to the unsalted join, including duplicate
    *    dim keys.
    *
    * Deterministic: the salt is a pure hash of `distributor`, never a
    * partition id or a random draw, so replays and retries salt
    * identically (the streaming exactly-once contract elsewhere in this
    * engine relies on retried tasks producing identical rows).
    */
  def saltedEquiJoin(
      fact: DataFrame,
      factKey: String,
      distributor: Column,
      dim: DataFrame,
      dimKey: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = "__graft_salt"
    val salted = fact.withColumn(saltCol, pmod(xxhash64(distributor), lit(salts.toLong)))
    val replicated = dim.withColumn(saltCol, explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted
      .join(replicated,
        salted(factKey) === replicated(dimKey) && salted(saltCol) === replicated(saltCol),
        "inner")
      .drop(saltCol)
  }
}
