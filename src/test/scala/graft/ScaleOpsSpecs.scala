package graft

import graft.operators.{ScaleJoins, ZoneMap}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-10 scale operators: bloom-pruned semi join, salted skew
  * join, zone-map skipping. Each must be BIT-IDENTICAL to the plain
  * operator it accelerates (the pruning/salting is pure optimization),
  * and each must demonstrably do its scale job on data shaped to need
  * it (a bloom that prunes, a salt that spreads a hot key, a zone map
  * that skips zones).
  */
class ScaleJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toIndexedSeq.sorted

  test("bloomPrunedSemiJoin is bit-identical to a plain left-semi join") {
    val big = (1L to 5000L).map(i => (i % 400, s"payload$i")).toDF("k", "v")
    val small = Seq(7L, 13L, 42L, 399L, 1000L).toDF("sk") // 1000 matches nothing
    val got = ScaleJoins.bloomPrunedSemiJoin(big, "k", small, "sk", 1L << 12, 1L << 16)
    val want = big.join(small, big("k") === small("sk"), "left_semi")
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() > 0)
  }

  test("bloom semi join result is exact even when the filter is sized to false-positive heavily") {
    val big = (1L to 20000L).toDF("k")
    val small = (1L to 50L).map(_ * 397L).toDF("sk")
    // 64 bits for 50 keys: the bloom WILL pass wrong keys; the exact
    // semi join after it must still remove every false positive.
    val got = ScaleJoins.bloomPrunedSemiJoin(big, "k", small, "sk", 50L, 64L)
    val want = big.join(small, big("k") === small("sk"), "left_semi")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("bloom semi join disambiguates when both sides use the SAME key column name") {
    val big = (1L to 2000L).map(i => i % 97).toDF("k")
    val small = Seq(3L, 11L, 96L).toDF("k")
    val got = ScaleJoins.bloomPrunedSemiJoin(big, "k", small, "k", 1L << 10, 1L << 14)
    val want = big.join(small.withColumnRenamed("k", "sk"), col("k") === col("sk"), "left_semi")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("the bloom actually prunes: non-matching keys fail might_contain before any join") {
    // probe the registered kernels directly (scalar-subquery delivery,
    // the only form might_contain accepts): filter built over 100 keys,
    // probed with 10000 keys of which 100 match. A working bloom passes
    // the 100 members plus a small false-positive tail -- far below the
    // 10000 a broken (always-true) filter would pass.
    (0L until 100L).toDF("k").createOrReplaceTempView("bloom_keys")
    (0L until 10000L).toDF("p").createOrReplaceTempView("bloom_probe")
    val passed = try {
      spark.sql(
        """SELECT count(*) AS c FROM bloom_probe
          |WHERE graft_bloom_contains(
          |  (SELECT graft_bloom_agg(xxhash64(k), 100L, 4096L) FROM bloom_keys),
          |  xxhash64(p))""".stripMargin).head().getLong(0)
    } finally {
      spark.catalog.dropTempView("bloom_keys")
      spark.catalog.dropTempView("bloom_probe")
    }
    assert(passed >= 100, s"bloom dropped true members: $passed")
    assert(passed < 400, s"bloom passed $passed of 10000 - not pruning")
  }

  test("saltedEquiJoin is the identical multiset to the plain join, incl. duplicate dim keys") {
    // hot key 7 carries half the fact; dim has a DUPLICATE key so join
    // multiplicity (2 output rows per matching fact row) must survive
    val fact = ((1L to 1000L).map(i => (7L, i)) ++ (1L to 1000L).map(i => (i % 50, 10000L + i)))
      .toDF("k", "eid")
    val dim = (Seq((7L, "hot"), (7L, "hot2")) ++ (0L until 50L).map(i => (i, s"d$i")))
      .toDF("dk", "name")
    val got = ScaleJoins.saltedEquiJoin(fact, "k", col("eid"), dim, "dk", salts = 8)
    val want = fact.join(dim, fact("k") === dim("dk"), "inner")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("the salt spreads the hot key across all salts, deterministically across reruns") {
    val fact = (1L to 1000L).map(i => (7L, i)).toDF("k", "eid")
    val salted = fact.withColumn("s", pmod(xxhash64(col("eid")), lit(8L)))
    val spread = salted.select("s").distinct().count()
    assert(spread == 8, s"hot key landed on $spread of 8 salts")
    // determinism: the same rows salt identically on a second evaluation
    // (retry safety -- a partial recompute must not re-deal the cards)
    val a = salted.groupBy("s").count().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = salted.groupBy("s").count().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}

class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._
  import graft.api.TextCuration

  // near-dup clusters (shared sentences, small edits) + unrelated docs,
  // with heavy shared boilerplate so the full inverted index suffers
  private val docs = {
    val boiler = "all rights reserved terms of service apply to every page of this site"
    val bodies = Seq(
      s"the quick brown fox jumps over the lazy dog $boiler",
      s"the quick brown fox jumps over the lazy cat $boiler", // near-dup of 0
      s"the quick brown fox jumps over the lazy dog $boiler", // exact dup of 0
      s"completely different content about spark query planning and shuffles $boiler",
      s"another unrelated document mentioning catalyst optimizer internals $boiler",
      s"short text $boiler",
    )
    bodies.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("prefix-filtered Jaccard join equals the full inverted-index join at several thresholds") {
    for (t <- Seq(0.4, 0.6, 0.8)) {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b", "n_inter", "n_union")
          .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val full = canon(TextCuration.jaccardNearDups(docs, "doc_id", "text", t))
      val pref = canon(TextCuration.jaccardNearDupsPrefix(docs, "doc_id", "text", t))
      assert(pref === full, s"threshold $t")
      if (t == 0.6) assert(full.nonEmpty, "fixture must actually contain near-dups")
    }
  }

  test("the prefix actually prunes: fewer candidate pairs than the full index on boilerplate-heavy data") {
    val (prefPairs, fullPairs) = TextCuration.prefixCandidateStats(docs, "doc_id", "text", 0.8)
    assert(prefPairs < fullPairs,
      s"prefix candidates ($prefPairs) should undercut the full index ($fullPairs)")
  }
}

/** The corpus-probed df ceiling behind q26/q160
  * (TextCuration.jaccardNearDupsAuto / jaccardNearDupsPrefixAuto — the
  * r13 sf1 slope flags' lever): candidate volume stays within the
  * per-doc budget BY CONSTRUCTION on an adversarial fixed-vocabulary
  * corpus, the cap provably no-ops below the budget (the oracle-gate
  * regime), and an engaged cap trades only recall — reported pairs
  * keep their exact intersection counts and planted rare-shingle
  * near-dups survive any engaged ceiling.
  */
class CappedCandidateSpec extends SparkSpec {
  import spark.implicits._
  import graft.api.TextCuration

  /** Fixed-vocabulary corpus: every doc is `len` words drawn seeded
    * from `vocabSize` words — shingle vocabulary saturates while docs
    * grow, so full inverted-index candidate volume grows ~quadratically
    * (the q26/q160 sf1 regime). Two planted docs share a RARE
    * (unique-word) sentence: a true near-dup glued by df=2 shingles.
    */
  private def corpus(n: Int, vocabSize: Int = 12, len: Int = 20): DataFrame = {
    val rnd = new scala.util.Random(7)
    val base = (0 until n - 2).map { i =>
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(vocabSize)}").mkString(" "))
    }
    val planted = "zephyr quartz fjord waltz nymph vex jigsaw blitz glyph crwth dwarf pixel"
    base ++ Seq((n - 2L, planted), (n - 1L, planted + " extra"))
  }.toDF("doc_id", "text")

  private def canon(df: DataFrame): Set[String] =
    df.select("id_a", "id_b", "n_inter", "n_union")
      .collect().map(_.toSeq.mkString("|")).toSet

  test("below the budget the cap is a provable no-op: result equals the uncapped path verbatim") {
    val docs = corpus(120)
    val (auto, cap) = TextCuration.jaccardNearDupsAuto(docs, "doc_id", "text", 0.6,
      budgetPairsPerDoc = 1000000L)
    assert(cap == Long.MaxValue, s"whole corpus under budget must report no-op, got cap=$cap")
    assert(canon(auto) == canon(TextCuration.jaccardNearDups(docs, "doc_id", "text", 0.6)))
    val (autoP, capP) = TextCuration.jaccardNearDupsPrefixAuto(docs, "doc_id", "text", 0.6,
      budgetPairsPerDoc = 1000000L)
    assert(capP == Long.MaxValue)
    assert(canon(autoP) == canon(TextCuration.jaccardNearDupsPrefix(docs, "doc_id", "text", 0.6)))
  }

  test("capped candidate volume stays within the per-doc budget while the full index grows superlinearly") {
    val budget = 15L
    val small = corpus(300)
    val big = corpus(1500)
    val (cappedSmall, fullSmall, capSmall) =
      TextCuration.cappedCandidateStats(small, "doc_id", "text", budget)
    val (cappedBig, fullBig, capBig) =
      TextCuration.cappedCandidateStats(big, "doc_id", "text", budget)
    assert(capSmall != Long.MaxValue && capBig != Long.MaxValue,
      s"both sizes must engage the cap for a same-regime slope (got $capSmall/$capBig)")
    // the budget bound is structural: candidate pairs <= budget x docs
    assert(cappedBig <= budget * 1500,
      s"capped candidates ($cappedBig) must respect the volume budget (${budget * 1500})")
    // the uncapped join is the quadratic regime the cap exists for
    assert(fullBig > 2 * cappedBig,
      s"full index ($fullBig) should dwarf capped ($cappedBig) on the adversarial corpus")
    // growth across 5x docs: capped stays ~linear (<= 2x the data growth),
    // full grows faster than the data
    val dataGrowth = 5.0
    assert(cappedBig.toDouble / math.max(cappedSmall, 1L) <= 2.0 * dataGrowth,
      s"capped growth ${cappedBig.toDouble / math.max(cappedSmall, 1L)} must stay ~linear " +
        s"(small=$cappedSmall cap=$capSmall, big=$cappedBig cap=$capBig)")
    assert(fullBig.toDouble / fullSmall > dataGrowth,
      s"full-index growth ${fullBig.toDouble / fullSmall} should exceed data growth " +
        "(else the fixture lost its adversarial shape)")
  }

  test("an engaged cap keeps precision exact and rare-shingle near-dups: auto pairs are a value-identical subset") {
    val docs = corpus(300)
    val (auto, cap) = TextCuration.jaccardNearDupsAuto(docs, "doc_id", "text", 0.6,
      budgetPairsPerDoc = 8L)
    assert(cap != Long.MaxValue && cap >= 2,
      s"tight budget must engage the cap without dropping df=2 postings, got $cap")
    val full = canon(TextCuration.jaccardNearDups(docs, "doc_id", "text", 0.6))
    val got = canon(auto)
    assert(got.subsetOf(full),
      "every reported pair must carry the TRUE intersection/union (exact precision)")
    // the planted pair is glued by unique-sentence (df=2) shingles —
    // under any engaged ceiling >= 2 it must survive
    assert(auto.where(col("id_a") === 298L && col("id_b") === 299L).count() == 1,
      "rare-shingle near-dup must survive the cap")
    val (autoP, capP) = TextCuration.jaccardNearDupsPrefixAuto(docs, "doc_id", "text", 0.6,
      budgetPairsPerDoc = 8L)
    assert(capP != Long.MaxValue)
    assert(canon(autoP).subsetOf(full))
    assert(autoP.where(col("id_a") === 298L && col("id_b") === 299L).count() == 1)
  }
}

/** q163: the scale-join family composed into one plan. The pin is that
  * all three physical shapes — the zone gate's literal scan filter, the
  * bloom's scalar-subquery filter, the salt's (key, salt) join — appear
  * in the ONE executed plan, and the result equals the plain
  * filter+semi+join expression bit for bit.
  */
class FlagshipPlanSpec extends SparkSpec {

  test("q163 composes zone gate + bloom prune + salted join in one plan, result-identical to the plain expression") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val df = graft.queries.Advanced.flagshipPlan(t)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains") || plan.contains("bloom"),
      s"expected the bloom runtime filter in the plan:\n$plan")
    assert(plan.contains("__graft_salt"), s"expected the salted join in the plan:\n$plan")
    assert(plan.toLowerCase.contains("leftsemi"),
      s"expected the zone/bloom semi gates in the plan:\n$plan")
    val lo = to_timestamp(lit("1995-01-01")); val hi = to_timestamp(lit("1995-06-30"))
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = t.lineitem
      .filter(col("l_shipdate").between(lo, hi))
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))"))
          .cast("double").as("revenue"))
    val got = df.collect().map(_.toSeq.mkString("|")).sorted
    val want = plain.collect().map(_.toSeq.mkString("|")).sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }
}

/** SQL twins: beyond the shared oracle gate (CORRECTNESS), the twin and
  * its DSL original must agree with EACH OTHER on the same session —
  * the parser/analyzer path and the DataFrame path are one engine.
  */
class SqlTwinSpec extends SparkSpec {

  private val pairs = Seq(
    "q164_sql_agg" -> "q1_agg",
    "q165_sql_scan_filter" -> "q2_scan_filter",
    "q166_sql_topk_join" -> "q3_topk_join",
    "q167_sql_selective_agg" -> "q5_selective_agg",
    "q168_sql_semi_join" -> "q6_semi_join",
    "q169_sql_anti_join" -> "q7_anti_join",
    "q170_sql_distinct_agg" -> "q8_distinct_agg",
    "q171_sql_topk_sort" -> "q9_topk_sort",
    "q172_sql_window_rank" -> "q10_window_rank",
    "q173_sql_setops" -> "q12_setops",
    "q174_sql_pivot" -> "q14_pivot",
    "q175_sql_having" -> "q15_having",
    "q176_sql_scalar_date" -> "q17_scalar_date",
    "q177_sql_events_hourly" -> "q18_events_hourly",
    "q178_sql_grouping_sets" -> "q53_grouping_sets",
  )

  test("spark.sql twins return exactly their DataFrame originals' rows") {
    val dir = "/root/testdata/sf0.001"
    for ((twin, orig) <- pairs) {
      val got = graft.queries.QueryCatalog.byName(twin).fn(spark, dir)
        .collect().map(_.toSeq.mkString("|")).sorted
      val want = graft.queries.QueryCatalog.byName(orig).fn(spark, dir)
        .collect().map(_.toSeq.mkString("|")).sorted
      assert(got.sameElements(want), s"$twin != $orig")
      // HAVING-style twins can be legitimately empty at sf0.001; the
      // CORRECTNESS gate at sf0.01 covers the non-empty case
      assert(got.nonEmpty || want.isEmpty, s"$twin returned no rows")
    }
  }
}

class AutoPlanSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Skew

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toIndexedSeq.sorted

  // hot-key fact: key 7 carries ~80% of rows — the shape that
  // serializes one reducer in a plain shuffle join
  private val hotFact = ((1L to 8000L).map(i => (7L, i)) ++
    (1L to 2000L).map(i => (i % 500 + 100L, i + 100000L))).toDF("k", "rowid")
  private val dim = (1L to 700L).map(i => (i, s"dim$i")).toDF("dk", "dv")

  // imbalance depends on the session's shuffle-partition count (the
  // decision is relative to average reducer load), so the spec derives
  // the threshold from the live conf instead of assuming 32
  private def parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
  private def hotImbalance = 8000.0 * parts / 10000.0

  test("hot-key corpus: the salted path engages above the threshold and is result-identical to the plain join") {
    // broadcastMaxRows = 0 forces the measurement past the broadcast
    // shortcut, so the skew profile decides
    val (joined, d) = Skew.autoPlan(hotFact, "k", col("rowid"), dim, "dk",
      broadcastMaxRows = 0L, skewFactor = hotImbalance / 2)
    assert(d.strategy === "salted", d.toString)
    assert(d.salts > 1 && d.imbalance > hotImbalance / 2, d.toString)
    assert(d.maxKeyRows === 8000L && d.factRows === 10000L, d.toString)
    val want = hotFact.join(dim, hotFact("k") === dim("dk"), "inner")
    assert(sortedRows(joined) == sortedRows(want))
    // plan pin: the join physically runs on (key, salt)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"), s"expected a salted join plan:\n$plan")
  }

  test("uniform corpus: stays a plain shuffle join (no pointless dim replication)") {
    // 500 equal keys: hottest share = 1/500, imbalance = parts/500 << threshold
    val uniform = (1L to 10000L).map(i => (i % 500 + 100L, i)).toDF("k", "rowid")
    val (joined, d) = Skew.autoPlan(uniform, "k", col("rowid"), dim, "dk",
      broadcastMaxRows = 0L, skewFactor = hotImbalance / 2)
    assert(d.strategy === "plain", d.toString)
    val want = uniform.join(dim, uniform("k") === dim("dk"), "inner")
    assert(sortedRows(joined) == sortedRows(want))
    assert(!joined.queryExecution.executedPlan.toString.contains("__graft_salt"))
  }

  test("small dim: broadcasts regardless of fact skew (no fact shuffle at all)") {
    val (joined, d) = Skew.autoPlan(hotFact, "k", col("rowid"), dim, "dk")
    assert(d.strategy === "broadcast" && d.dimRows === 700L, d.toString)
    val want = hotFact.join(dim, hotFact("k") === dim("dk"), "inner")
    assert(sortedRows(joined) == sortedRows(want))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected a broadcast hash join:\n$plan")
  }

  test("salts scale with the measured imbalance, capped at maxSalts") {
    val (_, d) = Skew.autoPlan(hotFact, "k", col("rowid"), dim, "dk",
      broadcastMaxRows = 0L, skewFactor = hotImbalance / 2, maxSalts = 2)
    assert(d.salts === 2, d.toString) // ceil(imbalance) >= 2 -> capped at 2
    val (_, d2) = Skew.autoPlan(hotFact, "k", col("rowid"), dim, "dk",
      broadcastMaxRows = 0L, skewFactor = hotImbalance / 2, maxSalts = 10000)
    assert(d2.salts === math.ceil(d2.imbalance).toInt && d2.salts < 10000, d2.toString)
  }
}

/** Bucketed co-located joins: the pre-shuffled layout must (a) return
  * exactly the rows of the plain join and (b) plan WITHOUT exchanges —
  * the write-once-shuffle-never-again contract that matters when the
  * same big ⋈ big join runs every sync tick.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Bucketing

  test("same-count bucketed tables join with no Exchange and no Sort; result equals the plain join") {
    val a = (1L to 5000L).map(i => (i % 700, s"a$i")).toDF("k", "av")
    val b = (1L to 3000L).map(i => (i % 900, s"b$i")).toDF("bk", "bv")
    val ta = "graft_bucketspec_a"; val tb = "graft_bucketspec_b"
    try {
      Bucketing.writeBucketed(a, ta, "k", 8)
      Bucketing.writeBucketed(b, tb, "bk", 8)
      val joined = Bucketing.bucketedEquiJoin(spark, ta, tb, "k", "bk")
      // result identity with the plain (unbucketed) join
      val got = joined.collect().map(_.toSeq.mkString("|")).sorted
      val want = a.join(b, a("k") === b("bk")).collect().map(_.toSeq.mkString("|")).sorted
      assert(got.sameElements(want))
      // plan pin: SortMergeJoin directly over bucketed scans — the
      // shuffle was paid at write time, so no Exchange may appear (AQE
      // keeps the join un-exchanged; disable broadcast to force SMJ)
      val plan = withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        Bucketing.bucketedEquiJoin(spark, ta, tb, "k", "bk")
          .queryExecution.executedPlan.toString
      }
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan must be bucket-aware:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }

  private def withSqlConf[T](kv: (String, String)*)(body: => T): T = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

class ParetoSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Pareto
  import java.math.{BigDecimal => JBD}

  test("banded two-pass cumulative equals the naive global order, incl. ties and tiny bands") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(k => (k, BigDecimal(rnd.nextInt(100000)) / 100 + (k % 7))) // dup measures across keys
    val df = rows.toDF("k", "m").select(col("k"), col("m").cast("decimal(30,6)").as("m"))
    for (bw <- Seq(1L, 100L, 1000000L)) { // 1 = one band per unit; huge = ONE band (degenerates to the naive plan)
      val got = Pareto.abcClassify(df, "k", col("m"), bandWidth = bw)
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3))).sortBy(_._1)
      // naive reference: exact BigDecimal accumulation in (m desc, k) order
      val total = rows.map(_._2).sum
      var cum = BigDecimal(0)
      val want = rows.sortBy { case (k, m) => (-m, k) }.map { case (k, m) =>
        cum += m
        val abc = if (cum * 100 <= total * 70) "A" else if (cum * 100 <= total * 90) "B" else "C"
        (k, (new JBD(cum.bigDecimal.toString).doubleValue()) / (new JBD(total.bigDecimal.toString).doubleValue()), abc)
      }.sortBy(_._1)
      got.zip(want).foreach { case ((gk, gs, gc), (wk, ws, wc)) =>
        assert(gk == wk && gc == wc, s"bw=$bw key=$gk class $gc != $wc")
        assert(math.abs(gs - ws) < 1e-12, s"bw=$bw key=$gk share $gs != $ws")
      }
    }
  }

  test("null or negative measures fail loudly instead of silently vanishing / mis-banding") {
    val withNull = Seq((1L, Option(BigDecimal(10))), (2L, None), (3L, Option(BigDecimal(5))))
      .toDF("k", "m").select(col("k"), col("m").cast("decimal(30,6)").as("m"))
    val e1 = intercept[IllegalArgumentException] {
      Pareto.abcClassify(withNull, "k", col("m"), bandWidth = 10L)
    }
    assert(e1.getMessage.contains("non-null"))
    val withNeg = Seq((1L, BigDecimal(10)), (2L, BigDecimal(-3)))
      .toDF("k", "m").select(col("k"), col("m").cast("decimal(30,6)").as("m"))
    val e2 = intercept[IllegalArgumentException] {
      Pareto.abcClassify(withNeg, "k", col("m"), bandWidth = 10L)
    }
    assert(e2.getMessage.contains("non-negative"))
  }
}

class RollingActivesSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  test("coverage inversion equals the brute-force trailing-window distinct count, incl. gaps and window=1") {
    val rnd = new scala.util.Random(31)
    // sparse activity with day gaps: users 0..9 over ~40 days
    val rows = (1 to 300).map { i =>
      val day = rnd.nextInt(40) * (if (rnd.nextBoolean()) 1 else 3) % 40
      (rnd.nextInt(10).toLong, Timestamp.valueOf(f"2024-01-${day % 28 + 1}%02d ${rnd.nextInt(24)}%02d:00:00"))
    }
    val df = rows.toDF("user_id", "ts")
    for (w <- Seq(1, 7)) {
      val got = graft.operators.TimeSeries.rollingActives(df, "user_id", "ts", w)
        .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
      // brute force: for each activity day D, |{u : u active in [D-w+1, D]}|
      val ud = rows.map { case (u, ts) => (u, ts.toLocalDateTime.toLocalDate) }.distinct
      val days = ud.map(_._2).distinct
      val want = days.map { d =>
        d.toString -> ud.filter { case (_, ad) =>
          !ad.isAfter(d) && ad.isAfter(d.minusDays(w))
        }.map(_._1).distinct.size.toLong
      }.toMap
      assert(got === want, s"window=$w")
    }
  }
}

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1 to 3650).map { i =>
    (i / 100, i.toLong, s"row$i") // zone = i/100: 37 zones, values clustered by zone
  }.toDF("z", "x", "payload")

  test("build: one row per zone with exact min/max/count") {
    val zm = ZoneMap.build(df, col("z"), Seq("x"))
    assert(zm.count() == 37)
    val z5 = zm.filter(col("zone") === 5).head()
    assert(z5.getAs[Long]("min_x") == 500L && z5.getAs[Long]("max_x") == 599L
      && z5.getAs[Long]("zone_rows") == 100L)
  }

  test("prunedScan is bit-identical to the plain range filter, across range shapes") {
    val zm = ZoneMap.build(df, col("z"), Seq("x"))
    for ((lo, hi) <- Seq((250L, 449L), (1L, 3650L), (4000L, 5000L), (100L, 100L))) {
      val got = ZoneMap.prunedScan(df, col("z"), zm, "x", lit(lo), lit(hi))
        .collect().map(_.toSeq.mkString("|")).sorted
      val want = df.filter(col("x").between(lo, hi))
        .collect().map(_.toSeq.mkString("|")).sorted
      assert(got.sameElements(want), s"range [$lo,$hi]")
    }
  }

  test("rows whose zone expression is null still survive the gate (null-safe equality): bit-identical incl. a null zone") {
    // zone and tracked column are independent: a null tenant bucket can
    // still hold rows whose x is squarely in range. The <=> gate must
    // keep them; === would drop the whole null-zone group silently.
    val withNullZone = df.select(
      when(col("z") === 3, lit(null).cast("int")).otherwise(col("z")).as("z"),
      col("x"), col("payload"))
    val zm = ZoneMap.build(withNullZone, col("z"), Seq("x"))
    for ((lo, hi) <- Seq((250L, 449L), (310L, 360L), (1L, 3650L))) {
      val got = ZoneMap.prunedScan(withNullZone, col("z"), zm, "x", lit(lo), lit(hi))
        .collect().map(_.toSeq.mkString("|")).sorted
      val want = withNullZone.filter(col("x").between(lo, hi))
        .collect().map(_.toSeq.mkString("|")).sorted
      assert(got.sameElements(want), s"range [$lo,$hi] with null zone")
      assert(got.exists(_.startsWith("null|")) || lo > 399 || hi < 300,
        s"range [$lo,$hi] should include null-zone rows (x in 300..399)")
    }
  }

  test("incremental maintenance: per-batch builds folded with merge equal the from-scratch build") {
    val batches = Seq(
      df.filter(col("x") <= 1000),
      df.filter(col("x") > 1000 && col("x") <= 2500), // splits zones 10 and 25 across batches
      df.filter(col("x") > 2500))
    val folded = batches.map(b => ZoneMap.build(b, col("z"), Seq("x"))).reduce(ZoneMap.merge)
    val full = ZoneMap.build(df, col("z"), Seq("x"))
    val f = folded.collect().map(_.toSeq.mkString("|")).sorted
    val g = full.collect().map(_.toSeq.mkString("|")).sorted
    assert(f.sameElements(g))
    // and the merged map serves pruned scans identically
    val got = ZoneMap.prunedScan(df, col("z"), folded, "x", lit(950L), lit(1100L))
      .collect().map(_.toSeq.mkString("|")).sorted
    val want = df.filter(col("x").between(950L, 1100L)).collect().map(_.toSeq.mkString("|")).sorted
    assert(got.sameElements(want))
  }

  test("on a zone-partitioned layout the pruned scan skips partitions (static partition pruning), not just rows") {
    val dir = tmpDir("zonemap_layout").toString
    df.write.mode("overwrite").partitionBy("z").parquet(dir)
    val stored = spark.read.parquet(dir)
    val zm = ZoneMap.build(stored, col("z"), Seq("x"))
    val scan = ZoneMap.prunedScan(stored, col("z"), zm, "x", lit(250L), lit(449L))
    val got = scan.collect().map(r => (r.getAs[Long]("x"), r.getAs[String]("payload"))).sorted
    val want = df.filter(col("x").between(250L, 449L))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[String]("payload"))).sorted
    assert(got.sameElements(want))
    // the zone gate must reach the SCAN as a partition filter: the
    // literal IN over the live zones prunes files at PLANNING time —
    // the 100 TB behavior (non-overlapping zones are never opened),
    // visible as a non-empty PartitionFilters on the zone column
    val plan = scan.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l => l.contains("PartitionFilters") && l.contains("z#"))
    assert(scanLine.exists(l => !l.contains("PartitionFilters: []")),
      s"expected a static PartitionFilter on the zone column, got:\n$plan")
    assert(!plan.contains("Join"), s"the literal gate needs no join machinery:\n$plan")
  }

  test("streaming maintenance: chained batches converge to the full build; replay is idempotent; chain regression fails fast") {
    import graft.streaming.ZoneMapStream
    val dir = tmpDir("zonemap_stream").toString
    val batches = Seq(
      df.filter(col("x") <= 1200),
      df.filter(col("x") > 1200 && col("x") <= 2400),
      df.filter(col("x") > 2400))
    batches.zipWithIndex.foreach { case (b, i) =>
      ZoneMapStream.processBatch(b, i.toLong, col("z"), Seq("x"), dir)
    }
    def snap(): Seq[String] =
      ZoneMapStream.current(spark, dir).get.collect().map(_.toSeq.mkString("|")).toIndexedSeq.sorted
    val full = ZoneMap.build(df, col("z"), Seq("x"))
      .collect().map(_.toSeq.mkString("|")).toIndexedSeq.sorted
    assert(snap() == full)
    // replay of the newest batch (the structured-streaming replay
    // window) must re-install an identical snapshot
    ZoneMapStream.processBatch(batches(2), 2L, col("z"), Seq("x"), dir)
    assert(snap() == full)
    // a fresh checkpoint against the old store must fail fast, not fork
    val e = intercept[IllegalArgumentException] {
      ZoneMapStream.processBatch(batches(0), 0L, col("z"), Seq("x"), dir)
    }
    assert(e.getMessage.contains("chain regression"), e.getMessage)
  }

  test("ZoneMapStream end-to-end via MemoryStream: the live skip index matches a batch rebuild and serves pruned scans") {
    import graft.streaming.ZoneMapStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("zonemap_e2e").toString
    val in = MemoryStream[(Int, Long, String)]
    val q = ZoneMapStream.start(in.toDF().toDF("z", "x", "payload"),
      col("z"), Seq("x"), s"$dir/store", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      val all = (1 to 3650).map(i => (i / 100, i.toLong, s"row$i"))
      in.addData(all.take(1500)); q.processAllAvailable()
      in.addData(all.slice(1500, 2600)); q.processAllAvailable()
      in.addData(all.drop(2600)); q.processAllAvailable()
      val live = ZoneMapStream.current(spark, s"$dir/store").get
      val want = ZoneMap.build(df, col("z"), Seq("x"))
        .collect().map(_.toSeq.mkString("|")).sorted
      assert(live.collect().map(_.toSeq.mkString("|")).sorted.sameElements(want))
      val got = ZoneMap.prunedScan(df, col("z"), live, "x", lit(1200L), lit(1350L))
        .collect().map(_.toSeq.mkString("|")).sorted
      val plain = df.filter(col("x").between(1200L, 1350L)).collect().map(_.toSeq.mkString("|")).sorted
      assert(got.sameElements(plain))
    } finally q.stop()
  }

  test("a narrow range consults few zones, and the gate is a literal filter (no join machinery)") {
    val zm = ZoneMap.build(df, col("z"), Seq("x"))
    val live = zm.filter(col("max_x") >= 250L && col("min_x") <= 449L)
    assert(live.count() == 3, "zone envelope filter must keep only overlapping zones")
    val scan = ZoneMap.prunedScan(df, col("z"), zm, "x", lit(250L), lit(449L))
    val plan = scan.queryExecution.executedPlan.toString
    // the gate is a literal predicate: no join, no exchange anywhere
    // (on this local relation Catalyst folds it into the scan itself)
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"zone gate should be a pure filter over the scan, got:\n$plan")
  }
}
