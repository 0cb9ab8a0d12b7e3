package graft

import graft.operators.Skew
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Demonstrations-with-proof of the at-scale layout tools: bucketed
  * co-located joins (no shuffle in the join plan) and salted joins for
  * skew (identical results, spread partitioning).
  */
class ScaleSpecs extends SparkSpec {

  test("bucketed tables join without a shuffle exchange (co-located join)") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // at sf0.001 AQE would broadcast the small side (also shuffle-free,
    // but it hides the co-location proof); force the sort-merge path the
    // tables would take at fact-x-fact scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Tables(spark, "/root/testdata/sf0.001")
      graft.operators.Bucketing.writeBucketed(t.orders, s"$db.orders_b", "o_orderkey", 8)
      graft.operators.Bucketing.writeBucketed(t.lineitem, s"$db.lineitem_b", "l_orderkey", 8)
      val joined = graft.operators.Bucketing
        .bucketedEquiJoin(spark, s"$db.orders_b", s"$db.lineitem_b", "o_orderkey", "l_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum === t.lineitem.count())
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      // the join itself reads co-located buckets: no Exchange between
      // the scans and the SortMergeJoin (the only exchange is the
      // post-join aggregation's)
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("salted join equals the plain join exactly and spreads a hot key over all salts") {
    import spark.implicits._
    // hot key: 90% of rows share key 1
    val skewed = (1L to 2000L).map(i => (if (i % 10 == 0) i % 7 + 2 else 1L, i)).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g"))
      .toDF("k", "name")
    val plain = skewed.join(dim, "k")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
    assert(salted.columns.toSeq.sorted === plain.columns.toSeq.sorted)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "name").except(plain.select("k", "payload", "name")).isEmpty)
    assert(plain.select("k", "payload", "name").except(salted.select("k", "payload", "name")).isEmpty)
    // the hot key's rows really carry multiple salt values
    val saltSpread = skewed
      .withColumn("__salt", pmod(xxhash64(struct(skewed.columns.map(col).toSeq: _*)), lit(8)).cast("int"))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(saltSpread > 4, s"expected the hot key spread over most of 8 salts, got $saltSpread")
  }

  test("salted join leaves a user column named __salt intact") {
    import spark.implicits._
    val left = Seq((1L, "a", 42), (1L, "b", 43)).toDF("k", "payload", "__salt")
    val right = Seq((1L, "dim")).toDF("k", "name")
    val out = Skew.saltedJoin(left, right, "k", salts = 4)
    assert(out.columns.contains("__salt"))
    assert(out.select("__salt").collect().map(_.getInt(0)).sorted.toSeq === Seq(42, 43))
  }

  test("segment blocking (PassJoin) is exactly lossless on adversarial edits: shifts, indels, short strings") {
    import spark.implicits._
    import graft.operators.EditBlocking
    // strings engineered to break naive blocking: prefix edits, leading
    // insertions (position shifts), length straddles, all-short strings
    val strs = Seq(
      "abcdefghij", "Xbcdefghij", "abcdefgh", "zzabcdefghij", "abcdefghijkl",
      "ab", "ba", "a", "", "abcd", "dcba",
      "kettle", "kettles", "akettle", "kettlekettle", "settle", "rattle",
    ).zipWithIndex.map { case (s, i) => (i.toLong, s, "B") }
    val df = strs.toDF("id", "s", "b")
    // null id/string/block rows must be DROPPED (naive-join semantics:
    // null-propagating equality/levenshtein), never NPE the job
    val nullRows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(null, "kettle", "B"),
        org.apache.spark.sql.Row(900L, null, "B"),
        org.apache.spark.sql.Row(901L, "kettle", null)),
      org.apache.spark.sql.types.StructType(df.schema.map(_.copy(nullable = true))))
    for (k <- Seq(1, 2, 4)) {
      val got = EditBlocking.editPairs(df.unionByName(nullRows), "id", "s", "b", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
      val naive = (for {
        (ida, sa, _) <- strs; (idb, sb, _) <- strs if ida < idb
        d = levDist(sa, sb) if d <= k
      } yield (ida, idb, d.toLong)).sorted
      assert(got === naive, s"k=$k: segment blocking must equal the naive join")
    }
  }

  test("rankByPrefix equals a single total order for any key; sorted-neighborhood pairs are exactly the window") {
    import spark.implicits._
    import graft.operators.{EditBlocking, GlobalOrder}
    // keys engineered across prefix-bucket boundaries: shared prefixes,
    // empty-adjacent shorts, heavy one-prefix skew
    val rows = Seq(
      "apple", "applf", "apply", "b", "ba", "bb", "banana", "bananb",
      "z", "za", "zb", "zc", "zd", "ze", "zf", "zg",
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "k")
    val got = GlobalOrder.rankByPrefix(df, "k", "id", bucketChars = 1, "pos")
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.sortBy { case (id, s) => (s, id) }.zipWithIndex
      .map { case ((id, _), p) => id -> p.toLong }.toMap
    assert(got === want, "two-pass prefix rank must equal the global (key, id) order")

    for (w <- Seq(1, 3)) {
      val pairs = EditBlocking.sortedNeighborPairs(df, "id", "k", w, bucketChars = 1)
        .select("pos_a", "pos_b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val naive = (for {
        a <- 0 until rows.size; b <- (a + 1) to math.min(a + w, rows.size - 1)
      } yield (a.toLong, b.toLong)).sorted
      assert(pairs === naive, s"w=$w: pairs must be exactly the rank window, across bucket boundaries")
    }
  }

  test("skyline2d equals the brute-force dominance filter: random points, duplicate points, any bucket count / partitioning") {
    import spark.implicits._
    import graft.operators.Skyline
    val rnd = new scala.util.Random(13)
    // duplicates + collinear ties stress the strict-dominance edge cases
    val pts = Seq.fill(400)((rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble)) ++
      Seq((1.0, 40.0), (1.0, 40.0), (0.0, 49.0), (49.0, 0.0))
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
    val brute = pts.zipWithIndex.collect { case ((x, y), i) if !pts.exists { case (qx, qy) =>
      qx <= x && qy <= y && (qx < x || qy < y) } => i.toLong }.toSet
    for (buckets <- Seq(1, 7, 64); parts <- Seq(1, 13)) {
      val got = Skyline.skyline2d(df.repartition(parts), "x", "y", nBuckets = buckets)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got === brute, s"buckets=$buckets parts=$parts")
    }
    // duplicate frontier points survive TOGETHER (neither strictly dominates)
    val dupIds = pts.zipWithIndex.filter(_._1 == (1.0, 40.0)).map(_._2.toLong)
    if (dupIds.forall(brute.contains))
      assert(dupIds.size === 2, "both duplicates stay when on the frontier")
    val e = intercept[IllegalArgumentException] {
      Skyline.skyline2d(df.unionByName(Seq((999L, null.asInstanceOf[java.lang.Double], 1.0))
        .toDF("id", "x", "y")), "x", "y")
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("rankByPrefix: supplementary-plane keys rank in UTF-8 byte order; null keys are rejected by name") {
    import spark.implicits._
    import graft.operators.GlobalOrder
    // U+FFFD (3-byte UTF-8, ef bf bd) vs U+10400 (4-byte, f0 90 90 80):
    // Scala's UTF-16 String order puts the surrogate-pair char FIRST
    // (d801 < fffd), UTF-8 byte order puts it LAST (f0 > ef) — the
    // driver-side bucket offsets must follow the executor-side order
    val rows = Seq((1L, "�a"), (2L, "𐐀b"), (3L, "ascii"))
    val df = rows.toDF("id", "k")
    val got = GlobalOrder.rankByPrefix(df, "k", "id", bucketChars = 1, "pos")
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: Spark's own global order over the same frame
    val want = df.orderBy(col("k"), col("id")).select("id").collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
    assert(got === want, "bucket offsets must agree with Spark's binary string order")
    assert(got(2L) === 2L, "supplementary-plane key sorts LAST in UTF-8 byte order")
    val e = intercept[IllegalArgumentException] {
      GlobalOrder.rankByPrefix(
        (rows :+ (4L, null.asInstanceOf[String])).toDF("id", "k"), "k", "id", 1, "pos")
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) => if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q59 compound blocking is lossless vs the naive brand-only join AND shrinks the max block") {
    val dir = "/root/testdata/sf0.001"
    val blocked = queries.QueryCatalog.byName("q59_fuzzy_match").fn(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val p = Tables(spark, dir).part
      .filter(col("p_partkey") < 500).select("p_partkey", "p_brand", "p_name")
    val a = p.select(col("p_partkey").as("part_a"), col("p_brand").as("brand"), col("p_name").as("name_a"))
    val b = p.select(col("p_partkey").as("part_b"), col("p_brand").as("brand"), col("p_name").as("name_b"))
    val naive = a.join(b, Seq("brand"))
      .filter(col("part_a") < col("part_b"))
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_dist") <= 4)
      .select("part_a", "part_b", "brand", "edit_dist")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(blocked.toSeq === naive.toSeq, "blocking must not change the result set")
    // cardinality bound: candidate pairs per (brand, band) block stay well
    // under the brand-only block's (the quadratic term the blocking caps)
    def maxPairs(groups: Seq[String]): Long = p
      .withColumn("band", floor(length(col("p_name")) / 8))
      .groupBy(groups.map(col): _*).count()
      .agg(max((col("count") * (col("count") - 1) / 2).cast("long"))).collect()(0).getLong(0)
    // this testdata's part names are near-uniform in length (7-12 chars)
    // so banding only trims here; the hard per-block bound at scale is
    // the segment-blocking spec above (q62)
    val brandOnly = maxPairs(Seq("p_brand"))
    val compound = maxPairs(Seq("p_brand", "band"))
    assert(compound < brandOnly,
      s"compound blocks ($compound pairs) must be smaller than brand blocks ($brandOnly)")
  }

  test("dynamic partition overwrite: re-ingesting one day replaces that day only; append would duplicate, static would truncate") {
    import spark.implicits._
    val dir = tmpDir("dynpart").resolve("t").toString
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"))
    val day2 = Seq((3L, "2024-01-02", "c"))
    graft.operators.Layout.overwritePartitions(
      (day1 ++ day2).toDF("id", "day", "v"), dir, Seq("day"))
    // replay day 2 with corrected content — day 1 must survive untouched
    val day2fix = Seq((3L, "2024-01-02", "c2"), (4L, "2024-01-02", "d"))
    graft.operators.Layout.overwritePartitions(day2fix.toDF("id", "day", "v"), dir, Seq("day"))
    // partition values type-infer to DATE on read; compare as strings
    val got = spark.read.parquet(dir)
      .selectExpr("id", "CAST(day AS STRING) AS day", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c2"), (4L, "2024-01-02", "d")))
    // and replaying the identical batch is a no-op (idempotent ingestion)
    graft.operators.Layout.overwritePartitions(day2fix.toDF("id", "day", "v"), dir, Seq("day"))
    assert(spark.read.parquet(dir).count() === 4L)
  }

  test("compaction merges a fragmented parquet dir to the byte-target file count, rows exactly preserved") {
    import spark.implicits._
    val dir = tmpDir("compact").resolve("t").toString
    val df = (1L to 20000L).map(i => (i, s"row_$i")).toDF("id", "s")
    df.repartition(64).write.parquet(dir) // 64 small files
    val bytes = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.getName.endsWith(".parquet")).map(_.length()).sum
    // target a quarter of the data per file -> expect ceil(bytes/target) = 4
    val (before, after) = graft.operators.Layout.compact(spark, dir, targetBytes = (bytes + 3) / 4)
    assert(before === 64)
    assert(after === ((bytes + (bytes + 3) / 4 - 1) / ((bytes + 3) / 4)).toInt)
    assert(after <= 5 && after >= 1, s"after=$after")
    val back = spark.read.parquet(dir)
    assert(back.count() === 20000L)
    assert(back.exceptAll(df).count() === 0L && df.exceptAll(back).count() === 0L)
    // idempotent-ish: compacting again at a huge target -> 1 file, same rows
    val (_, one) = graft.operators.Layout.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(one === 1)
    assert(spark.read.parquet(dir).count() === 20000L)
  }

  test("z-order clustering shrinks per-partition (x,y) bounding boxes vs a hash shuffle (file-skipping locality)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uniform 2-D grid: both dims 0..255, 64k rows, 16 partitions
    val df = (0 until 65536).map(i => (i % 256, i / 256)).toDF("x", "y")

    def totalBboxArea(parts: org.apache.spark.sql.DataFrame): Long =
      parts.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(sum("area")).collect()(0).getLong(0)

    val zed = graft.operators.Layout.zorder(df, "x", "y", bits = 8, nParts = 16)
    val hashed = df.repartition(16, col("x"), col("y"))
    val zArea = totalBboxArea(zed)
    val hashArea = totalBboxArea(hashed)
    // hash shuffle: every partition spans ~the full space (16 * 64k).
    // z-order: 16 partitions tile the space (total ~= 64k + boundary
    // slack). Require at least 4x shrinkage — actual is ~16x.
    assert(zArea * 4 <= hashArea, s"z=$zArea hash=$hashArea")
    // and the layout is only a reshuffle: same rows exactly
    assert(zed.exceptAll(df).count() === 0L && df.exceptAll(zed).count() === 0L)
  }
}

/** The skew story the 100 TB design leans on ("skewed keys → AQE
  * skew-join") must actually activate, not just be claimed: a
  * pathological key and thresholds scaled to spec size make AQE's
  * OptimizeSkewedJoin split the hot partition, and the result stays
  * exact. Runs on `spark.newSession()` so the lowered thresholds
  * never leak into the shared test session.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a pathologically skewed shuffle-join partition (skew=true in the final plan); result exact") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // scale the 256 MB-class production thresholds down to spec size so
    // a ~MB hot partition counts as skewed
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // enough partitions that the median partition is small next to the
    // hot one, and no coalescing (it would merge the comparison away)
    s.conf.set("spark.sql.shuffle.partitions", "16")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // force a shuffle join: broadcast would dodge the skew machinery
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    // left: 200k rows, 75% on key 0 (the bot key); the payload is an
    // INCOMPRESSIBLE per-row hash — a constant pad would lz4 away and
    // the hot partition's compressed size would never cross the
    // threshold the skew detector reads
    val left = s.range(200000L).selectExpr(
      "CASE WHEN id % 4 < 3 THEN CAST(0 AS BIGINT) ELSE id % 97 END AS k",
      "md5(CAST(id AS STRING)) AS pad")
    val right = s.range(97L).selectExpr("id AS k", "id * 10 AS v")
    // pad stays in the output so column pruning can't drop it from the shuffle
    val joined = left.join(right, "k").select("k", "pad", "v")
    // execute THIS dataset (collect), so its own QueryExecution carries
    // the final adaptive plan — an agg on top would execute a new one
    val rows = joined.collect()
    assert(rows.length === 200000)
    val expSum = (0L until 200000L).map(i => if (i % 4 < 3) 0L else (i % 97) * 10).sum
    assert(rows.map(_.getLong(2)).sum === expSum)
    // the FINAL adaptive plan must have split the hot partition
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), "plan not adaptive-final")
    assert(plan.contains("skew=true"), s"AQE skew split did not activate:\n${plan.take(2000)}")
  }
}

/** Hot-key behavior of the two per-group ordered folds the catalog
  * runs: the funnel (per USER — one bot key can be unbounded, so the
  * implementation must not buffer a key's events) and the bigram-LM
  * score (per DOCUMENT — structurally bounded by the doc's own
  * length, pinned here at a pathological length).
  */
class FunnelHotKeySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("staged-min funnel == greedy left fold on adversarial orderings") {
    // every advancement subtlety: stage skipping (3 before 2), repeats,
    // ties broken by seq, codes outside 1..3, progress after regression
    val rows = Seq(
      // user 1: full funnel with noise and out-of-order temptations
      (1L, t("2024-01-01 00:00:00"), 1L, 3), // code 3 before stage 1: no-op
      (1L, t("2024-01-01 00:00:01"), 2L, 1), // -> stage 1
      (1L, t("2024-01-01 00:00:02"), 3L, 0), // noise
      (1L, t("2024-01-01 00:00:03"), 4L, 2), // -> stage 2
      (1L, t("2024-01-01 00:00:03"), 5L, 3), // same ts, later seq -> stage 3
      // user 2: stage-2 event only BEFORE its stage-1 match
      (2L, t("2024-01-01 00:00:00"), 6L, 2),
      (2L, t("2024-01-01 00:00:01"), 7L, 1),
      (2L, t("2024-01-01 00:00:02"), 8L, 1), // repeat 1: still stage 1
      // user 3: no qualifying codes at all
      (3L, t("2024-01-01 00:00:00"), 9L, 0),
    ).toDF("user_id", "ts", "event_id", "code")
    val got = graft.operators.Funnel.stages(rows, "user_id", "ts", "event_id", "code", maxStage = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // oracle: the literal greedy fold, computed in Scala
    val want = rows.collect()
      .groupBy(_.getLong(0))
      .map { case (u, evs) =>
        val codes = evs.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2))).map(_.getInt(3))
        u -> ((evs.length.toLong,
          codes.foldLeft(0L)((s, c) => if (c == s + 1) s + 1 else s)))
      }
    assert(got === want)
  }

  test("hot key: one user with 200k events completes with constant per-key state (no list buffering)") {
    // a bot key: 200k noise events, the funnel codes buried inside.
    // The staged-min plan aggregates them map-side; nothing collects
    // the key's event list into one task buffer.
    val n = 200000
    val hot = spark.range(n.toLong).selectExpr(
      "CAST(42 AS BIGINT) AS user_id",
      "timestamp_micros(1700000000000000 + id * 1000) AS ts",
      "id AS event_id",
      // codes 1,2,3 appear once each, in order, at sparse positions
      s"CAST(CASE id WHEN 1000 THEN 1 WHEN ${n / 2} THEN 2 WHEN ${n - 5} THEN 3 ELSE 0 END AS INT) AS code")
    val out = graft.operators.Funnel.stages(hot, "user_id", "ts", "event_id", "code", maxStage = 3)
      .collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === n.toLong && out(0).getLong(2) === 3L)
    // the plan must contain NO collect_list-style buffering aggregate
    val plan = graft.operators.Funnel.stages(hot, "user_id", "ts", "event_id", "code", maxStage = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), "funnel plan buffers per-key event lists")
  }
}

class LmHotDocSpec extends SparkSpec {
  import spark.implicits._

  test("bigram-LM fold is bounded by ONE document's length: a 100k-token doc scores correctly") {
    // per-doc state is the doc's own (pos, p) list — prove the
    // pathological single-doc case completes and folds exactly
    val longDoc = (0 until 100000).map(i => s"w${i % 7}").mkString(" ")
    val docs = Seq((1L, longDoc), (2L, "w0 w1 w2")).toDF("doc_id", "text")
    val out = graft.api.TextCuration.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_bigrams") === 99999L)
    assert(out(1).getAs[Long]("n_bigrams") === 2L)
    // probabilities are well-formed and the mean sits inside [min, 1]
    val avg = out(0).getAs[Double]("avg_prob")
    val mn = out(0).getAs[Double]("min_prob")
    assert(mn > 0.0 && mn <= avg && avg <= 1.0)
  }
}
