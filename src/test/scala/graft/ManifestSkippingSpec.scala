package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** The injected optimizer rule ([[graft.plans.ManifestSkipping]]):
  * automatic planning-time file skipping for filters over
  * manifest-tracked scans, with every safety guard pinned — foreign
  * scans untouched, unsupported predicate shapes untouched, results
  * bit-identical to the unpruned plan.
  */
class ManifestSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** Files the OPTIMIZED plan will open — the rule's observable. */
  private def plannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Seq.empty
      }
    }.flatten

  private def mkTable(n: Int = 1000, files: Int = 5): String = {
    val dir = tmpDir("skiprule").toString
    val df = (1 to n).map(i => (i.toLong, s"s${i % 13}", i * 1.5)).toDF("id", "cat", "v")
    ManifestTable.commit(df.repartitionByRange(files, $"id"), dir, track = Seq("id", "cat"))
    dir
  }

  test("range filter over a snapshot prunes files, result identical to unpruned") {
    val dir = mkTable()
    val snap = ManifestTable.snapshot(spark, dir)
    val q = snap.filter($"id".between(100L, 199L))
    val all = plannedFiles(snap)
    val pruned = plannedFiles(q)
    assert(all.size == 5)
    assert(pruned.size < all.size, s"must skip files (${pruned.size}/${all.size})")
    val expect = spark.conf.get("spark.graft.manifestSkipping.enabled", "true")
    try {
      spark.conf.set("spark.graft.manifestSkipping.enabled", "false")
      val off = ManifestTable.snapshot(spark, dir).filter($"id".between(100L, 199L))
      assert(plannedFiles(off).size == all.size, "conf off => no pruning")
      assert(q.orderBy("id").collect().toSeq == off.orderBy("id").collect().toSeq)
    } finally spark.conf.set("spark.graft.manifestSkipping.enabled", expect)
  }

  test("equality and IN prune; strict bounds prune the boundary file") {
    val dir = mkTable()
    val snap = ManifestTable.snapshot(spark, dir)
    assert(plannedFiles(snap.filter($"id" === 42L)).size == 1)
    assert(plannedFiles(snap.filter($"id".isin(5L, 7L, 11L))).size == 1)
    assert(plannedFiles(snap.filter($"id" === 42L)).nonEmpty)
    // file boundaries are range-clustered; > max-of-file-1 must drop it
    val m = ManifestTable.manifest(dir, None)
    val firstMax = m.files.map(_.maxs("id").get.toLong).min
    val gt = snap.filter($"id" > lit(firstMax))
    assert(plannedFiles(gt).size == 4, "strict > at a file's max skips that file")
    assert(gt.count() == 1000 - firstMax)
  }

  test("literal-on-the-left comparisons prune too") {
    val dir = mkTable()
    ManifestTable.snapshot(spark, dir).createOrReplaceTempView("skip_mirror")
    val q = spark.sql("SELECT count(*) AS n FROM skip_mirror WHERE 100 > id")
    val scans = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }
    assert(scans == Seq(1), s"'100 > id' must prune like 'id < 100', got $scans")
    assert(q.collect()(0).getLong(0) == 99L)
  }

  test("sql over a temp view gets the same automatic pruning") {
    val dir = mkTable()
    ManifestTable.snapshot(spark, dir).createOrReplaceTempView("skip_t")
    val q = spark.sql("SELECT count(*) AS n, sum(v) AS sv FROM skip_t WHERE id BETWEEN 1 AND 99")
    val scans = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }
    assert(scans == Seq(1), s"SQL path must prune to the one overlapping file, got $scans")
    assert(q.collect()(0).getLong(0) == 99L)
  }

  test("guards: foreign parquet, OR, IS NULL, untracked columns stay unpruned") {
    val dir = mkTable()
    val snap = ManifestTable.snapshot(spark, dir)
    // plain (non-manifest) parquet: untouched
    val plainDir = tmpDir("plainpq").toString
    (1 to 100).map(_.toLong).toDF("id").repartitionByRange(4, $"id").write
      .mode("overwrite").parquet(plainDir)
    val plain = spark.read.parquet(plainDir).filter($"id" < 10L)
    assert(plannedFiles(plain).size == 4, "foreign scan must not be touched")
    // OR across columns: no sound conjunct constraint -> unpruned
    assert(plannedFiles(snap.filter($"id" < 10L || $"cat" === "s1")).size == 5)
    // IS NULL never becomes a constraint
    assert(plannedFiles(snap.filter($"id".isNull)).size == 5)
    // untracked column (v): no envelope -> unpruned
    assert(plannedFiles(snap.filter($"v" < 10.0)).size == 5)
    // but an AND of (tracked range, untracked) still prunes on the tracked half
    assert(plannedFiles(snap.filter($"id" < 10L && $"v" > 0.0)).size == 1)
  }

  test("null-envelope files are skipped for ranges, kept for IS NULL queries") {
    val dir = tmpDir("skipnull").toString
    ManifestTable.commit(
      Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "t").repartition(1), dir, Seq("t"))
    ManifestTable.commit(
      Seq((3L, None: Option[Long]), (4L, None: Option[Long])).toDF("id", "t").repartition(1),
      dir, Seq("t"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(plannedFiles(snap).size == 2)
    val ranged = snap.filter($"t".between(0L, 100L))
    assert(plannedFiles(ranged).size == 1, "all-null envelope can never satisfy BETWEEN")
    assert(ranged.count() == 2)
    val nulls = snap.filter($"t".isNull)
    assert(plannedFiles(nulls).size == 2, "IS NULL must not prune")
    assert(nulls.count() == 2)
  }

  test("timestamp stats round-trip through the rule's driver-side cast") {
    val dir = tmpDir("skipts").toString
    val df = spark.range(0, 1000)
      .select($"id", timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"))
    ManifestTable.commit(df.repartitionByRange(5, $"ts"), dir, Seq("ts"))
    val snap = ManifestTable.snapshot(spark, dir)
    val lo = lit("2024-01-01 01:00:00").cast("timestamp")
    val hi = lit("2024-01-01 02:00:00").cast("timestamp")
    val q = snap.filter($"ts".between(lo, hi))
    assert(plannedFiles(q).size < 5)
    assert(q.count() ==
      snap.filter($"ts".between(lo, hi) || lit(false)).count(), "pruned == unpruned count")
  }

  test("z-order clustered manifest prunes on BOTH dimensions (multi-column skipping)") {
    val dir = tmpDir("skipz").toString
    // 32x32 grid z-order clustered into 16 files: each file covers a
    // compact 2-D region, so a narrow range on EITHER column overlaps
    // only a few files — the write-side layout q90/Layout.zorder
    // computes, consumed here by the manifest stats + the rule
    val grid = spark.range(0, 1024).selectExpr(
      "id", "id % 32 AS x", "id DIV 32 AS y",
      s"${graft.operators.Layout.zValueSql("id % 32", "id DIV 32", 5)} AS zv")
    ManifestTable.commit(grid.repartitionByRange(16, col("zv")), dir, Seq("x", "y"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(plannedFiles(snap).size == 16)
    val qx = snap.filter($"x".between(0L, 3L))
    val qy = snap.filter($"y".between(28L, 31L))
    assert(plannedFiles(qx).size <= 8, s"x-range must skip >= half (${plannedFiles(qx).size}/16)")
    assert(plannedFiles(qy).size <= 8, s"y-range must skip >= half (${plannedFiles(qy).size}/16)")
    assert(qx.count() == 128 && qy.count() == 128)
    // the conjunction prunes to the intersection of both envelopes
    val qxy = snap.filter($"x".between(0L, 3L) && $"y".between(28L, 31L))
    assert(plannedFiles(qxy).size <= plannedFiles(qx).size.min(plannedFiles(qy).size))
    assert(qxy.count() == 16)
  }

  test("rewritten tables (delete/merge) keep pruning off the refreshed manifest") {
    val dir = mkTable()
    ManifestTable.delete(spark, dir, $"id" <= 200L)
    val snap = ManifestTable.snapshot(spark, dir)
    val q = snap.filter($"id".between(900L, 999L))
    assert(plannedFiles(q).size == 1, "post-delete manifest entries drive pruning")
    assert(q.count() == 100)
  }

  test("equality/IN on a member-indexed column prunes via the Bloom sidecar, plain SQL included") {
    val dir = tmpDir("skipbloom").toString
    // cluster by v so the KEY envelopes span the whole domain in every
    // file — min/max can skip nothing for a key lookup; only the
    // membership fingerprint can
    val df = (1 to 1000).map(i => (i.toLong, ((i * 613) % 1000).toLong)).toDF("k", "v")
    ManifestTable.commit(df.repartitionByRange(5, $"v"), dir, track = Seq("v"))
    graft.sources.MemberIndex.build(spark, dir, "k")
    val snap = ManifestTable.snapshot(spark, dir)
    val all = plannedFiles(snap)
    assert(all.size == 5)
    // envelope-only pruning is powerless here; the Bloom skips files
    val q = snap.filter($"k".isin(11L, 222L))
    val pruned = plannedFiles(q)
    assert(pruned.size < all.size,
      s"Bloom sidecar must prune a key lookup (${pruned.size}/${all.size})")
    // result identical with the rule off (bit-identical contract)
    val expect = spark.conf.get("spark.graft.manifestSkipping.enabled", "true")
    try {
      spark.conf.set("spark.graft.manifestSkipping.enabled", "false")
      val off = ManifestTable.snapshot(spark, dir).filter($"k".isin(11L, 222L))
      assert(q.orderBy("k").collect().toSeq == off.orderBy("k").collect().toSeq)
    } finally spark.conf.set("spark.graft.manifestSkipping.enabled", expect)
    // the candidate set agrees with the API-side lookup's superset
    val apiPaths = graft.sources.MemberIndex
      .candidatePaths(spark, dir, "k", Seq(11L, 222L)).toSet
    assert(pruned.map(p => graft.plans.ManifestSkipping.stripScheme(p)).toSet == apiPaths,
      "rule-side and API-side candidate sets must agree")
    // plain SQL against a view gets it automatically
    snap.createOrReplaceTempView("bloom_view")
    val sq = spark.sql("SELECT k, v FROM bloom_view WHERE k IN (11, 222)")
    assert(plannedFiles(sq).size == pruned.size)
    assert(sq.collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 222L))
    // files appended AFTER the index was built cannot be skipped (no
    // fingerprint) but never break correctness
    ManifestTable.commit(Seq((2000L, 1L)).toDF("k", "v"), dir, Seq("v"))
    val snap2 = ManifestTable.snapshot(spark, dir)
    val q2 = snap2.filter($"k" === 2000L)
    assert(q2.count() == 1, "unindexed fresh file must survive the Bloom pass")
    assert(plannedFiles(q2).exists(_.contains("c-")), "fresh file stays in the scan")
    // equality on a column with NO index: untouched (no skip, no error)
    assert(plannedFiles(snap2.filter($"v" === 999L)).nonEmpty)
  }
}
