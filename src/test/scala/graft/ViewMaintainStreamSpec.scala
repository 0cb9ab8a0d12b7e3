package graft

import graft.pipeline.ViewMaintain
import graft.streaming.ViewMaintainStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ViewMaintain deployed on the bucketed store (VERDICT r10 next-round
  * #4): the q141 algebra and the VerifiedStream storage protocol wired
  * end to end. Pins: batch/stream parity with foldBatches, replay
  * convergence, touched-bucket-only rewrites (untouched bucket files
  * untouched on disk), tombstone bucket retirement, and the
  * MemoryStream e2e.
  */
class ViewMaintainStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("d_key", "d_name")
  private def b(rows: Seq[(Long, Long, Double, Long, Boolean)]) =
    rows.toDF("k", "fk", "price", "seq", "deleted")
  // q141's exact insert/update/delete/stale-redelivery shapes
  private val batches = Seq(
    b(Seq((1L, 10L, 1.0, 0L, false), (2L, 20L, 2.0, 0L, false))),
    b(Seq((1L, 30L, 9.0, 1L, false), (3L, 10L, 3.0, 1L, false))),
    b(Seq((2L, 20L, 2.0, 2L, true), (1L, 10L, 1.0, 0L, false))),
  )

  private def run(dir: String, bs: Seq[DataFrame], nb: Int = 4): Unit =
    bs.foreach(batch => ViewMaintainStream.processBatch(
      batch, "k", "seq", "deleted", dim, "fk", "d_key", dir, nBuckets = nb))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toIndexedSeq.sorted

  test("chained processBatch equals foldBatches (q141's algebra) and retires the tombstoned key's rows") {
    val dir = tmpDir("vms_parity").toString
    run(dir, batches)
    val (wantFact, wantView) = ViewMaintain.foldBatches(
      batches, "k", "seq", "deleted", dim, "fk", "d_key")
    val gotFact = ViewMaintainStream.currentFact(spark, dir).select("k", "fk", "price", "seq")
    val gotView = ViewMaintainStream.currentView(spark, dir)
    assert(rows(gotFact) == rows(wantFact.select("k", "fk", "price", "seq")))
    assert(rows(gotView.select(wantView.columns.map(col).toIndexedSeq: _*)) == rows(wantView))
    // tombstoned key 2 is gone from both stores
    assert(gotFact.filter(col("k") === 2L).isEmpty && gotView.filter(col("k") === 2L).isEmpty)
  }

  test("replaying the last batch converges (crash-replay of an interrupted tick)") {
    val dir = tmpDir("vms_replay").toString
    run(dir, batches)
    val factBefore = rows(ViewMaintainStream.currentFact(spark, dir))
    val viewBefore = rows(ViewMaintainStream.currentView(spark, dir))
    run(dir, Seq(batches.last)) // the checkpoint replays exactly this
    assert(rows(ViewMaintainStream.currentFact(spark, dir)) == factBefore)
    assert(rows(ViewMaintainStream.currentView(spark, dir)) == viewBefore)
  }

  test("a 1-key batch rewrites only that key's bucket in each table (file-level pin)") {
    val dir = tmpDir("vms_buckets").toString
    run(dir, batches.take(2))
    def files(path: String): Map[String, Long] = {
      val root = new java.io.File(path)
      root.listFiles().filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified()))
        .toMap
    }
    // key 3 only — its bucket under nb=4
    val kb = spark.range(1).select(pmod(hash(lit(3L)), lit(4)).cast("int")).head().getInt(0)
    val factBefore = files(s"$dir/fact"); val viewBefore = files(s"$dir/view")
    run(dir, Seq(b(Seq((3L, 20L, 7.0, 5L, false)))))
    val factAfter = files(s"$dir/fact"); val viewAfter = files(s"$dir/view")
    for ((before, after, tbl) <- Seq((factBefore, factAfter, "fact"), (viewBefore, viewAfter, "view"))) {
      val untouchedBefore = before.filterNot(_._1.contains(s"bucket=$kb"))
      val untouchedAfter = after.filterNot(_._1.contains(s"bucket=$kb"))
      assert(untouchedBefore == untouchedAfter,
        s"$tbl: untouched buckets must be byte-for-byte the same files")
      assert(before.keySet.filter(_.contains(s"bucket=$kb")) !=
        after.keySet.filter(_.contains(s"bucket=$kb")),
        s"$tbl: the touched bucket must have been rewritten")
    }
    // and the update is visible, re-joined to the new dim row
    val v = ViewMaintainStream.currentView(spark, dir)
      .filter(col("k") === 3L).select("price", "d_name").head()
    assert(v.getDouble(0) == 7.0 && v.getString(1) == "y")
  }

  test("bucket-retire crash window: a .bN.old left by an interrupted retirement is restored, and the replayed batch re-retires it") {
    val dir = tmpDir("vms_crash").toString
    run(dir, batches.take(2))
    // tombstone key 3 (sole occupant of its bucket) -> its bucket retires
    val kb = spark.range(1).select(pmod(hash(lit(3L)), lit(4)).cast("int")).head().getInt(0)
    val tomb = b(Seq((3L, 10L, 3.0, 9L, true)))
    run(dir, Seq(tomb))
    val bucketDir = new java.io.File(s"$dir/fact/bucket=$kb")
    assert(!bucketDir.exists(), "the tombstoned key's bucket must be retired")
    // simulate the crash window: the rename to .old happened but the
    // delete did not — recovery must restore it (conservative), and the
    // replayed batch must re-retire it and re-converge
    val old = new java.io.File(s"$dir/fact/.b$kb.old")
    // a stale copy of the bucket: key 3's pre-tombstone row
    b(Seq((3L, 10L, 3.0, 1L, false))).drop("deleted")
      .coalesce(1).write.mode("overwrite").parquet(old.getPath)
    run(dir, Seq(tomb)) // the checkpoint replays exactly this batch
    assert(!new java.io.File(s"$dir/fact/bucket=$kb").exists(),
      "replay after the crash window must re-retire the bucket")
    assert(!old.exists(), "the .old debris must be cleared")
    assert(ViewMaintainStream.currentFact(spark, dir).filter(col("k") === 3L).isEmpty)
  }

  test("end-to-end via MemoryStream: the maintained view equals the from-scratch join of the resolved fact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("vms_e2e").toString
    val in = MemoryStream[(Long, Long, Double, Long, Boolean)]
    val q = ViewMaintainStream.start(
      in.toDF().toDF("k", "fk", "price", "seq", "deleted"),
      "k", "seq", "deleted", dim, "fk", "d_key",
      s"$dir/store", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData((1L, 10L, 1.0, 0L, false), (2L, 20L, 2.0, 0L, false)); q.processAllAvailable()
      in.addData((1L, 30L, 9.0, 1L, false), (3L, 10L, 3.0, 1L, false)); q.processAllAvailable()
      in.addData((2L, 20L, 2.0, 2L, true)); q.processAllAvailable()
      val fact = ViewMaintainStream.currentFact(spark, s"$dir/store")
      val view = ViewMaintainStream.currentView(spark, s"$dir/store")
      val scratch = fact.join(dim, col("fk") === col("d_key"))
      assert(rows(view.select(scratch.columns.map(col).toIndexedSeq: _*)) == rows(scratch))
      assert(rows(fact.select("k", "fk", "price")) ==
        Seq("1|30|9.0", "3|10|3.0"))
    } finally q.stop()
  }
}
