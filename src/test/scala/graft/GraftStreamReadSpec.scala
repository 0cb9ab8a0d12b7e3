package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The catalog's streaming READ half ([[graft.sources.GraftMicroBatchStream]]):
  * `spark.readStream.table` over a manifest table with manifest-version
  * offsets — initial snapshot, append-only increments, change-commit
  * refusal/skip, exactly-once across checkpointed restarts, and the
  * retention pin that keeps a lagging stream's commits alive.
  */
class GraftStreamReadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-sr-warehouse").toString
    spark.conf.set("spark.sql.catalog.graftsr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftsr.warehouse", w)
    w
  }

  private def mkTable(name: String, ids: Range): String = {
    val dir = s"$warehouse/lake/$name"
    new java.io.File(dir).mkdirs()
    ManifestTable.commit(
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2),
      dir, track = Seq("id"))
    dir
  }

  private def append(dir: String, ids: Range): Unit =
    ManifestTable.commit(
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1),
      dir, track = Seq("id")): Unit

  private def startInto(
      mem: String, table: String, ckpt: java.nio.file.Path,
      options: Map[String, String] = Map.empty): StreamingQuery = {
    var r = spark.readStream
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.table(table).writeStream
      .format("memory").queryName(mem)
      .option("checkpointLocation", ckpt.toString)
      .start()
  }

  private def memIds(mem: String): Seq[Long] =
    spark.table(mem).select("id").as[Long].collect().toSeq.sorted

  test("initial snapshot, then append-only increments; exactly-once across restart") {
    val dir = mkTable("ev", 1 to 10)
    append(dir, 11 to 15)
    val ckpt = tmpDir("sr-ckpt")
    val out = tmpDir("sr-out").toString
    def sinkIds(): Seq[Long] =
      spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    def drain(): Unit = {
      val q = spark.readStream.table("graftsr.lake.ev").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(sinkIds() == (1L to 15L), "first batch = full snapshot at start version")
    // restart from the same checkpoint: only NEW commits, no re-delivery
    append(dir, 16 to 20)
    append(dir, 21 to 25)
    drain()
    assert(sinkIds() == (1L to 25L),
      s"restart must deliver exactly the unseen commits once, got ${sinkIds().size} rows")
    // an idle restart delivers nothing
    drain()
    assert(sinkIds() == (1L to 25L), "idle restart must re-deliver nothing")
    // the stream registered and advanced a retention pin (the pin is a
    // FLOOR — the source's commit callback fires on the next trigger,
    // so it may lag the delivered offset by one batch; lagging retains
    // more, never less)
    val pins = ManifestTable.cursorPins(dir)
    assert(pins.exists { case (n, v) => n.startsWith("stream-") && v >= 2 },
      s"stream must pin its processed version for retention, got $pins")
  }

  test("Trigger.AvailableNow drains whole-commit batches to the captured head, stops, and a rerun delivers only newer commits") {
    val dir = mkTable("anow", 1 to 6)   // initial snapshot: 2 files
    append(dir, 7 to 8)
    append(dir, 9 to 10)
    val ckpt = tmpDir("anow-ckpt")
    val out = tmpDir("anow-out").toString
    def sinkIds(): Seq[Long] =
      spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    def run(): Unit = {
      // startingVersion=1: the three pre-existing commits drain as
      // individual commits (a stream starting at the head would fold
      // them into one indivisible initial snapshot)
      val q = spark.readStream
        .option("maxFilesPerTrigger", "1")
        .option("startingVersion", "1")
        .table("graftsr.lake.anow")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000),
        "AvailableNow must drain to the captured head and stop on its own")
    }
    run()
    assert(sinkIds() == (1L to 10L),
      "the first run must deliver the snapshot plus every committed append")
    // maxFilesPerTrigger=1 closes over whole commits: the indivisible
    // 2-file snapshot, then one commit per batch => at least 3 batches
    def offsetCount(): Int =
      Option(new java.io.File(ckpt.toFile, "offsets").list())
        .getOrElse(Array.empty).count(!_.startsWith("."))
    val firstRunBatches = offsetCount()
    assert(firstRunBatches >= 3,
      s"commit-bounded admission must split the backfill, got $firstRunBatches batches")
    // a second run picks up ONLY the commits that landed in between —
    // exactly-once from the checkpoint, then stops again
    append(dir, 11 to 12)
    append(dir, 13 to 14)
    run()
    assert(sinkIds() == (1L to 14L),
      s"the rerun must deliver exactly the two new commits once, got ${sinkIds().size} rows")
    assert(offsetCount() >= firstRunBatches + 2,
      "each new commit drains as its own bounded batch")
    // an idle rerun delivers nothing and still stops
    run()
    assert(sinkIds() == (1L to 14L), "an idle AvailableNow run must re-deliver nothing")
  }

  test("a change commit is refused loudly by default; skipChangeCommits skips it wholesale") {
    val dir = mkTable("chg", 1 to 10)
    val ckpt = tmpDir("sr-chg-ckpt")
    val q = startInto("sr_chg", "graftsr.lake.chg", ckpt)
    try {
      q.processAllAvailable()
      assert(memIds("sr_chg") == (1L to 10L))
      ManifestTable.delete(spark, dir, col("id") === 3L)
      append(dir, 11 to 12)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse(e.toString)
      assert(msg.contains("not append-only") && msg.contains("skipChangeCommits"),
        s"refusal must name the contract and the opt-out, got: $msg")
    } finally q.stop()
    // fresh checkpoint with the opt-out: delete commit skipped, appends flow.
    // NOTE the documented trade: the skipped commit's file REWRITES are
    // skipped too, so the snapshot it started from is what was delivered.
    val q2 = startInto("sr_chg2", "graftsr.lake.chg", tmpDir("sr-chg-ckpt2"),
      Map("skipChangeCommits" -> "true", "startingVersion" -> "2"))
    try {
      q2.processAllAvailable()
      assert(memIds("sr_chg2") == (11L to 12L),
        s"change commit skipped, append delivered: ${memIds("sr_chg2")}")
    } finally q2.stop()
  }

  test("a merge-on-read DELTA commit is a change commit: refused by default, skipped wholesale with the opt-out") {
    // updateMor lands tombstones + new rows in ONE version: an append
    // stream that delivered the old rows cannot retract them, so the
    // commit must classify as a change commit even though it REMOVES
    // no file — the tombstone-set growth is the signal
    val dir = mkTable("dlt", 1 to 10)
    val ckpt = tmpDir("sr-dlt-ckpt")
    val q = startInto("sr_dlt", "graftsr.lake.dlt", ckpt)
    try {
      q.processAllAvailable()
      assert(memIds("sr_dlt") == (1L to 10L))
      ManifestTable.updateMor(spark, dir, col("id") <= 3L,
        Map("id" -> (col("id") + 100L)), Seq("id"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse(e.toString)
      assert(msg.contains("not append-only") && msg.contains("newTombstones=true"),
        s"delta commit must refuse as a change commit, got: $msg")
    } finally q.stop()
    // opt-out: the WHOLE delta skips — tombstones AND its re-inserts
    // (the documented skipChangeCommits trade); later appends flow
    append(dir, 11 to 12)
    val q2 = startInto("sr_dlt2", "graftsr.lake.dlt", tmpDir("sr-dlt-ckpt2"),
      Map("skipChangeCommits" -> "true", "startingVersion" -> "2"))
    try {
      q2.processAllAvailable()
      assert(memIds("sr_dlt2") == (11L to 12L),
        s"delta commit skipped wholesale, append delivered: ${memIds("sr_dlt2")}")
    } finally q2.stop()
  }

  test("state-preserving maintenance commits stream nothing (no duplicates)") {
    val dir = mkTable("mnt", 1 to 6)
    // many small files so compactSmall has work
    append(dir, 7 to 7); append(dir, 8 to 8); append(dir, 9 to 9)
    val ckpt = tmpDir("sr-mnt-ckpt")
    val q = startInto("sr_mnt", "graftsr.lake.mnt", ckpt)
    try {
      q.processAllAvailable()
      assert(memIds("sr_mnt") == (1L to 9L))
      val before = ManifestTable.latestVersion(dir).get
      ManifestTable.compactSmall(spark, dir, clusterBy = "id", minRows = 1000, numFiles = 1)
      assert(ManifestTable.latestVersion(dir).get > before, "fixture must actually compact")
      assert(ManifestTable.manifest(dir, None).statePreserving)
      append(dir, 10 to 12)
      q.processAllAvailable()
      assert(memIds("sr_mnt") == (1L to 12L),
        s"compaction rewrites carry only delivered rows — must not re-stream: ${memIds("sr_mnt")}")
    } finally q.stop()
  }

  test("lake pub/sub: writeStream.toTable publishes, readStream.table consumes, exactly-once end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("CREATE TABLE graftsr.lake.bus (id BIGINT, v STRING) PARTITIONED BY (id)")
    val in = MemoryStream[(Long, String)]
    val writer = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", tmpDir("bus-w-ckpt").toString)
      .toTable("graftsr.lake.bus")
    val out = tmpDir("bus-out").toString
    val ckpt = tmpDir("bus-r-ckpt")
    def drainReader(): Unit = {
      val r = spark.readStream.table("graftsr.lake.bus").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString).start()
      try r.processAllAvailable() finally r.stop()
    }
    try {
      in.addData((1L, "a"), (2L, "b")); writer.processAllAvailable()
      drainReader()
      in.addData((3L, "c")); writer.processAllAvailable()
      in.addData((4L, "d")); writer.processAllAvailable()
      drainReader() // checkpointed restart picks up exactly the two new epochs
    } finally writer.stop()
    val got = spark.read.parquet(out).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      s"the reader must see every published row exactly once: $got")
  }

  test("maxFilesPerTrigger: a backfill drains in bounded micro-batches, content identical") {
    val dir = mkTable("rate", 1 to 10) // v1: 2 files
    append(dir, 11 to 12) // v2: 1 file
    append(dir, 13 to 14) // v3: 1 file
    append(dir, 15 to 16) // v4: 1 file
    val out = tmpDir("rate-out").toString
    // startingVersion=1 makes the whole history a CHANGES backfill (a
    // head-snapshot start is one indivisible admission by design)
    val q = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .option("startingVersion", "1")
      .table("graftsr.lake.rate").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", tmpDir("rate-ckpt").toString).start()
    try {
      q.processAllAvailable()
      // one micro-batch per commit under the 1-file budget
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 4,
        s"1-file budget must split the backfill per commit, got ${batches.length} " +
          s"batches: ${batches.map(_.numInputRows).mkString(",")}")
      assert(batches.head.numInputRows == 10,
        "v1 (two files) is still one admission: at least one version per batch")
    } finally q.stop()
    val got = spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    assert(got == (1L to 16L), s"rate limiting must not change content: $got")
    ManifestTable.cursorPins(dir) // (pins exercised; content is the contract)
  }

  test("startingVersion streams changes-only from that commit") {
    val dir = mkTable("sv", 1 to 10) // v1
    append(dir, 11 to 13) // v2
    append(dir, 14 to 15) // v3
    val q = startInto("sr_sv", "graftsr.lake.sv", tmpDir("sr-sv-ckpt"),
      Map("startingVersion" -> "2"))
    try {
      q.processAllAvailable()
      assert(memIds("sr_sv") == (11L to 15L),
        s"startingVersion=2 must deliver v2..head, no snapshot: ${memIds("sr_sv")}")
    } finally q.stop()
    ManifestTable.cursorPins(dir): Unit
  }

  test("MoR-applying snapshot: pending tombstones subtract from batch 0; exactly-once; materialize skipped") {
    val dir = mkTable("mor", 1 to 10) // v1 (2 files)
    append(dir, 11 to 15)             // v2
    // BOTH tombstone kinds pending at stream start: an equality delete
    // (id in {3, 12}) and a positional delete (v > 'v13' dooms 14, 15)
    ManifestTable.deleteByKey(Seq(3L, 12L).toDF("id"), dir, keys = Seq("id"))
    ManifestTable.deleteWhere(spark, dir, $"id" >= 14L)
    val ckpt = tmpDir("sr-mor-ckpt")
    val out = tmpDir("sr-mor-out").toString
    def sinkIds(): Seq[Long] =
      spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    def drain(): Unit = {
      val q = spark.readStream.table("graftsr.lake.mor").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(sinkIds() == Seq(1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 13L),
      s"snapshot must be the APPLIED view: ${sinkIds()}")
    // folding the tombstones into the files is state-preserving: the
    // stream already delivered exactly those rows — nothing re-streams
    ManifestTable.materializeDeletes(spark, dir)
    append(dir, 16 to 17)
    drain()
    assert(sinkIds() ==
      Seq(1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 13L, 16L, 17L),
      s"materialize must stream nothing, appends must: ${sinkIds()}")
    // exactly-once across another restart on the SAME checkpoint
    append(dir, 18 to 18)
    drain()
    assert(sinkIds() ==
      Seq(1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 13L, 16L, 17L, 18L),
      s"restart must resume exactly-once: ${sinkIds()}")
  }

  test("over-cap MoR snapshot DEGRADES to the staged applied view: correct, exactly-once, space reclaimed") {
    // 5 tombstoned rows against a cap of 2: the doom set refuses to
    // materialize driver-side, so batch 0 serves the DISTRIBUTED
    // applied view, staged once under the checkpoint
    val dir = mkTable("morcap", 1 to 10)
    ManifestTable.deleteByKey((1L to 5L).toDF("id"), dir, keys = Seq("id"))
    val ckpt = tmpDir("sr-morcap-ckpt")
    val out = tmpDir("sr-morcap-out").toString
    def sinkIds(): Seq[Long] =
      spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    def drain(): Unit = {
      val q = spark.readStream.option("maxSnapshotTombstones", "2")
        .table("graftsr.lake.morcap").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(sinkIds() == (6L to 10L),
      s"over-cap snapshot must still be the APPLIED view: ${sinkIds()}")
    // appends flow; nothing re-delivers across the checkpointed restart
    append(dir, 11 to 12)
    drain()
    assert(sinkIds() == (6L to 12L), s"exactly-once after degrade: ${sinkIds()}")
    // the staged applied view is reclaimed once the snapshot batch is
    // durable (the commit callback fires within a later trigger cycle)
    drain()
    val walk = java.nio.file.Files.walk(ckpt)
    val leftover =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("graft-snapshot")).toList
      } finally walk.close()
    assert(leftover.isEmpty, s"staged snapshot must be reclaimed after commit: $leftover")
  }

  test("batch-0 replay is deterministic: appends landing in the crash window do not deliver twice") {
    // batch 0's offset reaches the WAL, then the SINK crashes before the
    // commit log entry; the replayed batch must re-plan the snapshot at
    // the BASELINE version (persisted beside the checkpoint), not at the
    // current head — or the crash-window append enters the snapshot AND
    // streams again as its own commit
    val dir = mkTable("crashwin", 1 to 10)
    val ckpt = tmpDir("sr-cw-ckpt")
    val out = tmpDir("sr-cw-out").toString
    val crash = spark.readStream.table("graftsr.lake.crashwin").writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) =>
        throw new RuntimeException("injected sink crash"))
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      crash.processAllAvailable())
    try crash.stop() catch { case _: Exception => () }
    append(dir, 11 to 12) // lands between crash and restart
    val q = spark.readStream.table("graftsr.lake.crashwin").writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out))
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    assert(got == (1L to 12L),
      s"replayed snapshot must bind the baseline version — no duplicates, no loss: $got")
  }

  test("MoR snapshot replay derives its doom set from the checkpointed version, not the current head") {
    val dir = mkTable("morrep", 1 to 10)
    ManifestTable.deleteByKey(Seq(3L).toDF("id"), dir, keys = Seq("id")) // v2
    ManifestTable.deleteWhere(spark, dir, $"id" >= 9L)                   // v3
    // applied view at the stream's baseline (v3): 1,2,4,5,6,7,8
    val ckpt = tmpDir("sr-morrep-ckpt")
    val out = tmpDir("sr-morrep-out").toString
    val crash = spark.readStream.table("graftsr.lake.morrep").writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) =>
        throw new RuntimeException("injected sink crash"))
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      crash.processAllAvailable())
    try crash.stop() catch { case _: Exception => () }
    // the tombstone set MOVES before the restart: a doom set derived
    // from the head would over-delete id 5 out of the replayed snapshot
    ManifestTable.deleteByKey(Seq(5L).toDF("id"), dir, keys = Seq("id")) // v4
    val q = spark.readStream.table("graftsr.lake.morrep").writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out))
      .start()
    // batch 0 replays the v3 applied view, then the v4 delete commit is
    // judged exactly as live: refused as a non-append-only change
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.processAllAvailable())
    try q.stop() catch { case _: Exception => () }
    val got = spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L, 4L, 5L, 6L, 7L, 8L),
      s"replayed batch 0 must be the applied view AT THE CHECKPOINTED VERSION " +
        s"(id 5 delivered — its delete landed after the offset was logged): $got")
  }

  test("MoR-applying snapshot SPANS rename eras: per-era position filters compose with the rename chain") {
    val _ = warehouse
    spark.sql("CREATE TABLE graftsr.lake.morren (id BIGINT, v STRING) PARTITIONED BY (id)")
    spark.sql("INSERT INTO graftsr.lake.morren SELECT id, concat('v', id) " +
      "FROM range(1, 11, 1, 1)") // era-0 file
    spark.sql("ALTER TABLE graftsr.lake.morren RENAME COLUMN v TO val")
    spark.sql("INSERT INTO graftsr.lake.morren SELECT id, concat('v', id) " +
      "FROM range(11, 21, 1, 1)") // era-1 file
    val dir = s"$warehouse/lake/morren"
    // tombstones touch BOTH eras: equality delete on an era-0 row and
    // an era-1 row, positional delete on one more era-0 row
    ManifestTable.deleteByKey(Seq(3L, 13L).toDF("id"), dir, keys = Seq("id"))
    ManifestTable.deleteWhere(spark, dir, col("id") === 7L)
    val q = startInto("sr_morren", "graftsr.lake.morren", tmpDir("sr-morren-ckpt"))
    try {
      q.processAllAvailable()
      val got = spark.table("sr_morren").select("id", "val")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      val want = (1L to 20L).filterNot(Set(3L, 7L, 13L)).map(i => (i, s"v$i"))
      assert(got == want,
        s"snapshot must apply tombstones per era AND read era-0 bytes under 'val': $got")
    } finally q.stop()
  }

  test("widen mid-stream fails loudly; a restart on the SAME checkpoint re-baselines onto the wide type, exactly-once") {
    val _ = s"$warehouse/lake/wid" // forces catalog registration first
    spark.sql("CREATE TABLE graftsr.lake.wid (id BIGINT, n INT) PARTITIONED BY (id)")
    spark.sql("INSERT INTO graftsr.lake.wid SELECT id, CAST(id AS INT) FROM range(1, 11)")
    val ckpt = tmpDir("sr-wid-ckpt")
    val out = tmpDir("sr-wid-out").toString
    def sinkRows(): Seq[(Long, Long)] = {
      // pre-widen batches landed int files, post-widen long — the
      // explicit wide schema reads both (the same parquet widening
      // promotion the table itself leans on)
      val wide = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
      spark.read.schema(wide).parquet(out).as[(Long, Long)].collect().toSeq.sorted
    }
    def drain(): Unit = {
      val q = spark.readStream.table("graftsr.lake.wid").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(sinkRows().map(_._1) == (1L to 10L))
    // the widen lands while the stream is down, then appends only the
    // wide type can hold
    spark.sql("ALTER TABLE graftsr.lake.wid ALTER COLUMN n TYPE BIGINT")
    spark.sql("INSERT INTO graftsr.lake.wid SELECT id, id + 5000000000 FROM range(11, 14)")
    drain()
    assert(sinkRows() == ((1L to 10L).map(i => (i, i)) ++
      (11L to 13L).map(i => (i, i + 5000000000L))),
      s"re-baselined restart must deliver exactly the unseen commits once: ${sinkRows()}")
    drain()
    assert(sinkRows().size == 13, "idle restart must re-deliver nothing")
    // a widen of a CAPTURED column landing MID-RUN fails loudly (the
    // parquet reader refuses narrowing long bytes into the captured
    // int schema — never a silent truncation); the restart contract
    // above is the recovery
    spark.sql("CREATE TABLE graftsr.lake.wid2 (id BIGINT, n INT) PARTITIONED BY (id)")
    spark.sql("INSERT INTO graftsr.lake.wid2 SELECT id, CAST(id AS INT) FROM range(1, 6)")
    val q = startInto("sr_wid_live", "graftsr.lake.wid2", tmpDir("sr-wid-ckpt2"))
    try {
      q.processAllAvailable()
      assert(memIds("sr_wid_live") == (1L to 5L))
      spark.sql("ALTER TABLE graftsr.lake.wid2 ALTER COLUMN n TYPE BIGINT")
      spark.sql("INSERT INTO graftsr.lake.wid2 SELECT id, id + 5000000000 FROM range(6, 8)")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse(e.toString)
      assert(msg.contains("PARQUET_COLUMN_DATA_TYPE_MISMATCH") || msg.contains("INT64"),
        s"mid-run widen must fail loudly, got: $msg")
    } finally q.stop()
  }

  test("rename mid-stream fails the run; a restart on the SAME checkpoint re-baselines, exactly-once") {
    val dir = s"$warehouse/lake/ren" // (forces catalog registration first)
    spark.sql("CREATE TABLE graftsr.lake.ren (id BIGINT, v STRING) PARTITIONED BY (id)")
    spark.sql("INSERT INTO graftsr.lake.ren SELECT id, concat('v', id) FROM range(1, 11)")
    val ckpt = tmpDir("sr-ren-ckpt")
    val out = tmpDir("sr-ren-out").toString
    def sinkRows(): Seq[(Long, String)] = {
      // the file sink holds pre-rename batches under 'v' and re-baselined
      // batches under 'val' — merge and coalesce for the readback
      val df = spark.read.option("mergeSchema", "true").parquet(out)
      val vcol =
        if (df.columns.contains("v") && df.columns.contains("val")) coalesce(col("v"), col("val"))
        else if (df.columns.contains("v")) col("v")
        else col("val")
      df.select(col("id"), vcol).as[(Long, String)].collect().toSeq.sorted
    }
    def drain(): Unit = {
      val q = spark.readStream.table("graftsr.lake.ren").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(sinkRows().map(_._1) == (1L to 10L))
    // rename lands while the stream is down, then MORE appends under the new name
    spark.sql("ALTER TABLE graftsr.lake.ren RENAME COLUMN v TO val")
    spark.sql("INSERT INTO graftsr.lake.ren SELECT id, concat('v', id) FROM range(11, 16)")
    // the restarted stream re-baselines onto the new schema and resumes
    // from its checkpointed offset: the rename commit itself streams
    // nothing, the post-rename appends deliver exactly once
    drain()
    assert(sinkRows() == (1L to 15L).map(i => (i, s"v$i")),
      s"re-baselined restart must deliver exactly the unseen rows once: ${sinkRows()}")
    // idle restart: nothing re-delivered across the rename boundary either
    drain()
    assert(sinkRows().size == 15)
    // a rename landing MID-RUN still fails loudly, naming the restart path
    val q = startInto("sr_ren_live", "graftsr.lake.ren", tmpDir("sr-ren-ckpt2"))
    try {
      q.processAllAvailable()
      spark.sql("ALTER TABLE graftsr.lake.ren RENAME COLUMN val TO label")
      spark.sql("INSERT INTO graftsr.lake.ren SELECT id, concat('v', id) FROM range(16, 18)")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse(e.toString)
      assert(msg.contains("renamed or dropped") && msg.contains("RESTART"),
        s"mid-run rename must fail with the restart contract, got: $msg")
    } finally q.stop()
  }

  test("a starting snapshot SPANNING rename eras streams every era under the current names") {
    val _ = warehouse // forces catalog registration
    spark.sql("CREATE TABLE graftsr.lake.renq (id BIGINT, v STRING) PARTITIONED BY (id)")
    spark.sql("INSERT INTO graftsr.lake.renq SELECT id, concat('old', id) FROM range(1, 6)")
    spark.sql("ALTER TABLE graftsr.lake.renq RENAME COLUMN v TO val")
    spark.sql("INSERT INTO graftsr.lake.renq SELECT id, concat('new', id) FROM range(6, 9)")
    // pre-rename files hold bytes under 'v'; the snapshot must read both
    // eras and emit them under 'val' (previously refused outright)
    val q = startInto("sr_renq", "graftsr.lake.renq", tmpDir("sr-renq-ckpt"))
    try {
      q.processAllAvailable()
      val got = spark.table("sr_renq").select("id", "val")
        .as[(Long, String)].collect().toSeq.sorted
      val want = (1L to 5L).map(i => (i, s"old$i")) ++ (6L to 8L).map(i => (i, s"new$i"))
      assert(got == want, s"era-union snapshot: $got")
    } finally q.stop()
  }
}
