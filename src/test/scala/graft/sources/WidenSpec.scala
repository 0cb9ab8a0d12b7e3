package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only safe type widening ([[ManifestTable.widenColumn]]):
  * old files keep narrow physical bytes (the parquet reader promotes
  * them at scan), envelopes stay exact (float stats re-render through
  * the exact float->double conversion at widen time), and every
  * type-sensitive consumer — envelope pruning, Bloom member index,
  * equality tombstones — stays bit-correct across the widen.
  */
class WidenSpec extends graft.SparkSpec {
  import spark.implicits._

  test("int -> long widen is metadata-only; reads, appends, and pruning stay exact") {
    val dir = tmpDir("widen-int").toString
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .selectExpr("CAST(id AS INT) AS id", "v")
      .repartitionByRange(4, $"id")
    ManifestTable.commit(df, dir, track = Seq("id"))
    val before = ManifestTable.manifest(dir, None)
    ManifestTable.widenColumn(dir, "id", LongType)
    val m = ManifestTable.manifest(dir, None)
    // zero data I/O: the exact same file entries, new schema, one step
    assert(m.files == before.files, "widen must not touch any file entry")
    assert(DataFrameSchema.fromJson(m.schemaJson)("id").dataType == LongType)
    assert(m.retypes.map(r => (r.column, r.fromJson)) == Seq(("id", IntegerType.json)))
    // values read back exact, under the widened type
    val back = ManifestTable.snapshot(spark, dir)
    assert(back.schema("id").dataType == LongType)
    assert(back.agg(sum("id")).head.getLong(0) == (1 to 100).sum.toLong)
    // an append can now carry values beyond int range
    ManifestTable.commit(Seq((5000000000L, "big")).toDF("id", "v"), dir, Seq("id"))
    assert(ManifestTable.snapshot(spark, dir).agg(max("id")).head.getLong(0) == 5000000000L)
    // envelope pruning across the widen era split: narrow-era files
    // prune on their (exactly parseable) int stats, the wide-era file
    // prunes on its long stats
    val narrow = ManifestTable.livePaths(spark, dir, "id", lit(10L), lit(20L))
    assert(narrow.size == 1, s"one narrow-era file overlaps [10,20]: $narrow")
    val wide = ManifestTable.livePaths(spark, dir, "id", lit(4000000000L), lit(6000000000L))
    assert(wide.size == 1, "only the post-widen file overlaps the long-only range")
    val got = ManifestTable.prunedScan(spark, dir, "id", lit(10L), lit(20L))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == (10 to 20).map(i => (i.toLong, s"v$i")))
    // time travel still reads the narrow world under its own schema
    assert(ManifestTable.snapshot(spark, dir, asOf = Some(before.version))
      .schema("id").dataType == IntegerType)
  }

  test("float -> double widen re-renders envelopes exactly (the 1.1f gap)") {
    val dir = tmpDir("widen-float").toString
    // 1.1f widens to 1.100000023841858d, but its stat string "1.1"
    // parses to 1.1d — without the rewrite, a range probe in the gap
    // (1.1, 1.1000000238] would prune the file holding a live match
    val df = Seq((1L, 1.1f), (2L, 0.5f)).toDF("id", "f").repartition(1)
    ManifestTable.commit(df, dir, track = Seq("f"))
    ManifestTable.widenColumn(dir, "f", DoubleType)
    val m = ManifestTable.manifest(dir, None)
    assert(m.files.head.maxs("f").get.toDouble == 1.1f.toDouble,
      "the envelope must hold the exact widened value, not the re-parsed string")
    val lo = 1.1000000001
    val hi = 1.2
    val paths = ManifestTable.livePaths(spark, dir, "f", lit(lo), lit(hi))
    assert(paths.nonEmpty, "the file holding 1.1f (= 1.1000000238d widened) must survive")
    val got = ManifestTable.prunedScan(spark, dir, "f", lit(lo), lit(hi))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L), "the widened row must be found through the pruned scan")
  }

  test("decimal precision widen is metadata-only and exact") {
    val dir = tmpDir("widen-dec").toString
    val df = (1 to 50).map(i => (i.toLong, BigDecimal(i) * BigDecimal("1.25")))
      .toDF("id", "amt")
      .selectExpr("id", "CAST(amt AS DECIMAL(10,2)) AS amt")
      .repartitionByRange(3, $"amt")
    ManifestTable.commit(df, dir, track = Seq("amt"))
    val before = ManifestTable.manifest(dir, None)
    ManifestTable.widenColumn(dir, "amt", DecimalType(25, 2))
    val m = ManifestTable.manifest(dir, None)
    assert(m.files == before.files, "decimal widen must not touch any file entry")
    assert(DataFrameSchema.fromJson(m.schemaJson)("amt").dataType == DecimalType(25, 2))
    // narrow-file reads widen exactly; a value only the wide precision
    // can hold appends fine
    ManifestTable.commit(
      spark.sql("SELECT CAST(99 AS BIGINT) AS id, " +
        "CAST('123456789012345678901.50' AS DECIMAL(25,2)) AS amt"), dir, Seq("amt"))
    val total = ManifestTable.snapshot(spark, dir)
      .agg(sum($"amt")).head.getDecimal(0)
    val want = (1 to 50).map(i => BigDecimal(i) * BigDecimal("1.25")).sum +
      BigDecimal("123456789012345678901.50")
    assert(BigDecimal(total) == want, s"got $total want $want")
    // decimal stat strings parse exactly under the wide type: pruning
    // on the widened tracked column opens only the overlapping era file
    val got = ManifestTable.prunedScan(spark, dir, "amt",
        lit(BigDecimal("2.00")), lit(BigDecimal("5.00")))
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == (2 to 4).map(_.toLong), s"got $got")
    val live = ManifestTable.livePaths(spark, dir, "amt",
      lit(BigDecimal("2.00")), lit(BigDecimal("5.00")))
    assert(live.size == 1, s"range-clustered narrow files must still prune: $live")
  }

  test("unsafe retypes refuse loudly; bucket-source widen refuses") {
    val dir = tmpDir("widen-refuse").toString
    ManifestTable.commit(
      Seq((1, 1.5, BigDecimal("1.50"), "x")).toDF("i", "d", "dc", "s")
        .selectExpr("i", "CAST(d AS DOUBLE) d", "CAST(dc AS DECIMAL(10,2)) dc", "s"),
      dir, track = Seq("i"))
    def refuse(c: String, t: DataType, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](ManifestTable.widenColumn(dir, c, t))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    refuse("i", ShortType, "not a safe")          // narrowing
    refuse("d", FloatType, "not a safe")          // narrowing
    refuse("dc", DecimalType(20, 4), "not a safe") // scale change
    refuse("i", StringType, "not a safe")         // cross-family
    refuse("s", IntegerType, "not a safe")        // cross-family
    // bucket-tracked source: envelope holds narrow-type hashes
    val bdir = tmpDir("widen-bucket").toString
    ManifestTable.commit(Seq((1, "a")).toDF("k", "v"), bdir, track = Seq("bucket(8,k)"))
    val e = intercept[IllegalArgumentException](
      ManifestTable.widenColumn(bdir, "k", LongType))
    assert(e.getMessage.contains("bucket"), e.getMessage)
  }

  test("member index: fingerprints never carry across a widen; stale bloom never prunes") {
    val dir = tmpDir("widen-ix").toString
    ManifestTable.commit(
      (1 to 50).map(i => (i, s"v$i")).toDF("k", "v").repartition(4), dir, Seq())
    val v1 = MemberIndex.build(spark, dir, "k", bits = 256, probes = 2)
    ManifestTable.widenColumn(dir, "k", LongType)
    ManifestTable.commit(Seq((9000000000L, "big")).toDF("k", "v"), dir, Seq())
    // a fresh build at the post-widen head must re-fingerprint every
    // file under the LONG hashing, not carry the int-era bitsets
    val v2 = MemberIndex.build(spark, dir, "k", bits = 256, probes = 2)
    assert(v2 > v1)
    val hit = MemberIndex.lookup(spark, dir, "k", Seq(7L))
      .select("v").as[String].collect().toSeq
    assert(hit == Seq("v7"),
      "post-widen indexed lookup must find the narrow-era row under its long key")
    assert(MemberIndex.lookup(spark, dir, "k", Seq(9000000000L)).count() == 1)
    // the planner-side guard: an index recorded under int never serves
    // a long probe (stale bloom would be a false negative = wrong rows)
    val stale = MemberIndex.newest(dir, "k").get
    assert(stale.dataType.contains("bigint"))
    assert(MemberIndex.typeConsistent(stale, dir, LongType))
    assert(!MemberIndex.typeConsistent(stale.copy(dataType = Some("int")), dir, LongType))
    assert(!MemberIndex.typeConsistent(stale.copy(dataType = None), dir, LongType),
      "a legacy untyped index on a widened column must be refused")
  }

  test("equality tombstones survive the widen; restore carries the retype chain") {
    val dir = tmpDir("widen-mor").toString
    ManifestTable.commit((1 to 10).map(i => (i, s"v$i")).toDF("k", "v")
      .selectExpr("CAST(k AS INT) k", "v"), dir, Seq("k"))
    ManifestTable.deleteByKey(Seq(3).toDF("k").selectExpr("CAST(k AS INT) k"), dir, Seq("k"))
    ManifestTable.widenColumn(dir, "k", LongType)
    // the narrow-era tombstone (int key bytes) still applies through
    // the widened read
    assert(ManifestTable.snapshot(spark, dir).count() == 9)
    // and a post-widen tombstone with a long key applies too
    ManifestTable.deleteByKey(Seq(5L).toDF("k"), dir, Seq("k"))
    val left = ManifestTable.snapshot(spark, dir).select("k").as[Long].collect().sorted
    assert(left.toSeq == Seq(1L, 2L, 4L, 6L, 7L, 8L, 9L, 10L))
    val widenV = ManifestTable.manifest(dir, None).retypes.head.v
    ManifestTable.restore(dir, widenV)
    assert(ManifestTable.manifest(dir, None).retypes.nonEmpty,
      "restore must carry the retype provenance of the restored snapshot")
    assert(ManifestTable.snapshot(spark, dir).schema("k").dataType == LongType)
  }

  test("a narrow-frame append upcasts; stats land in the wide domain (bucket hashes included)") {
    // an old writer still producing ints after an int -> long widen
    // must keep working: the frame upcasts, the committed schema stays
    // long, and the new file's stats are collected READING it under
    // long — not rendered from the narrow frame
    val dir = tmpDir("widen-upcast").toString
    ManifestTable.commit((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      dir, track = Seq("id"))
    ManifestTable.commit((11 to 20).map(i => (i, s"v$i")).toDF("id", "v")
      .selectExpr("CAST(id AS INT) AS id", "v"), dir, Seq("id"))
    val m = ManifestTable.manifest(dir, None)
    assert(DataFrameSchema.fromJson(m.schemaJson)("id").dataType == LongType,
      "the committed schema must never narrow")
    assert(ManifestTable.snapshot(spark, dir).count() == 20)
    val got = ManifestTable.prunedScan(spark, dir, "id", lit(12L), lit(15L))
      .select("v").as[String].collect().toSeq.sorted
    assert(got == (12 to 15).map(i => s"v$i"),
      "the upcast file's envelope must prune correctly under the wide type")
    // mismatched cross-family frames still refuse
    assert(intercept[IllegalArgumentException](
      ManifestTable.commit(Seq(("x", "v")).toDF("id", "v"), dir, Seq("id"))
    ).getMessage.contains("retypes"))
    // the sharp case: a BUCKET-tracked long column appended with an
    // int frame — bucket envelopes hold hash values, and xxhash64 of
    // an int is NOT the hash of the same value as a long. Stats read
    // the staged file under long, so the derived bucket constraint
    // (hashing long probe values) must still FIND the rows.
    val bdir = tmpDir("widen-upcast-bucket").toString
    ManifestTable.commit(Seq((100L, "wide")).toDF("k", "v"), bdir, Seq("bucket(8,k)"))
    ManifestTable.commit(Seq((7, "narrow")).toDF("k", "v")
      .selectExpr("CAST(k AS INT) AS k", "v"), bdir, Seq("bucket(8,k)"))
    ManifestTable.createView(spark, bdir, "upcast_bucket_view")
    val hit = spark.sql("SELECT v FROM upcast_bucket_view WHERE k = 7")
      .as[String].collect().toSeq
    assert(hit == Seq("narrow"),
      "bucket pruning must not skip the upcast file (its hashes live in the wide domain)")
  }

  test("rename after widen re-keys the retype step; widen after rename uses alias stats") {
    val dir = tmpDir("widen-rename").toString
    ManifestTable.commit(Seq((1, 2.5f)).toDF("a", "f"), dir, track = Seq("f"))
    ManifestTable.widenColumn(dir, "f", DoubleType)
    ManifestTable.renameColumn(dir, "f", "g")
    val m = ManifestTable.manifest(dir, None)
    assert(m.retypes.map(_.column) == Seq("g"),
      "retype provenance must follow the live column name")
    // widen AFTER rename: the float stat rewrite must reach the
    // envelope keyed under the file's pre-rename name
    val dir2 = tmpDir("widen-rename2").toString
    ManifestTable.commit(Seq((1L, 1.1f)).toDF("id", "f"), dir2, track = Seq("f"))
    ManifestTable.renameColumn(dir2, "f", "g")
    ManifestTable.widenColumn(dir2, "g", DoubleType)
    val m2 = ManifestTable.manifest(dir2, None)
    assert(m2.files.head.maxs("f").get.toDouble == 1.1f.toDouble,
      "the alias-keyed envelope must be rewritten through the exact conversion")
    val got = ManifestTable.prunedScan(spark, dir2, "g", lit(1.1000000001), lit(1.2))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
