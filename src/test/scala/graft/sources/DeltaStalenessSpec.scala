package graft.sources

/** Staleness guard of [[ManifestTable.installStagedDelta]] (the
  * merge-on-read SQL UPDATE/MERGE commit): the staged data files'
  * stat envelopes are collected under the BASE manifest's track spec,
  * so a track-spec evolution landing between staging and the CAS
  * install must refuse — otherwise the delta's files commit at a seq
  * that postdates the new column's trackSince watermark with NO
  * envelope for it, and ManifestSkipping reads the absent stat key as
  * an all-NULL envelope, silently pruning files with live matching
  * rows (wrong query results, not just layout drift).
  */
class DeltaStalenessSpec extends graft.SparkSpec {
  import spark.implicits._

  private def stageDelta(dir: String, rows: Seq[(Long, String, Double)],
                         keys: Seq[Long]): (String, String) = {
    val stage = s"$dir/data/c-delta-test-${java.util.UUID.randomUUID()}"
    val dataStage = s"$stage/rows"
    val keysStage = s"$stage/keys"
    rows.toDF("id", "v", "score").write.parquet(dataStage)
    keys.toDF("id").write.parquet(keysStage)
    (dataStage, keysStage)
  }

  test("installStagedDelta refuses when a column was tracked concurrently") {
    val dir = tmpDir("delta-stale").toString
    val df = (1 to 20).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "score")
    ManifestTable.commit(df, dir, track = Seq("id"))
    val base = ManifestTable.manifest(dir, None)
    val (dataStage, keysStage) =
      stageDelta(dir, Seq((3L, "patched", 99.0)), Seq(3L))
    // a concurrent writer starts tracking `score` AFTER this delta's
    // stats were collected under base.track = [id]
    ManifestTable.addTrackedColumn(dir, "score")
    val e = intercept[java.util.ConcurrentModificationException] {
      ManifestTable.installStagedDelta(
        spark, dir, base, df.schema, Seq("id"), dataStage, keysStage)
    }
    assert(e.getMessage.contains("track spec"))
    // table content untouched by the refused install
    assert(ManifestTable.snapshot(spark, dir).count() == 20)
    // re-staged against the NEW head (stats now collected under the
    // evolved track spec) the same statement commits fine...
    val head = ManifestTable.manifest(dir, None)
    val (d2, k2) = stageDelta(dir, Seq((3L, "patched", 99.0)), Seq(3L))
    ManifestTable.installStagedDelta(
      spark, dir, head, df.schema, Seq("id"), d2, k2): Unit
    val got = ManifestTable.snapshot(spark, dir)
      .filter($"id" === 3L).as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((3L, "patched", 99.0)))
    // ...and the new file's rows survive skipping on the newly tracked
    // column — the exact read the stale install would have corrupted
    val pruned = ManifestTable.prunedScan(spark, dir, "score",
        org.apache.spark.sql.functions.lit(98.0),
        org.apache.spark.sql.functions.lit(100.0))
      .as[(Long, String, Double)].collect().toSeq
    assert(pruned == Seq((3L, "patched", 99.0)),
      "skipping on the concurrently tracked column must still see the delta's rows")
  }
}
