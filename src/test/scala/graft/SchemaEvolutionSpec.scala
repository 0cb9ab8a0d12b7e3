package graft

import graft.sources.{ManifestTable, MemberIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column RENAME and DROP as metadata-only evolution
  * ([[ManifestTable.renameColumn]] / [[ManifestTable.dropColumns]]):
  * zero data I/O at any table size (a naive lake rename is a full
  * rewrite), rename-ERA grouped reads (a file's entry sequence vs the
  * committed [[ManifestTable.RenameStep]] chain decides which physical
  * name its bytes carry), retired names that can never resurrect old
  * bytes, alias-aware envelope pruning, and the guards that keep the
  * merge-on-read and streaming surfaces honest.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def plannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Seq.empty
      }
    }.flatten

  test("renameColumn is metadata-only; both eras read correctly; chain composes") {
    val dir = tmpDir("mt-rename").toString
    ManifestTable.commit(
      (1 to 5).map(i => (i.toLong, s"a$i")).toDF("id", "v").repartition(2), dir, Seq("id"))
    val filesBefore = ManifestTable.manifest(dir, None).files.map(_.path).toSet
    ManifestTable.renameColumn(dir, "v", "val")
    val m = ManifestTable.manifest(dir, None)
    assert(m.files.map(_.path).toSet == filesBefore, "rename must write no data")
    assert(m.renames == Seq(ManifestTable.RenameStep(2L, "v", "val")) &&
      m.retired == Seq("v"))
    assert(m.renamesApply, "live v1 files predate the rename")
    // post-rename era appends under the new name
    ManifestTable.commit(
      (6 to 8).map(i => (i.toLong, s"a$i")).toDF("id", "val").repartition(1), dir, Seq("id"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "val"))
    assert(snap.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      (1 to 8).map(i => (i.toLong, s"a$i")))
    // chained rename: the oldest era now reads through TWO steps
    ManifestTable.renameColumn(dir, "val", "w")
    val snap2 = ManifestTable.snapshot(spark, dir)
    assert(snap2.columns.toSeq == Seq("id", "w"))
    assert(snap2.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      (1 to 8).map(i => (i.toLong, s"a$i")))
    // time travel sees the era's own names
    assert(ManifestTable.snapshot(spark, dir, Some(1L)).columns.toSeq == Seq("id", "v"))
    assert(ManifestTable.snapshot(spark, dir, Some(2L)).columns.toSeq == Seq("id", "val"))
  }

  test("rename interacts with additive evolution: columns added between renames") {
    val dir = tmpDir("mt-renadd").toString
    ManifestTable.commit(Seq((1L, "x1")).toDF("id", "v"), dir, Seq("id")) // v1
    ManifestTable.addColumns(dir, Seq(StructField("extra", LongType))) // v2
    ManifestTable.renameColumn(dir, "v", "val") // v3
    ManifestTable.commit(Seq((2L, "x2", 20L)).toDF("id", "val", "extra"), dir, Seq("id")) // v4
    val got = ManifestTable.snapshot(spark, dir)
      .select("id", "val", "extra").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "x1", None), (2L, "x2", Some(20L))),
      s"pre-evolution file reads val via the chain and extra as NULL: $got")
  }

  test("rename guards: clash, retired resurrection, reserved prefix, pending delete keys") {
    val dir = tmpDir("mt-renguard").toString
    ManifestTable.commit(Seq((1L, "x", 2L), (3L, "y", 4L)).toDF("id", "v", "k"), dir, Seq("id"))
    ManifestTable.renameColumn(dir, "v", "val")
    intercept[IllegalArgumentException](ManifestTable.renameColumn(dir, "val", "id"))
    intercept[IllegalArgumentException](ManifestTable.renameColumn(dir, "val", "v"))
    intercept[IllegalArgumentException](ManifestTable.renameColumn(dir, "val", "__x"))
    intercept[IllegalArgumentException](ManifestTable.renameColumn(dir, "nope", "x2"))
    intercept[IllegalArgumentException](
      ManifestTable.addColumns(dir, Seq(StructField("v", StringType))))
    // equality tombstones pending on key k: its rename/drop must refuse
    ManifestTable.deleteByKey(Seq(2L).toDF("k"), dir, keys = Seq("k"))
    intercept[IllegalArgumentException](ManifestTable.renameColumn(dir, "k", "kk"))
    intercept[IllegalArgumentException](ManifestTable.dropColumns(dir, Seq("k")))
    // renaming a NON-key column composes with pending tombstones: the
    // applied read folds the delete AND the rename chain
    ManifestTable.renameColumn(dir, "val", "w")
    val got = ManifestTable.snapshot(spark, dir).select("id", "w", "k")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((3L, "y", 4L)), s"tombstone for k=2 applied, rename read: $got")
    // after materializing, the key column renames fine
    ManifestTable.materializeDeletes(spark, dir)
    ManifestTable.renameColumn(dir, "k", "kk")
    assert(ManifestTable.snapshot(spark, dir).columns.toSeq == Seq("id", "w", "kk"))
  }

  test("dropColumns is metadata-only; re-add refused; old snapshots keep the column") {
    val dir = tmpDir("mt-drop").toString
    ManifestTable.commit(
      (1 to 4).map(i => (i.toLong, s"s$i", i * 1.5)).toDF("id", "s", "x"), dir, Seq("id"))
    val filesBefore = ManifestTable.manifest(dir, None).files.map(_.path).toSet
    ManifestTable.dropColumns(dir, Seq("x"))
    val m = ManifestTable.manifest(dir, None)
    assert(m.files.map(_.path).toSet == filesBefore, "drop must write no data")
    assert(m.retired == Seq("x"))
    assert(ManifestTable.snapshot(spark, dir).columns.toSeq == Seq("id", "s"))
    assert(ManifestTable.snapshot(spark, dir, Some(1L)).columns.toSeq == Seq("id", "s", "x"))
    intercept[IllegalArgumentException](
      ManifestTable.addColumns(dir, Seq(StructField("x", DoubleType))))
    // dropping a renamed column retires the CURRENT name; the old one
    // was retired by the rename itself
    ManifestTable.renameColumn(dir, "s", "str")
    ManifestTable.dropColumns(dir, Seq("str"))
    assert(ManifestTable.manifest(dir, None).retired.toSet == Set("x", "s", "str"))
    assert(ManifestTable.snapshot(spark, dir).columns.toSeq == Seq("id"))
  }

  test("era-pushed filters keep envelope pruning on pre-rename files") {
    val dir = tmpDir("mt-renprune").toString
    val df = (1 to 1000).map(i => (i.toLong, s"s${i % 13}")).toDF("id", "cat")
    ManifestTable.commit(df.repartitionByRange(5, $"id"), dir, track = Seq("id"))
    ManifestTable.renameColumn(dir, "id", "key")
    // the snapshot plan carries the era projection; a range filter on
    // the renamed column pushes to the scan under the OLD name and the
    // alias-aware tracked() lets it prune the 5 range-clustered files
    val q = ManifestTable.snapshot(spark, dir).filter(col("key") between (100, 120))
    assert(q.count() == 21)
    val planned = plannedFiles(q)
    assert(planned.nonEmpty && planned.size <= 1,
      s"era-name envelope pruning must engage: planned ${planned.size} of 5 files")
  }

  test("MemberIndex builds era-aware fingerprints (no false negatives across rename)") {
    val dir = tmpDir("mt-renbloom").toString
    ManifestTable.commit(
      (1 to 500).map(i => (i.toLong, s"u${i % 50}")).toDF("id", "user").repartition(4),
      dir, Seq("id"))
    ManifestTable.renameColumn(dir, "user", "uid")
    MemberIndex.build(spark, dir, "uid")
    // every file holds u7 rows (uniform mod-50 spread over 4 hash parts
    // is dense); a false-negative empty fingerprint would prune them all
    val cand = MemberIndex.candidatePaths(spark, dir, "uid", Seq("u7"))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(cand.nonEmpty, "era-aware build must fingerprint old files' real bytes")
    // no false negatives: every file that actually holds a u7 row must
    // be a candidate (a plain-schema build would fingerprint old files
    // as all-NULL and prune them all)
    val holding = ManifestTable.snapshot(spark, dir).filter(col("uid") === "u7")
      .select(input_file_name().as("f")).distinct().as[String].collect()
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(holding.nonEmpty && holding.subsetOf(cand),
      s"candidates $cand must cover every u7-holding file $holding")
  }

  test("change feed across a rename boundary adopts the head's chain") {
    val dir = tmpDir("mt-renfeed").toString
    ManifestTable.commit((1 to 3).map(i => (i.toLong, s"a$i")).toDF("id", "v"), dir, Seq("id")) // v1
    ManifestTable.commit(Seq((4L, "a4")).toDF("id", "v"), dir, Seq("id")) // v2 (pre-rename era)
    ManifestTable.renameColumn(dir, "v", "val") // v3
    ManifestTable.commit(Seq((5L, "a5")).toDF("id", "val"), dir, Seq("id")) // v4
    // the range spans the rename: the v2 file's bytes live under 'v',
    // the v4 file's under 'val' — the feed adopts the head's chain and
    // reads each era under its own names
    val feed = ManifestTable.changes(spark, dir, 1L, 4L)
    assert(feed.columns.contains("val") && !feed.columns.contains("v"))
    val got = feed.select("_change", "id", "val").as[(String, Long, String)]
      .collect().sortBy(_._2).toSeq
    assert(got == Seq(("insert", 4L, "a4"), ("insert", 5L, "a5")),
      s"both eras surface under the head's names: $got")
  }

  test("CoW delete/merge compute through the rename chain; rewrites land in the current era") {
    val dir = tmpDir("mt-rendml").toString
    ManifestTable.commit(
      (1 to 10).map(i => (i.toLong, s"a$i")).toDF("id", "v").repartition(2), dir, Seq("id"))
    ManifestTable.renameColumn(dir, "v", "val")
    // CoW delete on the RENAMED column: reads era-correctly, rewrites
    // only touched files, and the rewritten files carry the new name
    ManifestTable.delete(spark, dir, col("val") === "a3")
    val m = ManifestTable.manifest(dir, None)
    assert(!m.renamesApply || m.files.exists(f => m.renames.exists(_.v > f.seq)))
    val got = ManifestTable.snapshot(spark, dir).as[(Long, String)].collect().sortBy(_._1)
    assert(got.length == 9 && !got.exists(_._2 == "a3"))
    // and a rewritten-era file reads under the current name directly
    val rewritten = m.files.filter(f => m.renames.forall(_.v <= f.seq))
    assert(rewritten.nonEmpty, "the delete must have produced current-era files")
  }

  test("restore and compact carry/clear the chain correctly") {
    val dir = tmpDir("mt-renrestore").toString
    ManifestTable.commit((1 to 6).map(i => (i.toLong, s"a$i")).toDF("id", "v"), dir, Seq("id")) // v1
    ManifestTable.renameColumn(dir, "v", "val") // v2
    ManifestTable.commit(Seq((7L, "a7")).toDF("id", "val"), dir, Seq("id")) // v3
    // full compact rewrites every file into the current era: the V2
    // fast path reopens (renamesApply false) though the chain persists
    ManifestTable.compact(spark, dir, clusterBy = "id", numFiles = 2) // v4
    val m4 = ManifestTable.manifest(dir, None)
    assert(m4.renames.nonEmpty && !m4.renamesApply,
      "compact rewrote all files into the current era")
    assert(ManifestTable.snapshot(spark, dir).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      (1 to 7).map(i => (i.toLong, s"a$i")))
    // restore to the pre-rename snapshot resurrects its schema AND empty chain
    ManifestTable.restore(dir, 1L)
    val r = ManifestTable.manifest(dir, None)
    assert(r.renames.isEmpty && ManifestTable.snapshot(spark, dir).columns.toSeq == Seq("id", "v"))
  }
}
