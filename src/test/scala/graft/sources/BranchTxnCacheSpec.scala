package graft.sources

/** The per-branch txn-marker index behind [[ManifestTable.committedTxnOnBranch]]
  * — the streaming write's per-epoch replay check while
  * `spark.graft.wap.branch` routes. Installed branch manifests are
  * immutable per (dir, name, version), so markers memoize; the sharp
  * edge is INCARNATION reuse: a recreated branch of the same name
  * restarts version numbering, and a marker surviving from the dropped
  * incarnation would claim a replayed epoch already committed —
  * silently losing its rows.
  */
class BranchTxnCacheSpec extends graft.SparkSpec {
  import spark.implicits._

  test("a recreated branch does not inherit the dropped incarnation's txn markers") {
    val dir = tmpDir("btxn").toString
    ManifestTable.commit(
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir, track = Seq("id"))
    ManifestTable.createBranch(dir, "b")
    def stageAndCommit(txn: String, ids: Range): Long = {
      val df = ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
      val stage = s"$dir/data/c-${java.util.UUID.randomUUID()}"
      df.write.parquet(stage)
      ManifestTable.installStagedToBranch(
        spark, dir, "b", df.schema, Seq("id"), stage, Some(txn))
    }
    val v1 = stageAndCommit("epoch-0", 11 to 12)
    assert(ManifestTable.committedTxnOnBranch(dir, "b", "epoch-0").contains(v1))
    // memoized second lookup answers identically
    assert(ManifestTable.committedTxnOnBranch(dir, "b", "epoch-0").contains(v1))
    assert(ManifestTable.committedTxnOnBranch(dir, "b", "other").isEmpty)
    ManifestTable.dropBranch(dir, "b")
    ManifestTable.createBranch(dir, "b")
    // the new incarnation REUSES version numbers — the old marker must
    // not leak, or a replayed epoch would be silently swallowed
    assert(ManifestTable.committedTxnOnBranch(dir, "b", "epoch-0").isEmpty,
      "a dropped branch's txn markers must not survive into its recreated namesake")
    val v2 = stageAndCommit("epoch-1", 13 to 14)
    assert(v2 == v1, "fixture must actually reuse the version number")
    assert(ManifestTable.committedTxnOnBranch(dir, "b", "epoch-1").contains(v2))
    assert(ManifestTable.committedTxnOnBranch(dir, "b", "epoch-0").isEmpty)
  }
}
