package graft.streaming

import graft.sources.ManifestTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental CHANGE-FEED consumer for a [[ManifestTable]] — the
  * streaming CDF read Delta/Iceberg expose (`readChangeFeed` /
  * incremental scans): a consumer holds a durable VERSION CURSOR and
  * each poll drains exactly the commits it has not yet seen as
  * insert/delete rows, bounded by the files those commits touched —
  * the downstream half of the storage layer's CDC story
  * (`ManifestTable.changes` is the per-range primitive; this is the
  * long-lived subscription over it).
  *
  * Delivery contract:
  *  - the cursor advances ONLY AFTER the sink returns, so a crash
  *    between sink and advance re-delivers the same (from, to] range —
  *    at-least-once. A sink that is idempotent per range (e.g.
  *    [[ManifestTable.commit]] with `txn = "cdf-<from>-<to>"`, or
  *    [[graft.sources.ChangeFeedView.advance]] whose result is a
  *    deterministic function of the range) upgrades that to
  *    exactly-once end to end.
  *  - cursor state is a tiny create-if-absent marker file per advance
  *    (monotonic max wins), so concurrent pollers cannot tear it and a
  *    crashed advance is simply absent.
  *  - ranges crossing a tombstone-REMOVING maintenance boundary
  *    (materializeDeletes/replace/restore) fall back to
  *    [[ManifestTable.netChanges]]' full applied-snapshot diff — the
  *    cursor never wedges at a maintenance window; the fallback is
  *    table-sized work reserved for exactly those rare crossings.
  *  - RETENTION cannot wedge the cursor either: every poll registers
  *    a table-side CURSOR PIN ([[ManifestTable.pinCursor]]) at its
  *    base version, which [[ManifestTable.expireSnapshots]] respects —
  *    a lagging consumer's base snapshot stays retained until it
  *    drains (the Iceberg-branch-retention role). If the base was
  *    nonetheless expired (a pre-pin legacy cursor, or an operator
  *    dropped the pin), the poll RE-BASELINES instead of throwing:
  *    the sink receives the FULL head snapshot as `_change = 'insert'`
  *    rows with `from = `[[Rebaseline]] — a sentinel the sink MUST
  *    check, resetting its downstream state before folding, because a
  *    re-baseline is a replacement, not a delta.
  *
  * Scale shape: a poll is O(commits drained) metadata + the touched
  * files of those commits; an idle poll (cursor == head) is ONE head
  * resolution, no jobs.
  */
object ChangeFeedStream {

  /** `from` value of a re-baseline delivery: the frame is the full head
    * snapshot as inserts, not a delta — the sink resets its state first.
    */
  val Rebaseline: Long = -1L

  /** Initialize the cursor at `fromVersion` (consumption starts with
    * the NEXT commit). No-op if a cursor already exists — replaying a
    * deployment script must not rewind a live consumer.
    */
  def init(stateDir: String, fromVersion: Long): Unit = {
    new java.io.File(stateDir).mkdirs()
    if (cursor(stateDir).isEmpty) advanceCursor(stateDir, fromVersion)
  }

  /** [[init]] that ALSO registers the table-side retention pin up
    * front, closing the init-to-first-poll window in which a
    * maintenance run could expire the base version.
    */
  def init(dir: String, stateDir: String, fromVersion: Long): Unit = {
    init(stateDir, fromVersion)
    ManifestTable.pinCursor(dir, pinName(stateDir), cursor(stateDir).getOrElse(fromVersion))
  }

  /** Stable per-consumer pin name derived from the cursor's state
    * directory (the consumer's identity).
    */
  def pinName(stateDir: String): String = {
    val canonical = new java.io.File(stateDir).getAbsolutePath
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(canonical.getBytes("UTF-8"))
    "cdf-" + digest.take(6).map(b => f"$b%02x").mkString
  }

  def cursor(stateDir: String): Option[Long] =
    Option(new java.io.File(stateDir).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("cur-") && n.endsWith(".json") =>
        n.stripPrefix("cur-").stripSuffix(".json").toLong }
      .maxOption

  private def advanceCursor(stateDir: String, v: Long): Unit = {
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(stateDir, f"cur-$v%012d.json"),
      s"""{"version":$v}""".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW): Unit
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    // retire superseded markers (keep the newest two: the new head and
    // one predecessor, so a torn delete can never leave zero markers) —
    // a year of minutely polls must not mean half a million tiny files
    Option(new java.io.File(stateDir).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("cur-") && n.endsWith(".json") =>
        n.stripPrefix("cur-").stripSuffix(".json").toLong }
      .sorted.dropRight(2)
      .foreach(old => java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(stateDir, f"cur-$old%012d.json")): Unit)
  }

  /** Drain everything committed past the cursor: hand the feed rows
    * (with `_change` in {insert, delete}) plus the (from, to] range to
    * `sink`, then advance. Returns the drained range, or None when the
    * cursor is already at the head (idle poll: one metadata read).
    *
    * Every call (idle ones included) refreshes the table-side retention
    * pin, so even a consumer initialized through the legacy
    * `init(stateDir, from)` self-registers on its first poll. If the
    * base version was expired anyway, the delivery is a RE-BASELINE:
    * `sink(full head snapshot as inserts, Rebaseline, head)` — at-least-
    * once still holds (crash before advance re-delivers the baseline),
    * and the sink's [[Rebaseline]] check makes it state-reset-then-fold
    * rather than double-count.
    */
  def poll(
      spark: SparkSession, dir: String, stateDir: String,
      sink: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = cursor(stateDir).getOrElse(
      throw new IllegalStateException(s"no cursor under $stateDir — call init first"))
    val head = ManifestTable.latestVersion(dir).getOrElse(return None)
    if (head <= from) {
      // idle poll: still (re-)register the pin so retention can never
      // outrun this consumer — one tiny create-if-absent marker
      ManifestTable.pinCursor(dir, pinName(stateDir), from)
      return None
    }
    val (feed, effFrom) =
      if (ManifestTable.versions(dir).contains(from))
        (ManifestTable.netChanges(spark, dir, from, head), from)
      else
        // the base version is gone (expired before this consumer was
        // pinned): net changes from an unknown base are uncomputable,
        // so deliver the whole head snapshot as inserts, flagged by the
        // Rebaseline sentinel — recoverable, documented, loud in range
        (ManifestTable.snapshot(spark, dir, Some(head))
          .withColumn("_change", lit("insert")), Rebaseline)
    sink(feed, effFrom, head)
    advanceCursor(stateDir, head)
    ManifestTable.pinCursor(dir, pinName(stateDir), head)
    Some((effFrom, head))
  }

  /** Continuous deployment: poll on a trigger cadence (a 1-row rate
    * ticker drives the micro-batches; the feed work itself happens in
    * [[poll]], so an idle tick costs one head resolution).
    */
  def start(
      spark: SparkSession, dir: String, stateDir: String,
      sink: (DataFrame, Long, Long) => Unit,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1L).load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        poll(spark, dir, stateDir, sink): Unit
      }
      .start()
}
