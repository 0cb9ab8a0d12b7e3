package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file MEMBERSHIP fingerprints for a [[ManifestTable]] column —
  * the point-lookup analogue of the manifest's min/max envelopes, in
  * the role parquet/Iceberg bloom filters play: "find THIS key" on a
  * column the table is NOT clustered by.
  *
  * Why min/max is not enough: a table range-clustered on time has tight
  * `ts` envelopes but every file's key envelope spans the whole key
  * domain (keys arrive shuffled in time), so an equality lookup on the
  * key opens every file. A per-file Bloom bitset answers "might this
  * file contain k?" with NO false negatives — a lookup opens only the
  * files whose fingerprint matches, and the exact predicate still runs
  * on the survivors, so the result is bit-identical to the plain
  * filter. False positives cost only I/O, never correctness.
  *
  * The index is a DERIVED SIDECAR, not part of the commit protocol:
  * it lives under `dir/_index/member-<col>/ix-<version>.json`, can be
  * (re)built for any retained snapshot, and is maintained
  * INCREMENTALLY — building version N hashes only the files that a
  * prior index has not covered (a copy-on-write commit touches few
  * files, so maintenance is O(changed files), the same
  * touched-bucket-only discipline as the LSH/BM25 index appends).
  * A missing or stale index can always fall back to the full file
  * list; nothing transactional depends on it.
  *
  * Merge-on-read deletes need no index maintenance: tombstoned rows
  * stay fingerprinted (a false positive at worst — extra file opened),
  * and [[lookup]] reads through the manifest's applied path, so it can
  * never resurrect a deleted row.
  *
  * Sizing (`bits` per file, `probes` hash functions): false-positive
  * rate ≈ (1 - e^(-probes·n/bits))^probes for n distinct keys per
  * file. The 256 Ki-bit default holds fp ≈ 1% at ~20k keys/file;
  * at a real 100 TB layout (~1M keys/file) size bits to ~8·n (1 MB of
  * fingerprint per GB-scale file — the arithmetic parquet's own
  * bloom filters use). Hashing is Spark's xxhash64 — engine-internal
  * only, so no cross-engine determinism contract is needed: the
  * fingerprint never decides a RESULT, only which files are read.
  */
object MemberIndex {

  /** One built index: fingerprints per live data file of one snapshot.
    * `dataType` records the column type the fingerprints were HASHED
    * under (xxhash64 of an int and of the same value as a long differ)
    * — a type widening invalidates the bitsets, and the recorded type
    * is what lets consumers notice. None only on legacy pre-recording
    * index files.
    */
  final case class Index(
      version: Long,
      column: String,
      bits: Int,
      probes: Int,
      files: Map[String, String],
      dataType: Option[String] = None)

  /** Build (or reuse) the index for `column` at snapshot `asOf` (head
    * by default) and return the indexed version. Incremental: files
    * already fingerprinted by the most recent prior index with the
    * same (bits, probes) carry over without being read; only new files
    * are scanned — one map pass + one tiny per-file distinct-position
    * aggregate (O(bits) metadata per file on the driver, the same
    * control-plane contract as the manifest's stats).
    */
  def build(
      spark: SparkSession, dir: String, column: String,
      bits: Int = 1 << 18, probes: Int = 3,
      asOf: Option[Long] = None): Long = {
    require(bits >= 64 && probes >= 1, s"need bits >= 64 and probes >= 1: $bits, $probes")
    val m = ManifestTable.manifest(dir, asOf)
    val schema = DataFrameSchema.fromJson(m.schemaJson)
    require(schema.fieldNames.contains(column),
      s"column $column is not in the committed schema (${schema.fieldNames.mkString(", ")})")
    if (load(dir, column, m.version).exists(ix => ix.bits == bits && ix.probes == probes))
      return m.version
    val dt = schema(column).dataType
    val carried: Map[String, String] =
      priorIndex(dir, column, bits, probes, m.version) match {
        // fingerprints only carry across versions when they were hashed
        // under the SAME column type: a widen between the prior build
        // and this snapshot changes every value's xxhash64, and carried
        // bitsets would answer "definitely absent" for present keys —
        // Bloom false negatives, i.e. wrongly pruned live files. A
        // legacy prior (no recorded type) proves its build type through
        // the schema committed at its own version; an expired manifest
        // there just forfeits the carry (re-fingerprint, never guess).
        case Some(prior) if prior.dataType.map(_ == dt.catalogString).getOrElse(
            scala.util.Try(DataFrameSchema.fromJson(
              ManifestTable.manifest(dir, Some(prior.version)).schemaJson)(column)
              .dataType == dt).getOrElse(false)) =>
          val live = m.files.map(_.path).toSet
          prior.files.filter { case (p, _) => live.contains(p) }
        case _ => Map.empty
      }
    val newPaths = m.files.map(_.path).filterNot(carried.contains)
    val fresh: Map[String, String] =
      if (newPaths.isEmpty) Map.empty
      else {
        val posCols = (0 until probes).map(i =>
          pmod(xxhash64(lit(i), col(column)), lit(bits.toLong)).cast("int"))
        // era-aware read: a pre-rename file's bytes live under the old
        // physical name; a plain fixed-schema read would fingerprint it
        // as all-NULL — an EMPTY bitset, i.e. Bloom FALSE NEGATIVES
        val grouped = ManifestTable.readData(spark, m, newPaths)
          .filter(col(column).isNotNull) // NULL never equals a lookup key
          .select(input_file_name().as("path"), explode(array(posCols: _*)).as("pos"))
          .groupBy("path")
          .agg(collect_set(col("pos")).as("ps"))
          .collect()
          .map(r => stripScheme(r.getString(0)) -> toHex(r.getSeq[Int](1), bits))
          .toMap
        // a live file with ZERO non-null values never groups — its
        // fingerprint is the empty bitset (matches nothing), not a gap
        // that would force the fallback path
        newPaths.map(p => p -> grouped.getOrElse(p, toHex(Nil, bits))).toMap
      }
    val ix = Index(m.version, column, bits, probes, carried ++ fresh,
      dataType = Some(dt.catalogString))
    write(dir, ix)
    m.version
  }

  /** The files of snapshot `asOf` that MAY contain any of `keys` —
    * resolved from O(files) metadata, no data I/O. Superset contract:
    * every file that truly contains a key is returned (Bloom has no
    * false negatives); extra files are possible and harmless. Requires
    * [[build]] for the snapshot (fail loudly rather than silently scan
    * everything — the caller chose an indexed read).
    */
  def candidatePaths(
      spark: SparkSession, dir: String, column: String, keys: Seq[Any],
      asOf: Option[Long] = None): Seq[String] = {
    require(keys.nonEmpty && keys.forall(_ != null), "need non-null lookup keys")
    val m = ManifestTable.manifest(dir, asOf)
    val ix = load(dir, column, m.version).getOrElse(throw new IllegalStateException(
      s"no member index for $column at v=${m.version} of $dir — run MemberIndex.build first"))
    val dt = DataFrameSchema.fromJson(m.schemaJson)(column).dataType
    // hash the keys through the SAME Spark expressions that built the
    // fingerprints (ONE local job over a |keys|-row literal plan) —
    // never a re-implementation that could drift from xxhash64's
    // semantics
    val posCols = (0 until ix.probes).map(i =>
      pmod(xxhash64(lit(i), col("__k")), lit(ix.bits.toLong)).cast("int"))
    val keyPos: Seq[Seq[Int]] = keys
      .map(k => spark.range(1).select(lit(k).cast(dt).as("__k")))
      .reduce(_ unionByName _)
      .select(array(posCols: _*))
      .collect().map(_.getSeq[Int](0)).toSeq
    m.files.map(_.path).filter { p =>
      val hex = ix.files.getOrElse(p, throw new IllegalStateException(
        s"member index for $column at v=${m.version} is missing file $p — rebuild"))
      keyPos.exists(ps => ps.forall(bitSet(hex, _)))
    }
  }

  /** Point lookup `column IN (keys)` opening only fingerprint-matching
    * files — bit-identical to the same filter over the full snapshot.
    */
  def lookup(
      spark: SparkSession, dir: String, column: String, keys: Seq[Any],
      asOf: Option[Long] = None): DataFrame = {
    val m = ManifestTable.manifest(dir, asOf)
    // pin BOTH phases to the one resolved snapshot: with asOf = None a
    // concurrent commit landing between two head reads would apply
    // version N+1's candidate paths against version N's manifest — the
    // applied read's sequence join then silently drops rows from files
    // the older manifest lacks
    val paths = candidatePaths(spark, dir, column, keys, asOf = Some(m.version))
    // the applied read honors pending merge-on-read deletes — an
    // index-routed lookup must never resurrect a tombstoned row
    ManifestTable.appliedRead(spark, m, paths)
      .filter(col(column).isin(keys: _*))
  }

  // ---------------------------------------------- planner-facing surface

  /** The newest built index for (dir, column), if any — the lookup the
    * injected [[graft.plans.ManifestSkipping]] rule uses to give plain
    * `spark.sql` point predicates the same file skipping [[lookup]]
    * gives API callers. Per-file fingerprints are content digests of
    * IMMUTABLE files, so an entry stays valid for any snapshot that
    * still references the file — the rule may consult an index built
    * at an older version and simply finds no entry for newer files
    * (which then cannot be skipped). Parsed index documents are
    * memoized by path (they are immutable once written).
    */
  private[graft] def newest(dir: String, column: String): Option[Index] = {
    val d = ixDir(dir, column)
    if (!java.nio.file.Files.exists(d)) return None
    Option(d.toFile.list()).getOrElse(Array.empty).toSeq
      .collect { case n if n.startsWith("ix-") && n.endsWith(".json") =>
        n.stripPrefix("ix-").stripSuffix(".json").toLong }
      .sorted.reverse.iterator
      .map(v => parseCache.computeIfAbsent(d.resolve(ixName(v)).toString, { p =>
        parse(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8"))
      }))
      .nextOption()
  }

  private val parseCache =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  /** Driver-side bit positions for one INTERNAL Catalyst value — the
    * EXACT expressions the build ran (`pmod(xxhash64(lit(i), col),
    * bits)`), evaluated interpreted, so planner-side hashing can never
    * drift from executor-side fingerprinting. `dt` must be the
    * column's committed type (the caller compares attribute types).
    */
  private[graft] def positionsOf(ix: Index, value: Any, dt: org.apache.spark.sql.types.DataType): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    (0 until ix.probes).map { i =>
      val h = XxHash64(Seq(
        Literal(i, org.apache.spark.sql.types.IntegerType),
        Literal(value, dt)), 42L).eval(null).asInstanceOf[Long]
      (((h % ix.bits) + ix.bits) % ix.bits).toInt
    }
  }

  /** May file `path` contain a value hashing to `positions`? TRUE when
    * the file has no fingerprint (not indexed yet — cannot skip).
    */
  private[graft] def mightContain(ix: Index, path: String, positions: Seq[Int]): Boolean =
    ix.files.get(path) match {
      case Some(hex) => positions.forall(bitSet(hex, _))
      case None => true
    }

  // ------------------------------------------------------------- internals

  private def ixDir(dir: String, column: String) =
    java.nio.file.Paths.get(dir, "_index", s"member-$column")

  private def ixName(v: Long) = f"ix-$v%012d.json"

  private def load(dir: String, column: String, v: Long): Option[Index] = {
    val p = ixDir(dir, column).resolve(ixName(v))
    if (!java.nio.file.Files.exists(p)) None
    else Some(parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")))
  }

  /** Newest prior index with compatible sizing, if any. */
  private def priorIndex(
      dir: String, column: String, bits: Int, probes: Int, before: Long): Option[Index] = {
    val d = ixDir(dir, column)
    if (!java.nio.file.Files.exists(d)) return None
    val versions = d.toFile.list().toSeq
      .collect { case n if n.startsWith("ix-") && n.endsWith(".json") =>
        n.stripPrefix("ix-").stripSuffix(".json").toLong }
      .filter(_ < before).sorted.reverse
    versions.iterator.flatMap(v => load(dir, column, v))
      .find(ix => ix.bits == bits && ix.probes == probes)
  }

  /** Atomic create-if-absent (the index for a (dir, column, version) is
    * immutable once built — concurrent builders converge on whichever
    * landed first, both correct because the build is deterministic).
    */
  private def write(dir: String, ix: Index): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val d = ixDir(dir, ix.column)
    java.nio.file.Files.createDirectories(d)
    val body = JsonMethods.compact(JsonMethods.render(
      ("version" -> ix.version) ~ ("column" -> ix.column) ~ ("bits" -> ix.bits) ~
        ("probes" -> ix.probes) ~ ("files" -> ix.files) ~
        ("dataType" -> ix.dataType)))
    try java.nio.file.Files.write(d.resolve(ixName(ix.version)),
      body.getBytes("UTF-8"), java.nio.file.StandardOpenOption.CREATE_NEW): Unit
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  private def parse(s: String): Index = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    Index(
      (j \ "version").extract[Long],
      (j \ "column").extract[String],
      (j \ "bits").extract[Int],
      (j \ "probes").extract[Int],
      (j \ "files").extract[Map[String, String]],
      (j \ "dataType").extractOpt[String])
  }

  /** Distinct-count ESTIMATE for `paths` from the Bloom fill ratios —
    * the standard inversion n ≈ -(bits/probes)·ln(1 - k/bits) per
    * file, summed. An UPPER-bound-flavored estimate (values shared
    * across files count once per file) for the CBO's
    * `Statistics.columnStats`, never a pruning decision. None when the
    * index does not cover every path (a partial sum would silently
    * understate) or any fingerprint is saturated (the inversion
    * diverges).
    */
  private[graft] def estimatedDistinct(ix: Index, paths: Seq[String]): Option[Long] = {
    var sum = 0.0
    paths.foreach { p =>
      ix.files.get(p) match {
        case None => return None
        case Some(hex) =>
          var k = 0
          var i = 0
          while (i < hex.length) {
            val d = Character.digit(hex.charAt(i), 16)
            // corrupt (non-hex) fingerprint: refuse like saturation —
            // bitCount(-1) = 32 would silently inflate the fill count
            // and feed a garbage NDV to the CBO
            if (d < 0) return None
            k += Integer.bitCount(d); i += 1
          }
          if (k >= ix.bits) return None
          sum += -(ix.bits.toDouble / ix.probes) * math.log1p(-k.toDouble / ix.bits)
      }
    }
    Some(math.max(0L, math.round(sum)))
  }

  /** Were `ix`'s fingerprints hashed under type `dt`? Consumers that
    * probe with planner-side values of the CURRENT column type
    * (xxhash64 is type-sensitive) must refuse an index built under a
    * narrower pre-widening type. A legacy index (no recorded type) is
    * consistent iff the column was never widened on this table.
    */
  private[graft] def typeConsistent(
      ix: Index, dir: String, dt: org.apache.spark.sql.types.DataType): Boolean =
    ix.dataType match {
      case Some(s) => s == dt.catalogString
      case None => scala.util.Try(
        ManifestTable.manifest(dir, None).retypes.forall(_.column != ix.column)
      ).getOrElse(false)
    }

  /** Distinct bit positions -> fixed-width lowercase hex (4 bits per
    * char, position 0 = LSB of the last char, so width = bits/4).
    */
  private def toHex(positions: Seq[Int], bits: Int): String = {
    val nibbles = new Array[Int]((bits + 3) / 4)
    positions.foreach { p => nibbles(p >> 2) |= 1 << (p & 3) }
    val sb = new StringBuilder(nibbles.length)
    var i = nibbles.length - 1
    while (i >= 0) { sb.append(Character.forDigit(nibbles(i), 16)); i -= 1 }
    sb.toString
  }

  private def bitSet(hex: String, pos: Int): Boolean = {
    val nib = Character.digit(hex.charAt(hex.length - 1 - (pos >> 2)), 16)
    (nib & (1 << (pos & 3))) != 0
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
}
