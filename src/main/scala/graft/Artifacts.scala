package graft

/** Process-level cache of train-once/serve-many artifacts (phrase
  * index, LSH band index, bigram LM model, SCD2 dimension).
  *
  * Why: the serve path of an indexed operator must not pay the build
  * on every invocation — a production deployment builds the index once
  * and serves it for hours (the `buildIvfIndex`/`annIvfIndexed`
  * pattern in [[graft.api.VectorSearch]]). `cached` keys an artifact
  * by (kind, input) and builds at most once per JVM; every later call
  * returns the stored path immediately. The benchmark's min-of-N
  * interleaved sweeps then measures the amortized serve path, while
  * the dedicated `*_build` catalog entries time a fresh build via
  * [[scratch]].
  *
  * All artifact directories live under one managed temp root deleted
  * by a JVM shutdown hook — a bench run no longer leaks one temp dir
  * per query construction (5 sweeps x N indexed queries).
  */
object Artifacts {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val root: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-artifacts")
    sys.addShutdownHook(deleteRec(d.toFile))
    d
  }

  private def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Return the artifact directory for `key`, building it (at most
    * once per process) if absent. `build` receives a fresh empty
    * directory path. A failed build does not poison the cache.
    */
  def cached(key: String)(build: String => Unit): String =
    cache.computeIfAbsent(key, { _ =>
      val p = java.nio.file.Files.createTempDirectory(root, "art").toString
      build(p)
      p
    })

  /** A fresh directory under the managed root (cleaned at JVM exit)
    * for callers that WANT to rebuild every time — the timed `*_build`
    * bench entries.
    */
  def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
