package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the process-level artifact cache the amortized
  * bench/serve paths depend on: one build per key per JVM even under
  * concurrent first use, distinct scratch dirs, and no poisoned cache
  * after a failed build.
  */
class ArtifactsSpec extends AnyFunSuite {

  test("cached: builds exactly once under 8-way concurrent first use; later calls return the same path") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = Artifacts.cached("spec-key-concurrent") { dir =>
            builds.incrementAndGet()
            Thread.sleep(100) // widen the race window
            java.nio.file.Files.write(java.nio.file.Paths.get(dir, "x"), Array[Byte](1))
          }
        })
      }
      tasks.foreach(t => paths.add(t.get()))
    } finally pool.shutdownNow()
    assert(builds.get() === 1, "concurrent first use must build once")
    assert(paths.size() === 1, "every caller must see the same artifact path")
    assert(new java.io.File(paths.iterator().next(), "x").exists())
  }

  test("cached: a failed build propagates and does NOT poison the key; scratch dirs are always fresh") {
    intercept[RuntimeException] {
      Artifacts.cached("spec-key-fail") { _ => throw new RuntimeException("build boom") }
    }
    // the key stays buildable after the failure
    val p = Artifacts.cached("spec-key-fail") { dir =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "ok"), Array[Byte](1)): Unit
    }
    assert(new java.io.File(p, "ok").exists())
    // scratch never reuses a directory
    val s1 = Artifacts.scratch("specscratch")
    val s2 = Artifacts.scratch("specscratch")
    assert(s1 !== s2)
    assert(new java.io.File(s1).isDirectory && new java.io.File(s2).isDirectory)
  }
}
