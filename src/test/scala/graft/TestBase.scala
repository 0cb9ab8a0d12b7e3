package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (Test/fork gives us a
  * single JVM); tests must not mutate session-global state.
  */
object TestSessions {
  lazy val spark: SparkSession = Engine.session("graft-test", sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "4"))
}

trait SparkSpec extends AnyFunSuite {
  // stable val so `import spark.implicits._` works in subclasses
  lazy val spark: SparkSession = TestSessions.spark
  def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }
}

object Fixtures {
  /** Author a zip fixture (FIXTURES.md §B1 shape: metadata.json + one
    * JSON-lines member per entity).
    */
  def writeZip(path: Path, members: Seq[(String, String)]): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    try members.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
  }
}
