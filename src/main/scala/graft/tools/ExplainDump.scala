package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{Engine, SparkEntry}

/** Dumps `.explain("formatted")` output for catalog queries to files —
  * the plan-audit artifact the optimization rounds commit under
  * `plans/r<N>/<query>_{before,after}.txt`.
  *
  * Usage: sbt "runMain graft.tools.ExplainDump <outDir> <suffix> q130_basket_pairs ..."
  * Reads the data dir from SPARK_GRAFT_SF_DIR (same contract as Bench).
  * Plans are captured WITHOUT executing the query (logical → physical
  * planning only), so AQE shows the initial plan; runtime re-planning is
  * bench/UI territory. Queries whose construction itself runs jobs
  * (eager audits, artifact builds) do run those.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <query>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "graft-explain")
    Files.createDirectories(outDir)
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"no such query: $n"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] wrote ${outDir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}
