package graft.tools

import graft.{Engine, SparkEntry, Tables}

/** Throwaway perf experiment harness (not part of the library API). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "graft-perf-scratch")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.customer, t.events, t.documents, t.embeddings)
      .foreach(df => df.limit(1).collect())

    // plan-dump mode: --plan <query> prints the finalized adaptive plan
    if (args.headOption.contains("--plan")) {
      args.drop(1).foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val p = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
          case pp => pp.toString
        }
        println(s"[scratch-plan] ==== $name ====\n" + p.linesIterator.map("[scratch-plan] " + _).mkString("\n"))
      }
      spark.stop()
      return
    }

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q12_setops", "q16_scalar_string", "q9_topk_sort", "q5_selective_agg",
        "q3_topk_join", "q10_window_rank", "q18_events_hourly", "q25_exact_dedup",
        "q1_agg", "q8_distinct_agg", "q52_cube", "q49_sessionize")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // interleaved: aqe-on sweep, aqe-off sweep, x3; per-(query,mode) min
    val best = scala.collection.mutable.Map.empty[(String, Boolean), Double]
    for (_ <- 1 to 3; aqe <- Seq(true, false); name <- names) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val s = run(name)
      val k = (name, aqe)
      if (!best.contains(k) || s < best(k)) best(k) = s
    }
    println(f"[scratch] ${"query"}%-24s aqe=on   aqe=off")
    names.foreach { n =>
      println(f"[scratch] $n%-24s ${best((n, true))}%7.3f  ${best((n, false))}%7.3f")
    }
    val on = names.map(n => best((n, true))).sum
    val off = names.map(n => best((n, false))).sum
    println(f"[scratch] TOTAL on=$on%.3f off=$off%.3f")
    spark.stop()
  }
}
