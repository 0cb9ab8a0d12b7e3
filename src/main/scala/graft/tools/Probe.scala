package graft.tools

import graft.{Engine, Tables}
import graft.operators.TextKit._
import org.apache.spark.sql.functions._

/** Scratch profiling probe (dev only, not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    val dir = "/root/testdata/sf0.1"

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val ex = Tables(spark, dir).documents
      .selectExpr("doc_id", s"${tokensSpark("text")} AS tok")
      .selectExpr("doc_id", s"${shinglesSpark("tok")} AS sh")
      .selectExpr("doc_id", "CAST(size(sh) AS BIGINT) AS nsh", "sh")
      .select(col("doc_id"), col("nsh"), explode(col("sh")).as("s"))

    timed("explode only")(ex.count())
    val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("na"), col("s"))
    val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("nb"), col("s"))
    val joined = a.join(b, "s").filter(col("doc_a") < col("doc_b"))
    timed("join")(joined.count())
    val grouped = joined.groupBy("doc_a", "doc_b", "na", "nb").agg(count(lit(1)).as("n_inter"))
    timed("join+group")(grouped.count())
    timed("join again")(joined.count())
    joined.explain("formatted")
    spark.stop()
  }
}
