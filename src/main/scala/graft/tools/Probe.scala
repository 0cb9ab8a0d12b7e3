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

    // warmup
    spark.range(100000L).selectExpr("sum(id)").collect()
    Tables(spark, dir).documents.limit(1).collect()

    def ex = Tables(spark, dir).documents
      .selectExpr("doc_id", s"${tokensSpark("text")} AS tok")
      .selectExpr("doc_id", s"${shinglesSpark("tok")} AS sh")
      .selectExpr("doc_id", "CAST(size(sh) AS BIGINT) AS nsh", "sh")
      .select(col("doc_id"), col("nsh"), explode(col("sh")).as("s"))

    timed("explode only")(ex.count())
    timed("explode only again")(ex.count())
    val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("na"), col("s"))
    val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("nb"), col("s"))
    timed("smj join+group") {
      a.join(b, "s").filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb").agg(count(lit(1))).count()
    }
    timed("shuffle_hash join+group") {
      a.join(b.hint("SHUFFLE_HASH"), "s").filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb").agg(count(lit(1))).count()
    }
    // hash the join key to a bigint first (cheaper shuffle + compare);
    // results identical because the pair-counting groups by doc ids only
    val ah = a.withColumn("s", expr("graft_poly_hash(s)"))
    val bh = b.withColumn("s", expr("graft_poly_hash(s)"))
    timed("bigint-key join+group") {
      ah.join(bh.hint("SHUFFLE_HASH"), "s").filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb").agg(count(lit(1))).count()
    }

    // small-query floor: q1-style agg run twice
    def q1 = Tables(spark, dir).lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)))
    timed("q1-style cold")(q1.count())
    timed("q1-style warm")(q1.count())
    spark.stop()
  }
}
