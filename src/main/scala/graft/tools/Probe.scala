package graft.tools

import graft.{Engine, Tables}
import graft.sources.ExtJson
import graft.sources.ExtJson._
import org.apache.spark.sql.functions._

/** Scratch profiling probe (dev only, not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    val dir = "/root/testdata/sf0.1"

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.range(100000L).selectExpr("sum(id)").collect()

    val fields: Seq[(String, Kind)] =
      Seq("_id" -> Oid, "created" -> Date, "amount" -> Dec, "priority" -> Plain)
    def encoded = Tables(spark, dir).orders.select(
      col("o_orderkey"),
      ExtJson.encode(Seq(
        ("_id", lpad(lower(hex(col("o_orderkey"))), 24, "0"), Oid),
        ("created", col("o_orderdate"), Date),
        ("amount", concat(col("o_custkey").cast("string"), lit(".25")), Dec),
        ("priority", col("o_orderpriority"), Plain),
      )).as("js"))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timed("encode only")(noop(encoded))
    timed("current (4x normalize)")(noop(
      encoded.select(col("o_orderkey") +: ExtJson.normalize(col("js"), fields): _*)))
    timed("two-step struct")(noop {
      encoded
        .select(col("o_orderkey"), from_json(col("js"), ExtJson.schema(fields)).as("p"))
        .select(col("o_orderkey"),
          lower(col("p._id.`$oid`")).as("_id"),
          timestamp_millis(col("p.created.`$date`")).as("created"),
          col("p.amount.`$numberDecimal`").cast("double").as("amount"),
          col("p.priority").as("priority"))
    })
    timed("current again")(noop(
      encoded.select(col("o_orderkey") +: ExtJson.normalize(col("js"), fields): _*)))
    spark.stop()
  }
}
