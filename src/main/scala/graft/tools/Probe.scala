package graft.tools

import graft.Engine

/** Scratch expression-semantics probe (dev only, not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe", "2")
    val sqls = Seq(
      "SELECT arrays_zip(slice(split('a b c d', ' '), 1, 2), slice(split('a b c d', ' '), 2, 2))",
      "SELECT transform(arrays_zip(slice(split('a b c d', ' '), 1, 2), slice(split('a b c d', ' '), 2, 2)), z -> concat_ws(' ', z['0'], z['1']))",
      "SELECT transform(arrays_zip(slice(split('a b c d', ' '), 1, 2), slice(split('a b c d', ' '), 2, 2)), z -> concat_ws(' ', z.`0`, z.`1`))",
    )
    sqls.foreach { s =>
      try println(s + "  =>  " + spark.sql(s).collect().mkString(" | "))
      catch { case e: Throwable => println(s + "  =>  ERR " + e.getMessage.take(200)) }
    }
    spark.stop()
  }
}
