package graft.tools

import graft.Engine

/** Scratch expression-semantics probe (dev only, not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe", "2")
    val sqls = Seq(
      "SELECT split('abc', '')",
      "SELECT size(split('a b c', ' '))",
      "SELECT regexp_extract_all('ab 12 !', '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)",
      "SELECT aggregate(split('abc', ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % 2147483647)",
      "SELECT element_at(split('a b c', ' '), 1)",
      "SELECT array_distinct(transform(sequence(1, 2), i -> concat_ws(' ', element_at(split('a b c d', ' '), i), element_at(split('a b c d', ' '), i+1))))",
      "SELECT CAST(5 AS BIGINT) ^ CAST(3 AS BIGINT), bit_count(CAST(7 AS BIGINT)), shiftright(CAST(12 AS BIGINT), 2) & 3",
      "SELECT md5('abc')",
      "SELECT array_min(transform(array('a','bb'), s -> length(s)))",
      "SELECT size(filter(split('the a x', ' '), t -> t = 'the' OR t = 'a'))",
    )
    sqls.foreach { s =>
      try println(s + "  =>  " + spark.sql(s).collect().mkString(" | "))
      catch { case e: Throwable => println(s + "  =>  ERR " + e.getMessage.take(150)) }
    }
    spark.stop()
  }
}
