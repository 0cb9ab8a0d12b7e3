package graft.tools

import graft.queries.QueryCatalog
import java.nio.file.{Files, Paths}

/** Renders the query catalog to OPERATORS.md — the auto-generated
  * operator inventory (name, oracle status, doc) so the coverage list
  * in the repo can never drift from the code: re-run after adding a
  * query and commit the diff.
  */
object RenderCatalog {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("OPERATORS.md")
    val qs = QueryCatalog.all.sortBy { q =>
      val num = q.name.drop(1).takeWhile(_.isDigit)
      (if (num.isEmpty) Int.MaxValue else num.toInt, q.name)
    }
    val oracled = qs.count(_.oracle.isDefined)
    val sb = new StringBuilder
    sb ++= "# Operator catalog (auto-generated — `sbt \"runMain graft.tools.RenderCatalog\"`)\n\n"
    sb ++= s"${qs.size} queries; $oracled hash-checked against DuckDB"
    sb ++= (if (oracled == qs.size) " (every entry,\nincluding the sketch queries via in-output error gates).\n"
    else " (the rest are\nspec-bounded sketches with no cross-engine oracle, by declared policy).\n")
    sb ++= "Each entry is `SparkEntry.queries(name)(spark, sfDir)`; the check is\n"
    sb ++= "rows+schema+hash equality against the oracle SQL on the same parquet.\n\n"
    sb ++= "| query | oracle | what it does |\n|---|---|---|\n"
    qs.foreach { q =>
      val o = if (q.oracle.isDefined) "DuckDB" else "spec-only"
      val doc = q.doc.replace("|", "\\|").replace("\n", " ")
      sb ++= s"| `${q.name}` | $o | $doc |\n"
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[render-catalog] wrote ${qs.size} entries to $out")
  }
}
