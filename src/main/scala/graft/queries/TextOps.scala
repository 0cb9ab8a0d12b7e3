package graft.queries

/** Text-analysis & dedup operators over the documents table (filled in below). */
object TextOps {
  val qs: Seq[Q] = Seq()
}
