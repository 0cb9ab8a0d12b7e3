package graft.queries

/** Embedding similarity-search operators (filled in below). */
object Similarity {
  val qs: Seq[Q] = Seq()
}
