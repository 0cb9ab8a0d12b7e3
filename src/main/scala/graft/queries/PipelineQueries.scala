package graft.queries

/** Oracle-checked analogs of the reference's pipeline semantics (filled in below). */
object PipelineQueries {
  val qs: Seq[Q] = Seq()
}
