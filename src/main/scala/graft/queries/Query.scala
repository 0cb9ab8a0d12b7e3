package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over a TESTDATA scale-factor
  * directory, optionally paired with the equivalent ANSI SQL that the
  * driver's DuckDB oracle runs on the same parquet tables.
  *
  * Contract (see the build brief): column names AND types of `fn`'s
  * result must match the oracle's exactly — the comparator sorts
  * columns by name and hashes values. Queries whose semantics are not
  * SQL-expressible (LSH candidates, approximate ops) leave `oracle`
  * empty and get a weaker rows-only check.
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame,
)

object QueryCatalog {
  /** Full registry, assembled per module. SparkEntry flattens this. */
  lazy val all: Seq[Q] =
    Analytics.qs ++ Relational2.qs ++ TextOps.qs ++ Similarity.qs ++ Curation.qs ++ PipelineQueries.qs ++ Advanced.qs ++ SqlTwins.qs ++ Storage.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
