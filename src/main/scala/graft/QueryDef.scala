package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded engine capability.
  *
  * @param key    filesystem/JSON-safe name, the contract key in
  *               `SparkEntry.queries` (SURVEY.md §2 naming contract)
  * @param fn     the Spark-native implementation: builds a deterministic,
  *               fully-ordered DataFrame over the parquet tables in `sfDir`
  * @param oracle equivalent DuckDB 1.0.0 SQL over the same tables; None for
  *               bench-only operators whose semantics have no exact DuckDB
  *               twin (approximate sketches, MLlib LSH) — those get the
  *               driver's weaker rows-only check by design
  */
final case class QueryDef(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def graded(key: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(key, fn, Some(oracle))

  def benchOnly(key: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(key, fn, None)
}
