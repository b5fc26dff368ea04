package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's operator inventory is assembled from per-category modules;
  * each [[QueryDef]] carries both the Spark-native implementation and (for
  * graded keys) its DuckDB oracle SQL. Keys are declared only after local
  * oracle parity at sf0.01 (SURVEY §2 coverage rule).
  */
object SparkEntry {
  val all: Seq[QueryDef] =
    operators.ScansFilters.defs ++
      operators.Joins.defs ++
      operators.Aggregates.defs ++
      operators.Windows.defs ++
      operators.SortSetScalar.defs ++
      operators.EventTime.defs ++
      operators.Reports.defs ++
      pipeline.Dedup.defs ++
      pipeline.Curation.defs ++
      pipeline.Similarity.defs ++
      pipeline.TextAnalysis.defs ++
      pipeline.Multimodal.defs ++
      functions.Udfs.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("d1_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.key -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.key -> _)).toMap
}
