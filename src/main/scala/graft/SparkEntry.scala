package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the engine's signature point-in-time join. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.pitJoinSingle(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ OnlineQueries.queries ++ PipelineQueries.queries ++
      StreamQueries.queries ++ VectorQueries.queries ++ CorpusQueries.queries ++
      HistoryQueries.queries ++ GraphQueries.queries ++ TabularQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ OnlineQueries.oracles ++ PipelineQueries.oracles ++
      StreamQueries.oracles ++ VectorQueries.oracles ++ CorpusQueries.oracles ++
      HistoryQueries.oracles ++ GraphQueries.oracles ++ TabularQueries.oracles
}
