package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §7 (plan). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.VectorSearch.queries ++
      ops.Dedup.queries ++ ops.TextAnalysis.queries ++
      ops.Events.queries ++ ops.Multimodal.queries ++
      ops.Lake.queries ++ ops.Pipeline.queries ++ ops.Graph.queries ++
      streaming.Streaming.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.VectorSearch.oracles ++
      ops.Dedup.oracles ++ ops.TextAnalysis.oracles ++
      ops.Events.oracles ++ ops.Multimodal.oracles ++
      ops.Lake.oracles ++ ops.Pipeline.oracles ++ ops.Graph.oracles ++
      streaming.Streaming.oracles
}
