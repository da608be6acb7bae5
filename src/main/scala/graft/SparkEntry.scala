package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): full
    * orchestrated pipeline — day-partitioned external source, ranged-union
    * input with completion checks, SQL slot with {dim} parametrization,
    * managed write (_SUCCESS + _SCHEMA.spark.json), feed-back trigger of a
    * downstream Scala-slot node, and a read-back of its output. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Relational2.queries ++
      graft.queries.Framework.queries ++ graft.queries.PipelineOps.queries ++
      graft.queries.DiagnosticsQueries.queries ++
      graft.queries.TemporalQueries.queries ++
      graft.queries.DialectQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Relational2.oracles ++
      graft.queries.Framework.oracles ++ graft.queries.PipelineOps.oracles ++
      graft.queries.DiagnosticsQueries.oracles ++
      graft.queries.TemporalQueries.oracles ++
      graft.queries.DialectQueries.oracles
}
