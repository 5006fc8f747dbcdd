package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-module registries (graft.queries.*); each
  * carries its own DuckDB oracle where the operator is SQL-expressible.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    graft.queries.CoreQueries.defs ++ graft.queries.LlmQueries.defs ++
      graft.queries.RasterQueries.defs ++ graft.queries.PipelineQueries.defs ++
      graft.queries.SourceQueries.defs ++ graft.queries.CurationQueries.defs ++
      graft.queries.PqQueries.defs ++ graft.queries.LayoutQueries.defs ++
      graft.queries.TailQueries.defs ++ graft.queries.UnigramQueries.defs ++
      graft.queries.Sq8Queries.defs ++ graft.queries.PruningQueries.defs ++
      graft.queries.CleanseQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q20_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
