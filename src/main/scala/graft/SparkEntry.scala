package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All real logic lives in graft.operators.* ; this object only adapts
  * the [[Registry]] to the driver's expected shape.
  */
object SparkEntry {
  /** Flagship: the reference's full switchback DAG end-to-end
    * (extraction → cleaning → KPIs → Mann-Whitney p-values) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.SwitchbackPipeline.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.ops.map(o => o.name -> o.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.ops.flatMap(o => o.oracle.map(o.name -> _)).toMap
}
