package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * bridge lives in this package purely to reach the private[sql]
  * converter for graft's native Catalyst expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom logical plan (Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The materialized internal RDD behind a locally-checkpointed
    * Dataset (its analyzed plan is a LogicalRDD). Unpersisting THAT rdd
    * is the only way to free local-checkpoint blocks —
    * `Dataset.unpersist` consults the cache manager, which doesn't know
    * about them. */
  def materializedRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Free whatever a checkpointed Dataset generation holds: the
    * executor blocks of a localCheckpoint (unpersist on the
    * materialized RDD — the one release `Dataset.unpersist` cannot
    * reach), and, for a RELIABLE checkpoint, the generation's files in
    * the checkpoint directory (Spark never deletes these on its own
    * unless the reference-tracking cleaner is enabled — an iterative
    * operator that checkpoints every round would otherwise leak one
    * directory per round for the lifetime of the job). */
  def freeCheckpointed(df: org.apache.spark.sql.DataFrame): Unit =
    materializedRdd(df).foreach { rdd =>
      if (rdd.getCheckpointFile.isDefined)
        org.apache.spark.rdd.ReliableRDDCheckpointData.cleanCheckpoint(
          rdd.sparkContext, rdd.id)
      rdd.unpersist(blocking = false)
    }

  /** Catalyst predicate → v1 source Filter (DataSourceStrategy
    * .translateFilter is protected[sql]) — the shape the snapshot
    * source's manifest pruner pattern-matches on. */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** A STREAMING DataFrame over a fixed list of parquet files — the
    * micro-batch a V1 streaming Source's getBatch returns (the
    * FileStreamSource recipe: resolve a file-scoped relation, wrap it
    * in a LogicalRelation with isStreaming = true so the incremental
    * planner accepts it). The scan is Spark's own parquet batch reader;
    * this helper only exists because Dataset.ofRows and the
    * isStreaming flag are private[sql]. */
  def streamingFileBatch(spark: org.apache.spark.sql.SparkSession,
      files: Seq[String],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      spark,
      className = "parquet",
      paths = files,
      userSpecifiedSchema = Some(schema))
    ofRows(spark, org.apache.spark.sql.execution.datasources.LogicalRelation(
      ds.resolveRelation(checkFilesExist = false), isStreaming = true))
  }

  /** The zero-row streaming micro-batch (an offset range that added no
    * files): a streaming-flagged empty LocalRelation in the source's
    * schema. */
  def emptyStreamingBatch(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    ofRows(spark, org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
      Nil, isStreaming = true))

  /** Register a native function on a live session (the extensions path
    * only works at session build time). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
