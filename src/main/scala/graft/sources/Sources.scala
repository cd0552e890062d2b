package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink layer. The reference's IO is BigQuery tables on both
  * ends (run_sql_queries.py CREATE OR REPLACE TABLE …;
  * …analysis_script.py load_table_from_dataframe with
  * WRITE_TRUNCATE); the Spark-native analog is parquet/csv/json
  * datasets with explicit layout control.
  *
  * Scale notes baked in:
  *  - [[writePartitioned]] — hive-style partition dirs so date/key
  *    predicates prune whole directories at 100 TB.
  *  - [[writeBucketed]] — pre-shuffled bucket layout: two tables
  *    bucketed the same way join with NO shuffle (the reference's
  *    repeated entity_id/test_id joins would use this).
  *  - CSV/JSON readers take explicit schemas — schema inference reads
  *    the data twice and guesses; at scale both are unacceptable.
  */
object Sources {

  /** Recursive local-filesystem delete for staging/artifact temp dirs
    * (the operators' deferred-cleanup hook). Local only — cluster
    * deployments stage artifacts on the shared store and clean up with
    * its own lifecycle tooling. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, ddl: String, header: Boolean = true): DataFrame =
    spark.read.schema(ddl).option("header", header.toString).csv(path)

  def readJsonl(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)

  /** ORC with explicit schema — the columnar alternative where the
    * surrounding stack (Hive-era warehouses) is ORC-native; same
    * pushdown/pruning properties as parquet in Spark. */
  def readOrc(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** WRITE_TRUNCATE-style overwrite (the analysis script's upload). */
  def writeTruncate(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Partition-pruned layout: one directory per partition-column value. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed + sorted layout for shuffle-free equi-joins; bucketed
    * tables must go through the catalog (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, n: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(n, bucketCol).sortBy(bucketCol)
      .option("path", s"file:///tmp/graft_warehouse/$table")
      .saveAsTable(table)
}
