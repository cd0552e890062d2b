package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.Maintenance

/** SQL-visible versioned snapshot tables — the DataSourceV2 face of
  * [[graft.operators.Maintenance]]'s snapshot layer, for users who live
  * in SQL (the reference's whole interface is SQL scripting: CREATE OR
  * REPLACE TABLE chains, data_extraction_queries_automated_script
  * .sql:7+). A table written by snapshotWrite/snapshotAppend/
  * snapshotOverwritePartition reads as:
  *
  * {{{
  *   spark.read.format("graft.sources.SnapshotSource")
  *     .option("asOf", 1)          // optional time travel
  *     .load(path)
  *     .createOrReplaceTempView("t")
  *   spark.sql("SELECT ... FROM t WHERE k BETWEEN 100 AND 199")
  * }}}
  *
  * with the snapshot layer's planning intact:
  *
  *  - the version's MANIFEST resolves the file list (crashed commits
  *    invisible, historic versions readable while they survive vacuum);
  *  - pushed filters prune at the FILE level against the manifest's
  *    min/max stats before any file is listed into the scan — the
  *    [[Maintenance.readSnapshotRange]] mechanic, generalized to
  *    whatever conjunction the SQL WHERE clause pushes;
  *  - the surviving files scan through Spark's own parquet batch
  *    reader ([[ParquetScanBuilder]] over the pruned file index), so
  *    column pruning, row-group skipping, and vectorization are exactly
  *    native-parquet — this source adds planning, never a row path.
  *
  * Every pushed filter is also returned as residual: manifest stats
  * over-approximate (a key in [min,max] need not exist), so Spark
  * re-applies the predicates and results are exact whatever the
  * layout — pruning is purely a cost lever, same contract as
  * readSnapshotRange.
  */
class SnapshotSource extends TableProvider {
  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "SnapshotSource needs a path: .load(<table path>)")
    p
  }

  private def asOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("asOf")).map(_.toLong)

  private def mergeSchema(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("mergeSchema", false)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotTable(path(options), asOf(options), mergeSchema(options)).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    SnapshotTable(path(opts), asOf(opts), mergeSchema(opts))
  }
}

/** One snapshot table pinned to one version (head when `asOf` empty —
  * resolved ONCE at table creation, so a concurrent commit mid-query
  * cannot shear the file list). `mergeSchema = true` enables the
  * schema-evolution read ([[Maintenance.readSnapshot]]'s contract):
  * the table schema is the union of every batch's footer schema, and
  * files missing an added column surface NULL for it. */
case class SnapshotTable(path: String, asOf: Option[Long],
    mergeSchema: Boolean = false) extends Table
    with SupportsRead {
  private def spark = SparkSession.active

  /** The pinned snapshot version id. */
  val pinnedVersion: Long = {
    val vs = Maintenance.snapshotVersions(spark, path)
    require(vs.nonEmpty, s"$path has no committed versions")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs (expired or never committed)")
    v
  }

  private lazy val dataSchema: StructType =
    Maintenance.readSnapshot(spark, path, Some(pinnedVersion), mergeSchema).schema

  override def name(): String = s"graft_snapshot($path@v$pinnedVersion)"
  override def schema(): StructType = dataSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(spark, path, pinnedVersion, dataSchema, options)
}

/** Scan builder: collects the pushed catalyst filters and required
  * columns, prunes the version's file list against the manifest stats,
  * then builds Spark's own ParquetScanBuilder over the pruned file
  * index and re-pushes the same filters into it (row-group skipping). */
class SnapshotScanBuilder(spark: SparkSession, path: String, version: Long,
    dataSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns {

  private var pushedExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil
  private var required: StructType = dataSchema

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    pushedExprs = filters
    // everything is residual: manifest pruning over-approximates and
    // the parquet reader's row-group skip is best-effort, so Spark
    // must re-apply every predicate (exactness contract)
    filters
  }

  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty // advertise nothing as handled; all predicates re-apply

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** The v1-Filter rendering of the pushed predicates — the shape the
    * manifest pruner pattern-matches on. Untranslatable expressions
    * drop out (they just don't prune). */
  private def pushedV1: Array[Filter] =
    pushedExprs.flatMap(org.apache.spark.sql.graft.Bridge.translateFilter).toArray

  /** Manifest survival predicate for one pushed filter: None when the
    * filter can't exclude files (unknown shape, or no stats on its
    * column). Conjunctions narrow; everything else is conservative. */
  private def filePredicate(mfCols: Set[String], f: Filter)
      : Option[org.apache.spark.sql.Column] = {
    def stats(c: String): Boolean =
      mfCols.contains(s"min_$c") && mfCols.contains(s"max_$c")
    f match {
      case EqualTo(c, v) if stats(c) =>
        Some(col(s"min_$c") <= lit(v) && col(s"max_$c") >= lit(v))
      case GreaterThan(c, v) if stats(c) => Some(col(s"max_$c") > lit(v))
      case GreaterThanOrEqual(c, v) if stats(c) => Some(col(s"max_$c") >= lit(v))
      case LessThan(c, v) if stats(c) => Some(col(s"min_$c") < lit(v))
      case LessThanOrEqual(c, v) if stats(c) => Some(col(s"min_$c") <= lit(v))
      case In(c, vs) if stats(c) && vs.nonEmpty =>
        Some(vs.map(v => col(s"min_$c") <= lit(v) && col(s"max_$c") >= lit(v))
          .reduce(_ || _))
      case And(l, r) =>
        (filePredicate(mfCols, l), filePredicate(mfCols, r)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        // an OR excludes a file only when BOTH branches do
        for (a <- filePredicate(mfCols, l); b <- filePredicate(mfCols, r))
          yield a || b
      case _ => None // IsNull, Not, string matchers, …: never exclude
    }
  }

  override def build(): Scan = {
    val mf = Maintenance.snapshotManifest(spark, path, Some(version))
    val mfCols = mf.columns.toSet
    val pruned = pushedV1.flatMap(filePredicate(mfCols, _))
      .foldLeft(mf)((m, p) => m.filter(p))
    val files = pruned.select("file").collect()
      .map(r => new HPath(s"$path/data/${r.getString(0)}"))
    val index = new InMemoryFileIndex(spark, files.toIndexedSeq,
      Map.empty[String, String], Some(dataSchema))
    val psb = ParquetScanBuilder(spark, index, dataSchema, dataSchema, options)
    psb.pruneColumns(required)
    // re-push the same catalyst predicates for parquet row-group
    // skipping; the builder keeps only the shapes the reader converts
    // (unsupported ones are simply not row-group-filtered — the
    // residual re-apply already guarantees exactness)
    psb.pushFilters(pushedExprs): Unit
    psb.build()
  }
}
