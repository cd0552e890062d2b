package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, StagingTableCatalog, Table, TableCapability, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.Maintenance

/** Versioned snapshot tables as a NAMED SQL CATALOG — the last step of
  * the "users live in SQL" migration surface: where
  * [[SnapshotSource]] needs a `.load(path)` per table,
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.lake", classOf[SnapshotCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.lake.root", "/warehouse")
  *   spark.sql("SELECT * FROM lake.events VERSION AS OF 1")
  *   spark.sql("SELECT * FROM lake.events TIMESTAMP AS OF '2026-08-16 00:00:00'")
  *   spark.sql("INSERT INTO lake.events SELECT ...")
  * }}}
  *
  * resolves `lake.<ns...>.<name>` to the snapshot table at
  * `root/<ns...>/<name>` — Spark's own `VERSION AS OF` / `TIMESTAMP AS
  * OF` syntax lands on the pinned-version reader (manifest pruning
  * intact), and INSERT INTO / INSERT OVERWRITE land on the commit path
  * with the table's OWN stats contract inherited (an append that would
  * break the manifest schema is not constructible through SQL).
  *
  * Timestamp resolution follows the commit points themselves: version
  * v is chosen as the last one whose manifest rename (dir mtime)
  * precedes the asked instant — the same definition every table
  * format's timestamp travel uses. DDL: CREATE TABLE (with or without
  * data — an empty create commits an empty-manifest v1 with the
  * declared schema, so BigQuery-style CREATE-then-INSERT scripts run
  * unmodified), DROP deletes the table directory, RENAME is a
  * filesystem move (manifests hold relative paths, so tables
  * relocate); ALTER is refused — schema evolution is an append-time
  * property ([[Maintenance.readSnapshot]]'s mergeSchema), not a
  * metadata edit. */
class SnapshotCatalog extends TableCatalog with StagingTableCatalog {
  private var catalogName: String = _
  private var root: String = _

  private def spark = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null,
      s"catalog $name needs a root: set spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  private def pathFor(ident: Identifier): String =
    (root +: (ident.namespace().toIndexedSeq :+ ident.name())).mkString("/")

  private def exists(ident: Identifier): Boolean =
    Maintenance.snapshotVersions(spark, pathFor(ident)).nonEmpty

  override def tableExists(ident: Identifier): Boolean = exists(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dir = new org.apache.hadoop.fs.Path(
      (root +: namespace.toIndexedSeq).mkString("/"))
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/$n/versions")))
      .map(Identifier.of(namespace, _))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    SnapshotTable(pathFor(ident), asOf = None)
  }

  /** VERSION AS OF — the SQL face of readSnapshot(asOf). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    SnapshotTable(pathFor(ident), asOf = Some(version.toLong))
  }

  /** TIMESTAMP AS OF (micros since epoch): the last version committed
    * at or before the instant — commit time IS the manifest rename,
    * read off the version dir. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val p = pathFor(ident)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val at = Maintenance.snapshotVersions(spark, p).reverse.find { v =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f"$p/versions/v$v%05d"))
        .getModificationTime * 1000L <= timestampMicros
    }.getOrElse(throw new IllegalArgumentException(
      s"$p has no version committed at or before timestamp " +
        s"$timestampMicros — the asked instant precedes the table"))
    SnapshotTable(p, asOf = Some(at))
  }

  /** CREATE TABLE without data — the reference's users write
    * BigQuery-idiomatic `CREATE TABLE …; INSERT INTO …` chains
    * (data_extraction_queries_automated_script.sql), so the catalog
    * accepts an empty create: version 1 is an empty manifest plus the
    * declared schema as the commit sidecar
    * ([[Maintenance.snapshotCreateEmpty]]). The `statsCols` table
    * property declares the stats contract up front; every insert —
    * including the first — inherits it from the head manifest. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (exists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      s"snapshot tables don't take a PARTITIONED BY clause — land " +
        "partitions through snapshotOverwritePartition (or day-keyed " +
        "appends); file-level stats pruning comes from the statsCols " +
        "table property")
    val statsCols = Option(properties.get("statsCols")).toSeq
      .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    Maintenance.snapshotCreateEmpty(spark, pathFor(ident), schema, statsCols)
    SnapshotTable(pathFor(ident), asOf = None)
  }

  // ───── CTAS / CREATE OR REPLACE … AS SELECT (StagingTableCatalog) ───
  //
  // The reference DAG's whole write discipline is CREATE-OR-REPLACE
  // chains (data_extraction_queries_automated_script.sql:7+). Staged
  // creation maps them onto snapshot commits with HISTORY KEPT: the
  // replace lands as a new version ([[Maintenance.snapshotReplace]] —
  // WRITE_TRUNCATE as a version), so yesterday's table stays one
  // `VERSION AS OF` away until vacuum. The non-staging fallback
  // (drop + recreate) would delete the table directory and its
  // history — exactly what this catalog refuses to do silently.
  //
  // Protocol note: the staged write commits through the snapshot
  // layer's own atomic marker-verified rename inside the V1 insert;
  // commitStagedChanges is then a no-op and abortStagedChanges has
  // nothing to clean (an aborted write leaves only self-cleaning
  // staging dirs, never a published version).

  private def staged(ident: Identifier, info: TableInfo,
      replace: Boolean): StagedTable = {
    require(info.partitions().isEmpty,
      s"snapshot tables don't take a CTAS PARTITIONED BY clause — land " +
        "partitions through snapshotOverwritePartition (or day-keyed " +
        "appends); file-level stats pruning comes from the statsCols " +
        "table property")
    val props = info.properties().asScala
    StagedSnapshotTable(pathFor(ident), replace, info.schema(),
      nFiles = props.get("nFiles").map(_.toInt).getOrElse(4),
      statsCols = props.get("statsCols").toSeq
        .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)),
      clusterBy = props.get("clusterBy").map(_.trim).filter(_.nonEmpty))
  }

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable = {
    if (exists(ident)) throw new TableAlreadyExistsException(ident)
    staged(ident, info, replace = false)
  }

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    staged(ident, info, replace = true)
  }

  override def stageCreateOrReplace(ident: Identifier,
      info: TableInfo): StagedTable =
    staged(ident, info, replace = exists(ident))

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "snapshot tables evolve by appending (mergeSchema reads), not ALTER")

  override def dropTable(ident: Identifier): Boolean = {
    val existed = exists(ident)
    if (existed) {
      val p = new org.apache.hadoop.fs.Path(pathFor(ident))
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true): Unit
    }
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!exists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (exists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // manifests hold paths relative to <table>/data, so a table is
    // relocatable as one directory move
    require(fs.rename(new org.apache.hadoop.fs.Path(pathFor(oldIdent)),
      new org.apache.hadoop.fs.Path(pathFor(newIdent))),
      s"rename ${oldIdent} -> ${newIdent} failed")
  }
}

/** One staged CTAS/RTAS target: the query's rows arrive through the
  * V1 insert and commit as snapshot version N+1 (`replace` = the
  * CREATE-OR-REPLACE-over-existing case) or version 1 (fresh create)
  * — atomic either way via the snapshot layer's marker-verified
  * rename, so commitStagedChanges has nothing left to publish. Table
  * properties `nFiles` / `statsCols` / `clusterBy` carry the layout
  * contract into the committed manifest exactly as the
  * DataFrameWriter options do. */
case class StagedSnapshotTable(path: String, replace: Boolean,
    declared: StructType, nFiles: Int, statsCols: Seq[String],
    clusterBy: Option[String]) extends StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft_snapshot_staged($path)"
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder =
        this // the staged create IS the truncation decision
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                if (replace)
                  Maintenance.snapshotReplace(data, path, nFiles, statsCols,
                    clusterBy): Unit
                else
                  Maintenance.snapshotWrite(data, path, nFiles, statsCols,
                    clusterBy): Unit
              }
            }
        }
    }

  override def commitStagedChanges(): Unit = ()
  override def abortStagedChanges(): Unit = ()
}
