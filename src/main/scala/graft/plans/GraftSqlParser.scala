package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.v2.V2CommandExec
import org.apache.spark.sql.types._

import graft.operators.Maintenance

/** SQL maintenance verbs for snapshot tables — the parser half of the
  * "users live in SQL" surface (every table format ships these):
  *
  * {{{
  *   VACUUM lake.t KEEP 3 VERSIONS
  *   OPTIMIZE lake.t [TARGET 134217728 BYTES]
  *   RESTORE [TABLE] lake.t [TO] VERSION AS OF 2
  *   DESCRIBE HISTORY lake.t
  * }}}
  *
  * Injected as a parser DELEGATE ([[GraftExtensions]]): the four verbs
  * are recognized by a tiny anchored grammar here; every other
  * statement — and every other [[ParserInterface]] entry point —
  * passes through to Spark's own parser untouched, the standard
  * extension-parser shape. Table references resolve through the same
  * `spark.sql.catalog.<name>.root` convention as
  * [[graft.sources.SnapshotCatalog]], so the verbs address exactly
  * the tables the rest of the SQL surface reads and writes. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText)
      // claim the statement ONLY when it resolves to a REGISTERED
      // snapshot catalog — qualified (`lake.t`) or bare under
      // `USE lake`; another extension's identical verbs (Delta et
      // al.), a typo'd catalog, or a bare name outside a snapshot
      // catalog all fall through to the delegate instead of dying here.
      // Clause-level validation is deferred to AFTER the ownership
      // check: a malformed clause on someone else's table (Delta's
      // `OPTIMIZE t WHERE …`) must delegate, not die in this parser.
      .flatMap(m => GraftSqlParser.qualify(m))
      .map { m =>
        m.parseError.foreach(msg => throw new IllegalArgumentException(msg))
        m
      }
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // `a.b.c` or `` `a`.`b-x`.`c` `` — enough for catalog.ns….table
  private val Ident = """((?:`[^`]+`|[\w]+)(?:\.(?:`[^`]+`|[\w]+))*)"""
  private val Vacuum =
    s"""(?is)\\s*VACUUM\\s+$Ident\\s+KEEP\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*""".r
  private val VacuumRetain =
    s"""(?is)\\s*VACUUM\\s+$Ident\\s+RETAIN\\s+(\\d+)\\s+HOURS\\s*;?\\s*""".r
  // clauses parsed from the free tail so TARGET and ZORDER compose in
  // either order; leftover text is a graft-side error, not a silent
  // fall-through to an opaque delegate parse error
  private val Optimize = s"""(?is)\\s*OPTIMIZE\\s+$Ident((?:\\s+\\S.*?)??)\\s*;?\\s*""".r
  private val TargetClause = """(?is)\s*TARGET\s+(\d+)\s+BYTES""".r
  private val ZorderClause = """(?is)\s*ZORDER\s+BY\s*\(([^)]*)\)""".r
  private val Restore =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Ident\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val History =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$Ident\\s*;?\\s*""".r

  private val Segment = "`[^`]+`|[\\w]+".r
  private def parts(ident: String): Seq[String] =
    // segment-wise, NOT split('.'): a backquoted part may contain dots
    Segment.findAllIn(ident).toIndexedSeq.map(p =>
      if (p.startsWith("`") && p.endsWith("`")) p.drop(1).dropRight(1) else p)

  private[graft] def maintenancePlan(sql: String): Option[SnapshotMaintenance] =
    sql match {
      case Vacuum(id, keep) =>
        Some(SnapshotMaintenance("VACUUM", parts(id), Some(keep.toLong),
          Seq(attr("expired_versions", LongType), attr("deleted_files", LongType))))
      case VacuumRetain(id, hours) =>
        Some(SnapshotMaintenance("VACUUM RETAIN", parts(id), Some(hours.toLong),
          Seq(attr("expired_versions", LongType), attr("deleted_files", LongType))))
      case Optimize(id, tail0) =>
        var tail = Option(tail0).getOrElse("")
        var target: Option[Long] = None
        var cols: Seq[String] = Nil
        var err: Option[String] = None
        var progress = true
        def fail(msg: String): Unit = if (err.isEmpty) err = Some(msg)
        while (progress && tail.trim.nonEmpty) {
          progress = false
          TargetClause.findPrefixMatchOf(tail).foreach { mt =>
            if (target.nonEmpty) fail("duplicate TARGET clause in OPTIMIZE")
            target = Some(mt.group(1).toLong)
            tail = tail.substring(mt.end); progress = true
          }
          ZorderClause.findPrefixMatchOf(tail).foreach { mz =>
            if (cols.nonEmpty) fail("duplicate ZORDER BY clause in OPTIMIZE")
            cols = mz.group(1).split(',').toIndexedSeq.map(_.trim)
              .filter(_.nonEmpty)
              .map(c => if (c.startsWith("`") && c.endsWith("`"))
                c.drop(1).dropRight(1) else c)
            if (cols.isEmpty) fail("empty ZORDER BY column list")
            tail = tail.substring(mz.end); progress = true
          }
        }
        if (tail.trim.nonEmpty)
          fail(s"unrecognized OPTIMIZE clause: '${tail.trim}' — supported: " +
            "TARGET <n> BYTES, ZORDER BY (c1[, c2, c3, c4])")
        if (cols.size > 4)
          fail(s"ZORDER BY supports one column (range clustering) or 2-4 " +
            s"(Morton interleave), got ${cols.size}: ${cols.mkString(", ")}")
        Some(SnapshotMaintenance("OPTIMIZE", parts(id), target,
          Seq(attr("version", LongType)), cols, parseError = err))
      case Restore(id, v) =>
        Some(SnapshotMaintenance("RESTORE", parts(id), Some(v.toLong),
          Seq(attr("version", LongType))))
      case History(id) =>
        Some(SnapshotMaintenance("DESCRIBE HISTORY", parts(id), None, Seq(
          attr("version", LongType), attr("committed_at", TimestampType),
          attr("n_files", LongType), attr("n_rows", LongType),
          attr("n_added_files", LongType),
          attr("max_batch_id", LongType, nullable = true))))
      case _ => None
    }

  private def attr(name: String, dt: DataType, nullable: Boolean = false) =
    AttributeReference(name, dt, nullable)()

  private def isSnapshotCatalog(spark: SparkSession, name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name.root").isDefined

  /** Qualify a parsed maintenance statement against the session:
    * idents whose head names a registered snapshot catalog claim as
    * written; anything else — a bare table name or an
    * (namespace…,table) path — claims only when the session's CURRENT
    * catalog (`USE lake` / `USE lake.ns`) is a snapshot catalog, and
    * is rewritten to the fully-qualified form WITH the current
    * namespace preserved, so the verb maintains exactly the table a
    * SELECT of the same name reads. None = not ours: other
    * extensions' identical verbs delegate untouched. */
  private[plans] def qualify(m: SnapshotMaintenance): Option[SnapshotMaintenance] =
    SparkSession.getActiveSession.flatMap { spark =>
      m.ident match {
        case head +: _ +: _ if isSnapshotCatalog(spark, head) => Some(m)
        // an EXPLICITLY other-catalog-qualified statement is never
        // ours, whatever the current catalog: `USE lake; DESCRIBE
        // HISTORY spark_catalog.db.t` (or delta_cat.t) must delegate
        // to the owning extension, not be rewritten to lake.….t
        case head +: _ +: _ if head.equalsIgnoreCase("spark_catalog") ||
            spark.conf.getOption(s"spark.sql.catalog.$head").isDefined => None
        case rel =>
          val cur = spark.catalog.currentCatalog()
          if (!isSnapshotCatalog(spark, cur)) None
          else {
            // current namespace via the public-API-adjacent manager;
            // a non-classic session (no manager) keeps the bare path
            val ns = scala.util.Try(
              spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
                .sessionState.catalogManager.currentNamespace.toIndexedSeq)
              .getOrElse(Seq.empty[String])
            // a multi-part relation already names its namespace path
            val prefix = if (rel.size > 1) Seq(cur) else cur +: ns
            Some(m.copy(ident = prefix ++ rel))
          }
      }
    }

  /** Resolve `<catalog>.<ns…>.<name>` through the registered
    * SnapshotCatalog confs to the table path. */
  private[plans] def resolvePath(spark: SparkSession, ident: Seq[String]): String = {
    require(ident.size >= 2,
      s"snapshot maintenance needs a catalog-qualified table, got " +
        s"'${ident.mkString(".")}' — register a catalog " +
        "(spark.sql.catalog.<name> = SnapshotCatalog, …<name>.root = <dir>) " +
        "and address the table as <name>.<table>")
    val cat = ident.head
    val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root").getOrElse(
      throw new IllegalArgumentException(
        s"'$cat' is not a registered snapshot catalog — " +
          s"set spark.sql.catalog.$cat and spark.sql.catalog.$cat.root"))
    (root +: ident.tail).mkString("/")
  }
}

/** One parsed maintenance statement; executed driver-side by
  * [[SnapshotDmlStrategy]] through the snapshot layer's own verbs, so
  * every guarantee (pinned commits, vacuum's referenced-set from kept
  * manifests, restore's metadata-only publish) holds verbatim for SQL
  * users. */
case class SnapshotMaintenance(verb: String, ident: Seq[String],
    arg: Option[Long], override val output: Seq[Attribute],
    cols: Seq[String] = Nil, parseError: Option[String] = None)
    extends LeafNode with Command

case class SnapshotMaintenanceExec(cmd: SnapshotMaintenance)
    extends V2CommandExec with org.apache.spark.sql.execution.LeafExecNode {
  override def output: Seq[Attribute] = cmd.output

  override protected def run(): Seq[InternalRow] = {
    val spark = SparkSession.active
    val path = GraftSqlParser.resolvePath(spark, cmd.ident)
    val conv = CatalystTypeConverters.createToCatalystConverter(
      DataTypeUtilsShim.fromAttributes(cmd.output))
    def rows(rs: Seq[Seq[Any]]): Seq[InternalRow] =
      rs.map(r => conv(org.apache.spark.sql.Row.fromSeq(r))
        .asInstanceOf[InternalRow])
    cmd.verb match {
      case "VACUUM" =>
        val (expired, deleted) = Maintenance.vacuumSnapshots(spark, path,
          keep = cmd.arg.get.toInt)
        rows(Seq(Seq(expired, deleted)))
      case "VACUUM RETAIN" =>
        val (expired, deleted) = Maintenance.vacuumSnapshotsRetain(spark,
          path, retainMs = cmd.arg.get * 3600L * 1000L)
        rows(Seq(Seq(expired, deleted)))
      case "OPTIMIZE" =>
        // default target: 128 MiB — the usual parquet compaction size
        val target = cmd.arg.getOrElse(134217728L)
        val v = cmd.cols match {
          case Nil => Maintenance.compactSnapshot(spark, path, target)
          case Seq(c) => // one column: plain range clustering
            Maintenance.compactSnapshot(spark, path, target,
              clusterBy = Some(c))
          case cs => // 2-4 columns: deterministic Morton interleave
            Maintenance.compactSnapshotZorder(spark, path, cs, target, 8)
        }
        rows(Seq(Seq(v)))
      case "RESTORE" =>
        val v = Maintenance.snapshotRestore(spark, path, cmd.arg.get)
        rows(Seq(Seq(v)))
      case "DESCRIBE HISTORY" =>
        Maintenance.snapshotHistory(spark, path).collect()
          .toIndexedSeq.map(r => conv(r).asInstanceOf[InternalRow])
      case other => throw new IllegalStateException(s"unknown verb $other")
    }
  }

  override def simpleString(maxFields: Int): String =
    s"SnapshotMaintenanceExec ${cmd.verb} ${cmd.ident.mkString(".")}"
}

/** StructType from attributes (DataTypeUtils.fromAttributes is
  * private[sql]-adjacent across versions — build it directly). */
private object DataTypeUtilsShim {
  def fromAttributes(attrs: Seq[Attribute]): StructType =
    StructType(attrs.map(a => StructField(a.name, a.dataType, a.nullable)))
}
