package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance mechanics a long-running ingest needs at 100 TB —
  * the OPTIMIZE half of the daily loop. Streaming sinks and daily
  * appends ([[graft.streaming.EventStream.exactlyOnceParquetSink]],
  * [[DailyPipeline]], [[Dedup.appendToMinhashIndex]]) necessarily land
  * many small files (one directory per batch/day); scan throughput and
  * listing cost then degrade until a compaction pass bin-packs them
  * back to target-sized files. The reference's BigQuery backend does
  * this invisibly (storage optimizer); a file-based lakehouse must do
  * it explicitly.
  */
object Maintenance {

  /** Compact a parquet directory into ~`targetBytes`-sized files at
    * `outPath`. With `clusterBy` set, rows are range-partitioned and
    * sorted on that key, so each output file covers a disjoint key
    * range — parquet min/max footers then prune whole files for key
    * predicates (the OPTIMIZE ... ZORDER-lite single-key shape).
    * Without it, a plain round-robin repartition only bin-packs.
    *
    * Sizing uses the INPUT byte sum as the estimate — compaction of
    * same-codec parquet is roughly size-preserving, and an estimate is
    * all the file-count decision needs. The sum is read off the file
    * index the `spark.read` itself builds (relation sizeInBytes), so a
    * 100k-fragment object-store directory — the state this operator
    * exists to fix — is listed exactly once, not once per concern. One
    * shuffle of the data being compacted; at scale runs table-section
    * by table-section (e.g. per day partition), never whole-table.
    * Returns the output file count. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, clusterBy: Option[String] = None): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val df = spark.read.parquet(inPath)
    val totalBytes: BigInt = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.sizeInBytes
    }.sum
    require(totalBytes > 0,
      s"compactParquet: could not size $inPath from its file index")
    // validate in BigInt BEFORE narrowing — the litInt lesson: a silent
    // wrap would either crash opaquely (negative partition count) or
    // quietly write far-oversized files
    val nOutB = ((totalBytes + targetBytes - 1) / targetBytes).max(1)
    require(nOutB <= Int.MaxValue,
      s"compactParquet: $totalBytes bytes / $targetBytes-byte target = " +
        s"$nOutB output files — beyond Int range; compact in sections")
    val nOut = nOutB.toInt
    val shaped = clusterBy match {
      case Some(k) => df.repartitionByRange(nOut, col(k)).sortWithinPartitions(k)
      case None => df.repartition(nOut)
    }
    shaped.write.mode("overwrite").parquet(outPath)
    val out = new org.apache.hadoop.fs.Path(outPath)
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(out).count(_.getPath.getName.endsWith(".parquet")).toLong
  }

  /** Driver-visible query: fragment the documents table into 64 tiny
    * files (the post-ingest worst case), compact them clustered on
    * doc_id, and return the compacted table — hash-checked against the
    * source table, so the pass is provably lossless (no dropped /
    * duplicated / mangled rows). The file-count collapse and the
    * disjoint-key-range clustering are pinned by Round8Spec, which
    * reads each output file individually. */
  def compactFiles(spark: SparkSession, dir: String): DataFrame = {
    val stage = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_compact_${java.util.UUID.randomUUID().toString.take(8)}")
    // register cleanup BEFORE any write: a mid-compaction throw (out of
    // disk is likeliest exactly here — the fragment stage just copied a
    // table) must not leak the staging dirs; deleting a missing or
    // partial dir is a no-op
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(stage))
    val frag = new java.io.File(stage, "fragmented").getAbsolutePath
    val packed = new java.io.File(stage, "compacted").getAbsolutePath
    Tables.documents(spark, dir).repartition(64)
      .write.mode("overwrite").parquet(frag)
    compactParquet(spark, frag, packed, targetBytes = 4L << 20,
      clusterBy = Some("doc_id"))
    // snapshot through a checkpoint (the DailyPipeline pattern): the
    // staging dirs are deleted at release, the result must outlive them
    val out = {
      import graft.CacheScope.CheckpointOps
      spark.read.parquet(packed)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
        .graftCheckpoint()
    }
    graft.CacheScope.defer(() => graft.CacheScope.freeCheckpoint(out))
    out
  }

  private val compactFilesOracle =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_compact_files", compactFiles, Some(compactFilesOracle)),
  )
}
