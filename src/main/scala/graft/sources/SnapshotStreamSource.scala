package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.operators.Maintenance

/** Versioned snapshot tables as a STREAMING source — `spark.readStream
  * .format("graft.sources.SnapshotSource").load(path)` tails the
  * table's commit log, the capability that turns the lakehouse layer
  * into a pipeline backbone (Delta's own streaming-source shape): an
  * upstream job lands versions (appends, partition-overwrites of new
  * partitions, sink batches), and every downstream consumer reads each
  * committed version exactly once, driving its own incremental logic
  * without polling directories or re-scanning the table.
  *
  * Offsets ARE version ids. A micro-batch (fromV, toV] reads exactly
  * the files `toV`'s manifest lists that `fromV`'s does not — the
  * [[Maintenance.snapshotChanges]] planning rule, so the scan is
  * O(delta) at any table size, the file list is manifest-resolved
  * (crashed commits invisible), and the checkpointed offset makes the
  * replay exactly-once across restarts: version commits are atomic
  * renames, versions are immutable, so (fromV, toV] is the same file
  * set — and therefore the same rows — no matter when or where it is
  * replanned.
  *
  * Contract (same as Delta's source): the tailed table must advance by
  * APPEND-shaped commits. A commit that REMOVED files from the head
  * (compaction, merge, restore, a re-landed partition) makes the
  * stream fail with an explicit error rather than silently
  * double-reading rewritten rows; `ignoreChanges = true` opts into
  * streaming just the added files of such commits (rewritten rows may
  * re-deliver — the consumer dedups, exactly Delta's semantics).
  *
  * Options: `fromVersion` (default 0 — the whole history; set to skip
  * the backfill), `maxVersionsPerTrigger` (pace the tail),
  * `ignoreChanges`.
  */
class SnapshotStreamSource(spark: SparkSession, path: String,
    metadataPath: String, override val schema: StructType, fromVersion: Long,
    maxVersionsPerTrigger: Option[Long], ignoreChanges: Boolean)
    extends Source {

  /** Highest version already handed to the engine (planned or
    * committed) — the base the per-trigger pacing cap counts from.
    *
    * Seeded from the ENGINE's own offset log, not a parallel state
    * file: a V1 getOffset never sees the start offset, so an unseeded
    * cap after a restart could return an offset BELOW the committed
    * one, and the engine plans any available != committed pair — a
    * backwards batch that would re-deliver every version above the
    * cap. The checkpoint's offsets/ dir is the durable record of the
    * highest PLANNED version (metadataPath is
    * `<checkpoint>/sources/<idx>` by the stream-execution contract),
    * so recovering the floor from it is exact; a genuinely fresh
    * stream has no entries and starts at `fromVersion`. */
  private var floor: Option[Long] = {
    val mp = new org.apache.hadoop.fs.Path(metadataPath)
    val idx = mp.getName.toInt
    val log = new org.apache.spark.sql.execution.streaming.checkpointing
      .OffsetSeqLog(spark, new org.apache.hadoop.fs.Path(
        mp.getParent.getParent, "offsets").toString)
    log.getLatest().flatMap { case (_, seq) => seq.offsets.lift(idx).flatten }
      .map(_.json().trim.toLong)
  }

  private def ver(o: OffsetV1): Long = o.json.trim.toLong

  override def getOffset: Option[OffsetV1] = {
    val vs = Maintenance.snapshotVersions(spark, path)
    vs.lastOption.map { head =>
      val capped = maxVersionsPerTrigger match {
        case Some(m) =>
          // clamp the pacing base to just below the EARLIEST surviving
          // version: after a vacuum, versions below vs.head no longer
          // exist, and an unclamped fresh start (base = fromVersion =
          // 0) would plan offset 0+m into the expired range and crash
          // the stream forever; from vs.head-1 the first batch reads
          // the earliest surviving manifest, which lists every visible
          // file — the backfill, just paced
          val base = math.max(floor.getOrElse(fromVersion), vs.head - 1)
          math.min(head, base + m)
        case None => head
      }
      LongOffset(capped)
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromV = start.map(ver).getOrElse(fromVersion)
    val toV = ver(end)
    // fail-stop, never silently absorb: a backwards range means the
    // pacing floor and the checkpoint disagree (should be impossible
    // with the offset-log seeding) — committing an empty batch for it
    // would regress the offset log and re-deliver versions
    require(fromV <= toV,
      s"backwards micro-batch ($fromV, $toV] planned for $path — " +
        "checkpoint and pacing state disagree")
    floor = Some(math.max(toV, floor.getOrElse(toV)))
    if (fromV == toV) return org.apache.spark.sql.graft.Bridge.emptyStreamingBatch(spark, schema)
    val vs = Maintenance.snapshotVersions(spark, path).toSet
    require(fromV == 0 || vs.contains(fromV),
      s"stream offset version $fromV of $path has been vacuumed — the " +
        "consumer fell behind the table's retention window " +
        "(vacuumSnapshots keep); re-seed it with a fresh fromVersion")
    require(vs.contains(toV),
      s"planned version $toV not committed at $path")
    val before = Maintenance.manifestFiles(spark, path, fromV)
    val after = Maintenance.manifestFiles(spark, path, toV)
    val removed = before -- after
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"versions ($fromV, $toV] of $path include a non-append commit " +
          s"(${removed.size} file(s) rewritten/removed — compaction, merge, " +
          "delete, or restore). Streaming them would re-deliver rewritten " +
          "rows; pass ignoreChanges=true to accept that (consumer dedups), " +
          "or point the stream at an append-only table")
    val added = (after -- before).toIndexedSeq.sorted.map(f => s"$path/data/$f")
    if (added.isEmpty) org.apache.spark.sql.graft.Bridge.emptyStreamingBatch(spark, schema)
    else org.apache.spark.sql.graft.Bridge.streamingFileBatch(spark, added, schema)
  }

  override def commit(end: OffsetV1): Unit =
    floor = Some(math.max(ver(end), floor.getOrElse(Long.MinValue)))

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource($path)"
}
