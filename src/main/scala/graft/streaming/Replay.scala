package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Batch-replay harness: feeds the recorded `events` table through a
  * Structured Streaming transform in event-time order, chopped into
  * micro-batches, and returns the finalized output as an ordinary
  * DataFrame — making every streaming monitor visible to the driver's
  * batch correctness gate (the daily-monitoring loop the reference's
  * notebooks run by hand, replayed end-to-end).
  *
  * Mechanics: the recorded events are sorted by (ts, event_id) and fed
  * as `chunks` micro-batches, so the run is genuinely incremental —
  * watermarks advance between batches, window state merges partial
  * aggregates, and flatMapGroupsWithState monitors finalize days as the
  * watermark crosses each boundary, exactly as they would on a live
  * stream. A far-future sentinel row (event_id −1, its own never-
  * finalized window/group) then pushes the watermark past every real
  * window so the append-mode output is complete.
  *
  * MemoryStream is driver-fed BY DESIGN — this is the replay/test
  * adapter, not the production ingestion path (a deployment reads
  * `spark.readStream` from Kafka/files; every transform here takes the
  * stream as a parameter precisely so the source is swappable). The
  * replay data volume is one sf table, the same rows every batch
  * operator scans.
  */
object Replay {
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** File-source replay — the PRODUCTION-shaped twin of [[replay]]: the
    * recorded events are laid out as `chunks` ts-ordered parquet files
    * and streamed back through `spark.readStream` with
    * `maxFilesPerTrigger = 1`, so each micro-batch arrives through the
    * real FileStreamSource (listing, offset tracking, exactly-once file
    * accounting) rather than a driver-fed MemoryStream. The ts-ordered
    * layout means watermarks advance monotonically across batches just
    * as they do on a live tailing source; the far-future sentinel file
    * (sorted last by name, processed last) finalizes every real window.
    *
    * The chunk layout runs through the engine itself (one sort + write),
    * so nothing round-trips the driver at any size.
    *
    * @param dupFeed lay every chunk file down TWICE (a byte-identical
    *                copy stamped to arrive in the very next micro-batch)
    *                — the at-least-once re-delivery simulation of
    *                [[replay]]'s dupFeed, expressed as duplicate source
    *                files; FileStreamSource tracks seen files by PATH,
    *                so the copy genuinely re-delivers every row. */
  def replayViaFiles(spark: SparkSession, dir: String, chunks: Int = 10,
      dupFeed: Boolean = false)
      (xform: Dataset[Event] => DataFrame): DataFrame = {
    val (input, stage, name) = stageFeed(spark, dir, chunks, dupFeed)
    // cleanup registered BEFORE the query starts: a failed replay must
    // not leak the staged chunk files in tmp
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(stage))
    val q = xform(input).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(name)
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Stage `dir`'s events as the ts-ordered chunk-file feed and open
    * the real FileStreamSource over it — the layout/mtime/sentinel
    * mechanics of [[replayViaFiles]], factored out so callers can
    * attach a DIFFERENT terminal (e.g. the versioned snapshot sink)
    * to the same exactly-once file feed. Caller owns the returned
    * stage dir (delete after the run). */
  def stageFeed(spark: SparkSession, dir: String, chunks: Int = 10,
      dupFeed: Boolean = false): (Dataset[Event], java.io.File, String) = {
    import spark.implicits._
    val id = counter.incrementAndGet()
    val stage = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_file_replay_$id")
    val evs = graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    val maxTs = evs.agg(org.apache.spark.sql.functions.max("ts"))
      .head().getTimestamp(0)
    require(maxTs != null, s"no events under $dir")
    val sentinel = Seq(Event(-1L,
      new java.sql.Timestamp(maxTs.getTime + 30L * 86400000L), -1L,
      "sentinel", 0.0)).toDS()
    // ts-ordered chunk files named in feed order: the deterministic
    // exact-percentile layout keeps each file a contiguous ts slice
    // (same mechanics as the snapshot staging writes — no sampled
    // boundaries anywhere in the repo's layouts since r12); the
    // lexicographically-last chunk index is the sentinel's own file
    graft.operators.Maintenance.deterministicClusterShaper(
        evs.toDF(), $"ts", chunks, Seq($"ts", $"event_id"))(evs.toDF())
      .write.mode("overwrite").parquet(stage.getAbsolutePath)
    // FileStreamSource feeds files in modification-time order, and the
    // write above lands every part file within the same millisecond —
    // stamp strictly increasing mtimes in partition order (part-0000i
    // names sort with i) so the feed replays the ts-ordered slices in
    // order; the sentinel (appended and stamped after all of them)
    // closes the run
    def parquetFiles() = Option(stage.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    // a silently-failed stamp would let the sentinel feed early and
    // the 30-days-ahead watermark drop EVERY real event as late —
    // an empty result instead of an error, so the stamps are checked
    val dataFiles = parquetFiles().sortBy(_.getName)
    val base = System.currentTimeMillis() - (2 * dataFiles.length + 3) * 1000L
    dataFiles.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(base + i * 1000L), s"cannot stamp mtime on $f")
      if (dupFeed) {
        // the copy lands between this chunk and the next (mtime + 500 ms),
        // so under maxFilesPerTrigger=1 the re-delivery arrives in a LATER
        // micro-batch than its original — the same cross-batch dedup-state
        // exercise replay's dupFeed performs
        val dup = new java.io.File(stage, f.getName.stripSuffix(".parquet") + "-dup.parquet")
        java.nio.file.Files.copy(f.toPath, dup.toPath)
        require(dup.setLastModified(base + i * 1000L + 500L), s"cannot stamp mtime on $dup")
      }
    }
    val preSentinel = parquetFiles().map(_.getName).toSet
    sentinel.coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
    parquetFiles().filterNot(f => preSentinel(f.getName)).foreach(f =>
      require(f.setLastModified(base + (dataFiles.length + 1) * 1000L),
        s"cannot stamp mtime on $f"))
    val input = spark.readStream
      .schema(evs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(stage.getAbsolutePath)
      .as[Event]
    (input, stage, s"graft_file_replay_$id")
  }

  /** Replay `dir`'s events through `xform`; returns the finalized
    * rows as a stable local DataFrame.
    *
    * @param chunks  number of micro-batches to chop the feed into
    * @param dupFeed re-deliver every chunk a second time (at-least-once
    *                delivery simulation, for dedup semantics)
    */
  def replay(spark: SparkSession, dir: String, chunks: Int = 10,
      dupFeed: Boolean = false)(xform: Dataset[Event] => DataFrame): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val evs = graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    require(evs.nonEmpty, s"no events under $dir")
    val input = MemoryStream[Event]
    val name = s"graft_replay_${counter.incrementAndGet()}"
    val q = xform(input.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append()).start()
    try {
      val per = math.max(1, math.ceil(evs.length.toDouble / chunks).toInt)
      evs.grouped(per).foreach { chunk =>
        // drain after every feed: without the barrier the engine can
        // absorb several pending chunks into ONE micro-batch (it takes
        // all available MemoryStream blocks per trigger), silently
        // voiding the incremental-replay guarantee this harness exists
        // for — and a dupFeed re-delivery must arrive in a LATER batch
        // than its original to exercise cross-batch dedup state at all
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
        if (dupFeed) { input.addData(chunk.toIndexedSeq); q.processAllAvailable() }
      }
      // sentinel: 30 days past the last event — its own window/group can
      // never finalize (watermark stays 2h behind it), so it affects
      // nothing but the watermark
      val maxMs = evs.last.ts.getTime
      input.addData(Event(-1L, new java.sql.Timestamp(maxMs + 30L * 86400000L),
        -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    // snapshot the memory sink into a local frame independent of the
    // (now stopped) query
    val out = spark.table(name)
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }
}
