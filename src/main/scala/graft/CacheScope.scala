package graft

import scala.collection.mutable
import org.apache.spark.sql.DataFrame

/** Registry for caches an operator creates while BUILDING its plan but
  * whose lifetime must extend until the caller has materialized the
  * returned DataFrame (e.g. Dedup.dedupMinhash's candidate-pair cache,
  * read by three downstream branches). The operator registers the cache
  * here; the runner (Verify / Bench / specs) calls `releaseAll()` after
  * forcing the result, so no cached or locally-checkpointed blocks
  * accumulate across operator runs in a long-lived session.
  *
  * Blocks freed here for a PERSISTED frame are recoverable (lineage
  * intact — a late re-read just recomputes); for a locally-CHECKPOINTED
  * frame they are not, so release only after consumption — which is
  * exactly the runner contract.
  *
  * CONTRACT: one operator run at a time per process. The registry is
  * process-global, so a `releaseAll()` issued by one runner would free
  * caches a concurrently-running operator still reads. The drivers
  * honoring this today are Verify, Bench, and the specs — all strictly
  * sequential. A future multi-query runner must scope releases itself
  * (build → force → releaseAll as one critical section, or one process
  * per query). The contract is ENFORCED, not just documented: the
  * registry remembers which thread registered the live caches, and a
  * `releaseAll()` (or a new registration) arriving from a DIFFERENT
  * thread while caches are live throws IllegalStateException instead
  * of silently freeing blocks out from under the owning operator.
  */
object CacheScope {
  private val pending = mutable.Buffer.empty[() => Unit]
  private var ownerThread: Long = -1L

  /** Caller must hold the monitor. Binds ownership on first
    * registration; rejects cross-thread registration while another
    * operator's caches are live. */
  private def noteOwner(): Unit = {
    val t = Thread.currentThread().getId
    if (pending.isEmpty) ownerThread = t
    else if (ownerThread != t)
      throw new IllegalStateException(
        s"CacheScope: thread $t registered a cache while thread " +
          s"$ownerThread's operator caches are still live — one operator " +
          "run at a time per process (see CacheScope doc)")
  }

  /** Track a persisted DataFrame for deferred unpersist. */
  def track(df: DataFrame): DataFrame = synchronized {
    noteOwner()
    pending += (() => df.unpersist(blocking = false))
    df
  }

  /** Track an arbitrary release action (e.g. freeing a locally-
    * checkpointed generation's materialized RDD, which
    * `Dataset.unpersist` cannot reach). */
  def defer(f: () => Unit): Unit = synchronized {
    noteOwner()
    pending += f
  }

  /** Checkpoint a loop generation for lineage truncation — the shared
    * entry of every iterative operator (CC, pagerank, khop, kcore).
    *
    * Default: `localCheckpoint` — executor-block storage, no extra I/O,
    * right for dev/local runs, but a single lost executor makes the
    * truncated lineage unrecoverable and fails the job.
    *
    * Cluster mode: set `spark.graft.checkpointDir` to an HDFS/object-
    * store path and generations go through RELIABLE `Dataset
    * .checkpoint` instead — an hours-long 100 TB iterative job survives
    * executor loss, at the cost of one write+read of the generation per
    * round. Retirement ([[freeCheckpoint]]) deletes the superseded
    * generation's files, so the directory holds at most two
    * generations per operator at any time. */
  def checkpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        // setCheckpointDir appends a fresh UUID subdir on EVERY call,
        // and retirement resolves rdd-N paths against the CURRENT dir —
        // so set it only when the base dir actually changed, or retired
        // generations from earlier calls would never be found on disk
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        // persist first: an unpersisted reliable checkpoint runs the
        // plan TWICE (the count job, then ReliableRDDCheckpointData's
        // file write re-executes it — Spark's documented caveat), which
        // at the advertised hours-long-100TB scale doubles every round
        // and double-fires any observe() metric riding the plan.
        // An ALREADY-persisted input keeps its caller-owned cache:
        // persistence is not refcounted, so unpersisting here would
        // silently evict the caller's blocks (and the double-execution
        // hazard the pair guards against doesn't exist — the existing
        // cache already backs both reads).
        if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
          df.checkpoint()
        else {
          df.persist()
          try df.checkpoint()
          finally df.unpersist(blocking = false)
        }
      case _ => df.localCheckpoint()
    }
  }

  /** `.graftCheckpoint()` postfix syntax for [[checkpoint]], so loop
    * bodies read like the `.localCheckpoint()` they replace. */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def graftCheckpoint(): DataFrame = CacheScope.checkpoint(df)
  }

  /** Free a retired checkpoint generation — local-checkpoint executor
    * blocks, or a reliable generation's files + cache. Shared by every
    * iterative operator so checkpoint-retirement semantics can never
    * diverge between them. Only call once the SUCCESSOR generation has
    * materialized: a checkpoint has no lineage, so nothing can
    * recompute a freed one. */
  def freeCheckpoint(df: DataFrame): Unit =
    org.apache.spark.sql.graft.Bridge.freeCheckpointed(df)

  /** Free every tracked cache. Safe to call repeatedly from the owning
    * thread (or any thread when nothing is live); fails fast when
    * another thread's caches are registered. */
  def releaseAll(): Unit = synchronized {
    if (pending.nonEmpty && ownerThread != Thread.currentThread().getId)
      throw new IllegalStateException(
        s"CacheScope.releaseAll() from thread ${Thread.currentThread().getId} " +
          s"while thread $ownerThread's operator caches are live — a " +
          "concurrent runner must scope its own build→force→release " +
          "critical section (see CacheScope doc)")
    pending.foreach(f => f())
    pending.clear()
    ownerThread = -1L
  }
}
