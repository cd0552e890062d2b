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
  * per query); do NOT call releaseAll() from concurrent threads.
  */
object CacheScope {
  private val pending = mutable.Buffer.empty[() => Unit]

  /** Track a persisted DataFrame for deferred unpersist. */
  def track(df: DataFrame): DataFrame = synchronized {
    pending += (() => df.unpersist(blocking = false))
    df
  }

  /** Track an arbitrary release action (e.g. freeing a locally-
    * checkpointed generation's materialized RDD, which
    * `Dataset.unpersist` cannot reach). */
  def defer(f: () => Unit): Unit = synchronized { pending += f }

  /** Free every tracked cache. Safe to call repeatedly. */
  def releaseAll(): Unit = synchronized {
    pending.foreach(f => f())
    pending.clear()
  }
}
