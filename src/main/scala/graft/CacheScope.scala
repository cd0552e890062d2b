package graft

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.Bridge

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
  */
object CacheScope {
  private val pending = mutable.Buffer.empty[() => Unit]

  /** Track a persisted DataFrame for deferred unpersist. */
  def track(df: DataFrame): DataFrame = synchronized {
    pending += (() => df.unpersist(blocking = false))
    df
  }

  /** Track a locally-checkpointed DataFrame. `Dataset.unpersist` is a
    * cache-manager no-op for these — the blocks belong to the
    * materialized internal RDD — so free that RDD directly. */
  def trackCheckpointed(df: DataFrame): DataFrame = synchronized {
    val rdd = Bridge.materializedRdd(df)
    pending += (() => rdd.foreach(_.unpersist(blocking = false)))
    df
  }

  /** Track an arbitrary release action. */
  def defer(f: () => Unit): Unit = synchronized { pending += f }

  /** Free every tracked cache. Safe to call repeatedly. */
  def releaseAll(): Unit = synchronized {
    pending.foreach(f => f())
    pending.clear()
  }
}
