package graft

import org.apache.spark.sql.SparkSession

/** The library's session front door: one place that knows the Spark
  * configuration every operator here was designed and plan-audited
  * under. A user migrating off the reference DAG starts with
  * `GraftSession.builder()` (cluster) or `GraftSession.local(n)`
  * (tests, single box) and gets the graft SQL functions
  * (minhash_sketch, topk_items, quantile_sketch, …) plus the planner
  * rules registered via [[graft.plans.GraftExtensions]].
  *
  * Why each setting, at 100 TB:
  *
  *  - AQE on (with skew-join splitting and partition coalescing):
  *    the operators deliberately leave small data-dependent join
  *    sides unbroadcast and let AQE size them at runtime; the skew
  *    notes in Dedup/Relational assume AQE's skew-join splitter is
  *    available as the backstop; and the per-stage coalescer is what
  *    makes one static shuffle-partition count workable across a
  *    pipeline whose intermediate sizes span orders of magnitude.
  *  - `spark.sql.session.timeZone=UTC`: every date/window operator
  *    and every oracle is UTC-pinned; a local-zone session would
  *    silently shift day boundaries (SURVEY §4 discipline).
  *  - shuffle partitions: default 2×cores locally; on a cluster set
  *    it near 2-3× total executor cores (or rely on AQE coalescing
  *    from a higher initial count) so the largest shuffled stage's
  *    partitions fit in executor memory — the spill lever.
  *
  * Deliberately NOT set here: memory sizes, executor counts, and
  * `spark.sql.files.maxPartitionBytes` — cluster-shape decisions that
  * belong to deployment, not the library.
  */
object GraftSession {

  /** Cluster-oriented builder: recommended conf + graft extensions,
    * master/deploy left to spark-submit. */
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // r13: let AQE coalesce CACHED plans' output too (default false).
      // The iterative operators persist their loop-invariant frames,
      // and with the default every cache lands at the raw
      // shuffle-partition count — each cache-reading stage per
      // iteration then schedules that many tasks over KB-sized slices.
      // Coalescing is advisory-size-driven (same policy as every other
      // stage), so at 100 TB big caches keep their partition counts and
      // their hash layout; only below-advisory caches shrink.
      // Interleaved A/B at sf0.1 (tools/profile_r13_cachepart_ab.txt):
      // q_pagerank 2.4-3.0 s → 1.5-1.8 s (tasks 345 → 35),
      // q_dedup_clusters 2.8-3.2 → 2.0-2.2 (423 → 51), q_sql_merge
      // 7.1-7.7 → 6.3-6.6 (370 → 138); values partition-invariant
      // (oracle-pinned).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)

  /** Local session for tests/benchmarks/profilers: `cores` threads,
    * shuffle partitions = cores (the driver-contract shape — at local
    * scale a 200-partition default just adds scheduling overhead),
    * no UI. This is THE session every dev main in this repo runs on,
    * so their configs cannot drift apart. */
  def local(cores: Int, quiet: Boolean = true): SparkSession = {
    val spark = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (quiet) spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
