package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregation — the 100 TB stand-ins for exact operators:
  * HyperLogLog++ distinct counts and Greenwald-Khanna quantile sketches
  * are mergeable, single-pass, and bounded-memory, where exact
  * percentiles/distincts need a full shuffle of the column. Sketch
  * internals aren't reproducible in another engine → rows-only check;
  * the spec bounds their error against the exact operators instead. */
object Approx {

  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        expr("approx_percentile(value, array(0.5, 0.95), 10000)").as("approx_p"),
        expr("percentile(value, array(0.5, 0.95))").as("exact_p"),
      )
      .select(col("event_type"), col("n"), col("approx_users"), col("exact_users"),
        col("approx_p").getItem(0).as("approx_p50"),
        col("approx_p").getItem(1).as("approx_p95"),
        col("exact_p").getItem(0).as("exact_p50"),
        col("exact_p").getItem(1).as("exact_p95"))
      .orderBy("event_type")

  /** Deterministic stratified sampling: per-class rates applied via a
    * two-round portable-LCG uniform per row — reproducible (no RNG
    * state, no partition-order dependence, unlike sampleBy) and exactly
    * the class-rebalancing pass a training-data pipeline runs. The
    * keep test is ALL-INTEGER (lcg_state < floor(rate·2^31)) with
    * identical SQL text in both engines, so it is oracle-backed. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSampleFrame(spark, dir)

  /** (rate → 2^31-scaled integer keep-threshold) per event class. */
  private val sampleThresholds: Seq[(String, Long)] = Seq(
    "click" -> 214748364L, "view" -> 214748364L,     // rate 0.1
    "purchase" -> 2147483648L, "signup" -> 2147483648L, // rate 1.0
    "error" -> 1073741824L)                           // rate 0.5

  /** The row-keep predicate as SQL text shared verbatim by both
    * engines (same LCG recipe as q_permutation, salt 42). */
  private val keepSql: String = {
    val st = s"(((((event_id % 2147483648) * 1103515245 + ${12345L + 42L * 1013904223L}) % 2147483648)" +
      " * 1103515245 + 12345) % 2147483648)"
    val whens = sampleThresholds
      .map { case (k, t) => s"WHEN event_type = '$k' THEN $t" }.mkString(" ")
    s"($st < (CASE $whens ELSE 0 END))"
  }

  private def stratifiedSampleFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(expr(keepSql))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("event_type")

  private val stratifiedSampleOracle: String =
    s"""SELECT event_type, COUNT(*) AS n_sampled
       |FROM events WHERE $keepSql
       |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Custom mergeable quantile sketch (functions.QuantileSketchAgg, the
    * DDSketch log-bucket construction) beside the exact percentiles:
    * per event_type, sketch p50/p90/p99 at α=1% relative error. Unlike
    * approx_percentile (GK), the sketch's merge is pure count addition,
    * so results are identical under any partitioning — the property the
    * spec asserts. Rows-only (sketch internals aren't portable SQL). */
  def quantileSketchStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.QuantileSketch.quantileSketch
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        quantileSketch(col("value"), Seq(0.5, 0.9, 0.99)).as("qs"),
        expr("percentile(value, array(0.5, 0.9, 0.99))").as("exact"),
      )
      .select(col("event_type"), col("n"),
        col("qs").getItem(0).as("sk_p50"),
        col("qs").getItem(1).as("sk_p90"),
        col("qs").getItem(2).as("sk_p99"),
        col("exact").getItem(0).as("exact_p50"),
        col("exact").getItem(1).as("exact_p90"),
        col("exact").getItem(2).as("exact_p99"))
      .orderBy("event_type")
  }

  val ops: Seq[Op] = Seq(
    Op("q_approx_stats", approxStats, None),
    Op("q_qsketch", quantileSketchStats, None),
    Op("q_stratified_sample", stratifiedSample, Some(stratifiedSampleOracle)),
  )
}
