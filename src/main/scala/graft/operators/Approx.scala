package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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
        // exact percentiles at the quantile ± 0.01: the self-
        // certification envelope. It must dominate BOTH the GK rank
        // error (n/accuracy = 1e-4·n ranks) and one element of rank
        // granularity (the sketch returns an actual element; the exact
        // side interpolates — at small n interpolation is tighter than
        // an element step, so a ±1e-3 envelope would false-alarm).
        // ±0.01 covers one element for n ≥ ~100 while still catching
        // any gross sketch regression; the tight α bound stays in the
        // spec (InfraSpec "approx stats").
        expr("percentile(value, array(0.49, 0.51, 0.94, 0.96))").as("env"),
      )
      .select(col("event_type"), col("n"), col("approx_users"), col("exact_users"),
        col("approx_p").getItem(0).as("approx_p50"),
        col("approx_p").getItem(1).as("approx_p95"),
        col("exact_p").getItem(0).as("exact_p50"),
        col("exact_p").getItem(1).as("exact_p95"),
        // driver-visible self-certification: a sketch regression flips
        // these to false and the rows-only gate sees it (not just a
        // spec). HLL++ rsd bound mirrors InfraSpec's envelope.
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(lit(3.0), col("exact_users") * 0.1)).as("hll_within_bound"),
        (col("approx_p").getItem(0).between(col("env").getItem(0), col("env").getItem(1)) &&
          col("approx_p").getItem(1).between(col("env").getItem(2), col("env").getItem(3)))
          .as("gk_within_bound"))
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
    * engines (same LCG recipe as q_permutation, salt 42) — built on
    * the ONE [[lcgState]] kernel so a recipe fix can never skip it. */
  private lazy val keepSql: String = {
    val whens = sampleThresholds
      .map { case (k, t) => s"WHEN event_type = '$k' THEN $t" }.mkString(" ")
    s"(${lcgState("event_id", 42L)} < (CASE $whens ELSE 0 END))"
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

  /** The two-round portable LCG state for a (key, salt) pair as SQL
    * text — identical in both engines (the q_permutation recipe). */
  private def lcgState(keyExpr: String, salt: Long): String =
    s"((((($keyExpr % 2147483648) * 1103515245 + ${12345L + salt * 1013904223L}) % 2147483648)" +
      " * 1103515245 + 12345) % 2147483648)"

  /** Weighted sampling without replacement (Efraimidis–Spirakis): per
    * source, keep the 5 documents with the smallest exponential key
    * e = −ln(u)/w, u from the portable LCG, w = n_chars — the length-
    * weighted mixture-sampling pass of training-data prep (longer docs
    * proportionally likelier).
    *
    * Scale shape: `source` is LOW-cardinality, so a per-group
    * row_number window would concentrate a near-global sort on a
    * handful of partitions. The selection therefore runs through the
    * native TopKPerGroup plan (plans/TopKPlan.scala — bounded k-heaps
    * with a pre-shuffle partial pass, so at most 5 rows per source per
    * input partition travel the wire), and the plan-audit spec asserts
    * TopK-no-Window. Negating the key turns TopK's (DESC, tie ASC)
    * selection into smallest-5; negation of a double is exact.
    *
    * Determinism: ekey is rounded to the 1e-6 grid BEFORE ranking in
    * both engines — JVM and libm `ln` may differ by 1 ulp, so ranking
    * the raw key risks a cross-engine flip at a near-tie boundary;
    * post-rounding ties break on doc_id identically everywhere. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = s"((${lcgState("doc_id", 77L)} + 1.0) / 2147483649.0)" // (0,1)
    val key = s"(-ln($u) / n_chars)"
    val keyed = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("ekey", graft.functions.Compat.r6(expr(key)))
      .withColumn("nekey", -col("ekey"))
    graft.plans.TopK.topKPerGroup(keyed, Seq("source"), "nekey", "doc_id", 5)
      .select(col("source"), col("doc_id"), col("n_chars"), col("ekey"))
      .orderBy("source", "ekey", "doc_id")
  }

  private val weightedSampleOracle = {
    import graft.functions.Compat.rSql
    val u = s"((${lcgState("doc_id", 77L)} + 1.0) / 2147483649.0)"
    val key = rSql(s"(-ln($u) / n_chars)", 6)
    s"""WITH ranked AS (
       |  SELECT source, doc_id, n_chars, $key AS ekey,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY $key, doc_id) AS rk
       |  FROM documents)
       |SELECT source, doc_id, n_chars, ekey
       |FROM ranked WHERE rk <= 5 ORDER BY source, ekey, doc_id""".stripMargin
  }

  /** Uniform k-per-stratum sampling through the mergeable bottom-k
    * AGGREGATE (functions.BottomKAgg) — the second scale path for
    * selection, complementing q_weighted_sample's native TopKPerGroup
    * PLAN: aggregate state is ≤ k pairs per group with map-side
    * partial merge, so the shuffle carries k·groups·partitions rows
    * and no sort ever runs. The sampling key is the raw two-round LCG
    * state (an INTEGER — no transcendental, no rounding surface at
    * all), so the oracle replays the selection verbatim.
    *
    * This is the batch twin of the streaming reservoir
    * (streaming.EventStream.sampleReservoir): same aggregate, same
    * chop/merge-invariance argument — with distinct doc_ids the
    * (ukey, doc_id) order is total, so the k minimum is unique
    * whatever the partitioning. */
  def uniformSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val st = lcgState("doc_id", 91L)
    val keyed = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"))
      .withColumn("ukey", expr(st).cast(DoubleType)) // < 2^31: exact in double
    keyed.groupBy("source")
      .agg(graft.functions.BottomKAgg.bottomK(col("ukey"), col("doc_id"), 4).as("picks"))
      .select(col("source"), posexplode(col("picks")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"), col("col.ekey").cast("long").as("ukey"))
      .orderBy("source", "rk")
  }

  private val uniformSampleOracle: String = {
    val st = lcgState("doc_id", 91L)
    s"""WITH keyed AS (
       |  SELECT source, doc_id, $st AS ukey FROM documents),
       |ranked AS (
       |  SELECT source, doc_id, ukey,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY ukey, doc_id) AS rk
       |  FROM keyed)
       |SELECT source, rk, doc_id, CAST(ukey AS BIGINT) AS ukey
       |FROM ranked WHERE rk <= 4 ORDER BY source, rk""".stripMargin
  }

  /** The Laplace inverse-CDF draw (−b·sgn(u−½)·ln(1−2|u−½|)) for a
    * group-keyed LCG state, as SQL text shared by both engines. The
    * run `seed` folds into the LCG's additive constant (seed 0 leaves
    * the recipe unchanged), so every seed is its own reproducible
    * noise stream. */
  private def lapSql(gk: String, salt: Long, seed: Long, scale: String): String = {
    // fold the caller's seed into [0, 2^31) BEFORE it enters the
    // recipe: an arbitrary secret seed is the documented production
    // path, and unreduced it can (a) drive the LCG state negative
    // (u <= 0 -> ln of a negative: Spark NULL vs DuckDB error) or
    // (b) overflow seed*69069 (Scala wraps silently, DuckDB raises).
    // floorMod keeps every long seed valid and collision-free per
    // 2^31-residue; the folded literal lands identically in both
    // engines' SQL text.
    val sFold = java.lang.Math.floorMod(seed, 2147483648L)
    val add = java.lang.Math.floorMod(
      12345L + salt * 1013904223L + sFold * 69069L, 2147483648L)
    val st = s"((((($gk % 2147483648) * 1103515245 + $add) % 2147483648)" +
      " * 1103515245 + 12345) % 2147483648)"
    val u = s"(($st + 1.0) / 2147483649.0)"
    s"(-$scale * sign($u - 0.5) * ln(1.0 - 2.0 * abs($u - 0.5)))"
  }

  /** Differentially-private aggregate release: per-event-type count and
    * value sum with Laplace(sensitivity/ε) noise, ε = 1, noise drawn
    * from the portable LCG through the inverse CDF — the
    * noisy-measurements pattern for publishing aggregates of sensitive
    * data. Noise is keyed on a hash of the GROUP (not rows) plus the
    * run seed, so the operator is one map-side-combined aggregation
    * plus a scan-local noise expression; the oracle replays the draw
    * exactly for the same seed.
    *
    * PRIVACY CONTRACT: this demonstrates the Laplace mechanism — the
    * sensitivity bookkeeping and the draw are real — but the noise is
    * only as secret as the seed. The fixed default seed (0) exists so
    * the DuckDB oracle can verify the mechanism; an actual release
    * must (a) call [[dpRelease]] with a seed kept secret from data
    * consumers (and ideally a cryptographic RNG in place of the LCG),
    * and (b) publish ONLY the dp_* columns, which [[dpRelease]]
    * enforces by dropping the true values from the schema. With a
    * public seed the release is exactly invertible and provides no ε. */
  def dpAggregate(spark: SparkSession, dir: String): DataFrame =
    dpAggregateWith(spark, dir, seed = 0L)

  /** Test/audit mode: true values ride along so the oracle and specs
    * can bound |noise|. Not a release — see the privacy contract. */
  def dpAggregateWith(spark: SparkSession, dir: String, seed: Long): DataFrame = {
    // group key → integer via length+first-char (portable, collision-
    // free across the 5 event types; a real release would key on a
    // per-group id column)
    val gk = "(length(event_type) * 256 + ascii(substring(event_type, 1, 1)))"
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val d = DecimalType(28, 6)
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("true_n"),
        sum(col("value").cast(d)).cast(DoubleType).as("true_sum"))
      // count sensitivity 1, sum sensitivity ~max|value| (bounded 200)
      .withColumn("dp_n", graft.functions.Compat.r4(
        col("true_n") + expr(lapSql(gk, 1L, seed, "1.0"))))
      .withColumn("dp_sum", graft.functions.Compat.r4(
        col("true_sum") + expr(lapSql(gk, 2L, seed, "200.0"))))
      .select(col("event_type"), col("true_n"), col("dp_n"),
        graft.functions.Compat.r4(col("true_sum")).as("true_sum_r"), col("dp_sum"))
      .orderBy("event_type")
  }

  /** Release mode: ONLY the noisy aggregates leave — the schema cannot
    * leak a true value. The caller supplies the run seed and keeps it
    * secret from data consumers (see [[dpAggregate]]'s contract). */
  def dpRelease(spark: SparkSession, dir: String, seed: Long): DataFrame =
    dpAggregateWith(spark, dir, seed)
      .select("event_type", "dp_n", "dp_sum")

  /** Oracle generated from the SAME seed the Spark plan is built from
    * (the SwitchbackParams single-source-of-truth pattern). */
  def dpAggregateOracleFor(seed: Long): String = {
    val gk = "(length(event_type) * 256 + ascii(substring(event_type, 1, 1)))"
    import graft.functions.Compat.rSql
    s"""WITH agg AS (
       |  SELECT event_type, COUNT(*) AS true_n,
       |    CAST(SUM(CAST("value" AS DECIMAL(28,6))) AS DOUBLE) AS true_sum
       |  FROM events GROUP BY 1)
       |SELECT event_type, true_n,
       |  ${rSql(s"(true_n + ${lapSql(gk, 1L, seed, "1.0")})", 4)} AS dp_n,
       |  ${rSql("true_sum", 4)} AS true_sum_r,
       |  ${rSql(s"(true_sum + ${lapSql(gk, 2L, seed, "200.0")})", 4)} AS dp_sum
       |FROM agg ORDER BY event_type""".stripMargin
  }

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
        col("exact").getItem(2).as("exact_p99"),
        // driver-visible self-certification: the documented α=1% bucket
        // bound (+0.5 slack for the exact side's interpolation, the
        // same envelope InfraSpec asserts) — a sketch regression flips
        // this false and the rows-only gate catches it
        Seq(0, 1, 2).map(i =>
          abs(col("qs").getItem(i) - col("exact").getItem(i)) <=
            abs(col("exact").getItem(i)) * 0.025 + 0.5)
          .reduce(_ && _).as("within_bound"))
      .orderBy("event_type")
  }

  // ---------------------------------------------- training shard assignment

  /** Deterministic training-shard assignment — the "global shuffle"
    * every epoch of LLM training needs without ever sorting the corpus:
    * each document hashes to one of 16 shards through the portable
    * two-round LCG (salt 91), and its position WITHIN the shard is a
    * second independent LCG draw (salt 92) — so a reader streaming
    * shard files in (shard, position) order sees a reproducible
    * pseudo-random permutation of the corpus. Emits the shard-balance
    * readout (doc and char counts, share, and the χ² uniformity
    * contribution) that gates a skewed shard from slowing every data-
    * parallel rank to the largest file.
    *
    * Scale: assignment and position are scan-local expressions; the
    * only shuffle is the 16-row balance aggregation. The same plan
    * writes the shards themselves at 100 TB (partitionBy(shard),
    * sortWithinPartitions(pos) — Sources.writePartitioned). */
  def shardAssign(spark: SparkSession, dir: String): DataFrame = {
    val nShards = 16
    val docs = Tables.documents(spark, dir)
      .withColumn("shard", expr(s"${lcgState("doc_id", 91L)} % $nShards"))
      .withColumn("pos", expr(lcgState("doc_id", 92L)))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    // head doc = min over (pos, doc_id) — the LCG reduces doc_id mod
    // 2^31, so two 64-bit ids CAN share a position; the lexicographic
    // struct min breaks that tie identically in both engines where a
    // bare min_by's tie resolution is engine-arbitrary
    docs.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        min(struct(col("pos"), col("doc_id"))).getField("doc_id").as("head_doc"))
      .crossJoin(broadcast(tot))
      .withColumn("dev", col("n_docs") - col("n_total").cast(DoubleType) / nShards)
      .select(col("shard"), col("n_docs"), col("n_chars"), col("head_doc"),
        r6(col("n_docs") / col("n_total")).as("share"),
        r4(col("dev") * col("dev") /
          (col("n_total").cast(DoubleType) / nShards)).as("chisq_term"))
      .orderBy("shard")
  }

  private val shardAssignOracle: String = {
    val nShards = 16
    val dev = s"(COUNT(*) - CAST(n_total AS DOUBLE) / $nShards)"
    s"""WITH docs AS (
       |  SELECT doc_id, n_chars,
       |    ${lcgState("doc_id", 91L)} % $nShards AS shard,
       |    ${lcgState("doc_id", 92L)} AS pos
       |  FROM documents),
       |tot AS (SELECT COUNT(*) AS n_total FROM docs)
       |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  (min(struct_pack(pos := pos, doc_id := doc_id))).doc_id AS head_doc,
       |  ${rSql("(COUNT(*) / n_total)", 6)} AS share,
       |  ${rSql(s"($dev * $dev / (CAST(n_total AS DOUBLE) / $nShards))", 4)} AS chisq_term
       |FROM docs, tot
       |GROUP BY shard, n_total ORDER BY shard""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_approx_stats", approxStats, None),
    Op("q_shard_assign", shardAssign, Some(shardAssignOracle)),
    Op("q_qsketch", quantileSketchStats, None),
    Op("q_stratified_sample", stratifiedSample, Some(stratifiedSampleOracle)),
    Op("q_weighted_sample", weightedSample, Some(weightedSampleOracle)),
    Op("q_sample_uniform", uniformSample, Some(uniformSampleOracle)),
    Op("q_dp_agg", dpAggregate, Some(dpAggregateOracleFor(0L))),
  )
}
