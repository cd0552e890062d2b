package graft.operators

import graft.{CacheScope, Op, Tables}
import graft.functions.Compat._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Distributed graph centrality (SURVEY.md §2 block C): damped
  * PageRank over a deterministic document-link graph — the link-
  * analysis quality signal large-scale corpus curation uses to weight
  * hub/reference documents (and the canonical "iterative joins"
  * workload a Spark-native engine must handle without driver round
  * trips; the CC collapse in Dedup.scala is its min-label sibling).
  *
  * The graph derives from the data, not an RNG: within each source the
  * docs (ordered by doc_id) form a ring (i → next, cyclic) and every
  * non-hub doc also links to the source's hub (min doc_id) — a
  * hub-and-spoke-with-ring shape giving genuinely varied in-degrees.
  *
  * Determinism (SURVEY §4): ranks live on the 1e-6 grid — each edge
  * contribution pr/outdeg is r6-rounded, per-node sums run in DECIMAL
  * (accumulation-order invariant), and the damped update re-rounds.
  * The oracle replays all five iterations as an unrolled CTE chain.
  *
  * Scale: edges/degrees build once from a window over the dimension
  * table and persist (CacheScope); each iteration is one |edges|
  * hash-join + one |nodes| aggregation — the standard Pregel-as-joins
  * shape, no collect, no growing lineage blowup at 5 iterations.
  */
object Graph {

  private val iters = 5

  /** Edge list + out-degrees: ring-within-source ∪ spoke-to-hub. */
  private def edgesWithDeg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val ord = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("nxt", lead("doc_id", 1).over(w))
      .withColumn("hub", min("doc_id").over(Window.partitionBy("source")))
    val ring = ord.select(col("doc_id").as("src"),
        coalesce(col("nxt"), col("hub")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val spoke = ord.filter(col("doc_id") =!= col("hub"))
      .select(col("doc_id").as("src"), col("hub").as("dst"))
    val edges = ring.unionAll(spoke).distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outd"))
    edges.join(deg, "src")
  }

  /** Five damped (d = 0.85) PageRank iterations; top-20 nodes by final
    * rank (deterministic tie-break on doc_id). */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val docs = Tables.documents(spark, dir)
    val nodes = docs.select(col("doc_id"))
    val nF = docs.agg(count(lit(1)).as("n_docs"))
    val edges = CacheScope.track(edgesWithDeg(spark, dir).persist())
    var ranks = nodes.crossJoin(broadcast(nF))
      .select(col("doc_id"), r6(lit(1.0) / col("n_docs")).as("pr"))
    for (_ <- 1 to iters) {
      val sums = edges.join(ranks, edges("src") === ranks("doc_id"))
        .select(col("dst"), r6(col("pr") / col("outd")).as("c"))
        .groupBy("dst")
        .agg(sum(col("c").cast(dec)).cast(DoubleType).as("cs"))
      ranks = nodes.crossJoin(broadcast(nF))
        .join(sums, nodes("doc_id") === sums("dst"), "left")
        .select(nodes("doc_id"),
          r6(lit(0.15) / col("n_docs") +
            lit(0.85) * coalesce(col("cs"), lit(0.0))).as("pr"))
    }
    // TakeOrderedAndProject (distributed top-k) FIRST, then the global
    // row_number window runs over 20 rows only — never a full sort of
    // the node table on one partition.
    val top = ranks.orderBy(col("pr").desc, col("doc_id")).limit(20)
    val byRank = Window.orderBy(col("pr").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(byRank))
      .select(col("rank"), col("doc_id"), col("pr"))
      .orderBy("rank")
  }

  private val pagerankOracle: String = {
    val steps = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst, ${rSql("(r.pr / e.outd)", 6)} AS c
         |  FROM edges e JOIN $prev r ON e.src = r.doc_id),
         |s$i AS (
         |  SELECT dst, CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS cs
         |  FROM c$i GROUP BY 1),
         |r$i AS (
         |  SELECT nodes.doc_id,
         |    ${rSql("(CAST(0.15 AS DOUBLE) / n_docs + CAST(0.85 AS DOUBLE) * COALESCE(cs, 0.0))", 6)} AS pr
         |  FROM nodes CROSS JOIN n LEFT JOIN s$i ON s$i.dst = nodes.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT doc_id FROM documents),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |ord AS (
       |  SELECT doc_id, source,
       |    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS nxt,
       |    MIN(doc_id) OVER (PARTITION BY source) AS hub
       |  FROM documents),
       |rawedges AS (
       |  SELECT doc_id AS src, COALESCE(nxt, hub) AS dst FROM ord
       |    WHERE COALESCE(nxt, hub) <> doc_id
       |  UNION ALL
       |  SELECT doc_id AS src, hub AS dst FROM ord WHERE doc_id <> hub),
       |dedges AS (SELECT DISTINCT src, dst FROM rawedges),
       |deg AS (SELECT src, COUNT(*) AS outd FROM dedges GROUP BY 1),
       |edges AS (SELECT dedges.src, dst, outd FROM dedges JOIN deg ON dedges.src = deg.src),
       |r0 AS (
       |  SELECT doc_id, ${rSql("(CAST(1.0 AS DOUBLE) / n_docs)", 6)} AS pr
       |  FROM nodes CROSS JOIN n),
       |$steps
       |SELECT "rank", doc_id, pr FROM (
       |  SELECT doc_id, pr,
       |    ROW_NUMBER() OVER (ORDER BY pr DESC, doc_id) AS "rank"
       |  FROM r$iters)
       |WHERE "rank" <= 20 ORDER BY "rank"""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_pagerank", pagerank, Some(pagerankOracle)),
  )
}
