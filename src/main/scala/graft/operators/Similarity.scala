package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY.md §2 block C):
  * brute-force cosine top-k as the correctness baseline, and sign-LSH
  * bucketed ANN as the scale path.
  *
  * Scale design: the query side is broadcast (it is small by
  * definition); candidate vectors stream through partitions once.
  * Cosines accumulate left-to-right in double so the DuckDB oracle can
  * reproduce them bit-for-bit before rounding; ranking happens on the
  * ROUNDED cosine with a vec_id tie-break, so rank order is stable
  * across engines. At 100 TB: pre-normalize vectors at ingest, pick
  * IVF/LSH buckets per query, and merge bucket-local top-k — the ANN
  * operator below is that plan in miniature.
  */
object Similarity {

  /** Brute-force cosine top-5 neighbors for the query set vec_id < 10.
    * Norms are pre-computed per side (once per vector, not once per
    * pair) and the dot product is the native codegen'd kernel. */
  def knnCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .withColumn("nrm", VectorFunctions.norm(col("embedding")))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = broadcast(queries).join(emb, col("q_id") =!= col("vec_id"))
      .withColumn("cos", r6(VectorFunctions.cosine(
        col("q_emb"), col("embedding"), col("q_nrm"), col("nrm"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")
  }

  private val knnCosineOracle = {
    val rawCos =
      "(list_sum(list_transform(list_zip(q.embedding, e.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"
    s"""WITH scored AS (
      |  SELECT q.vec_id AS q_id, e.vec_id,
      |    ${rSql(rawCos, 6)} AS cos
      |  FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id != q.vec_id),
      |ranked AS (
      |  SELECT q_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
      |  FROM scored)
      |SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  }

  /** Sign-LSH bucketed ANN: 6 deterministic pseudo-hyperplanes → 64
    * buckets; per query, search only its bucket and emit bucket-local
    * top-3. Rows-only (murmur3-derived hyperplanes aren't portable). */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val bucketBits = (0 until 6).map { k =>
      val dot = expr(
        s"""aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
           |  (v, j) -> CAST(v AS DOUBLE) * (CASE WHEN pmod(hash($k, j), 2) = 0 THEN 1.0 ELSE -1.0 END)),
           |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
      when(dot >= 0, expr(s"shiftleft(1L, $k)")).otherwise(0L)
    }
    val bucketed = emb.withColumn("bucket", bucketBits.reduce(_ + _))
      .withColumn("nrm", VectorFunctions.norm(col("embedding")))
    val queries = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket"))
    val scored = broadcast(queries)
      .join(bucketed, Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", r6(VectorFunctions.cosine(
        col("q_emb"), col("embedding"), col("q_nrm"), col("nrm"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")
  }

  val ops: Seq[Op] = Seq(
    Op("q_knn_cosine", knnCosine, Some(knnCosineOracle), headline = true),
    Op("q_ann_lsh", annLsh, None),
  )
}
