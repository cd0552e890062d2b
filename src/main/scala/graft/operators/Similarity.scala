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

  /** Sign-LSH bucketed ANN: 6 deterministic Rademacher hyperplanes →
    * 64 buckets; per query, search only its bucket and emit
    * bucket-local top-3. Hyperplane signs come from the portable LCG,
    * so the DuckDB oracle replays bucketing, scoring and ranking. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // hyperplane signs from the portable LCG's mid bits (planes 8..13,
    // disjoint from q_random_projection/q_dedup_embed's 0..7) — pure
    // integer arithmetic, so bucketing is oracle-replayable
    val bucketBits = (0 until 6).map { k =>
      val dot = VectorFunctions.rademacherDot(col("embedding"), k + 8)
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

  private val annLshOracle = {
    def dotK(k: Int) =
      s"""list_sum(list_transform(generate_series(0, len(embedding) - 1),
         |      hp_j -> CAST(embedding[hp_j + 1] AS DOUBLE) *
         |        (CASE WHEN ((CAST(1103515245 AS BIGINT) * CAST(${k + 8} * 64 + hp_j AS BIGINT) + 12345) // 1024) % 2 = 0
         |         THEN 1.0 ELSE -1.0 END)))""".stripMargin
    val bucket = (0 until 6).map(k =>
      s"(CASE WHEN ${dotK(k)} >= 0 THEN (CAST(1 AS BIGINT) << $k) ELSE CAST(0 AS BIGINT) END)")
      .mkString("\n    + ")
    val cos = "(list_sum(list_transform(list_zip(q.embedding, e.embedding), " +
      "cz -> CAST(cz[1] AS DOUBLE) * CAST(cz[2] AS DOUBLE))) / (q.nrm * e.nrm))"
    s"""WITH sig AS (
       |  SELECT vec_id, embedding,
       |    $bucket AS bucket,
       |    sqrt(list_sum(list_transform(embedding, nx -> CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id, ${rSql(cos, 6)} AS cos
       |  FROM sig q JOIN sig e
       |    ON q.bucket = e.bucket AND q.vec_id < 10 AND e.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  }

  /** Train IVF centroids: deterministic init (first `k` vectors by
    * vec_id) + `iters` Lloyd rounds. Assignment is argmax cosine
    * against broadcast centroid literals; re-estimation is an
    * elementwise mean via posexplode — one shuffle per round keyed on
    * (cluster, dim). Centroids come back to the driver (k·64 floats —
    * dimension-table sized) for the next round's broadcast. */
  /** Collect the vectors with vec_id < n (id kept, components widened
    * to double) — the shared deterministic-init read of both quantizer
    * trainers, so a composed train (IVF-PQ) pays ONE init job, not two.
    * Ids are returned so a caller slicing a smaller init out of a
    * larger one filters BY ID (`_._1 < k`), not by array prefix — a
    * prefix is only equivalent when vec_ids are dense from 0, and the
    * oracle's c0 CTE is defined as `vec_id < k`. */
  private[graft] def firstVectors(emb: DataFrame, n: Int): Array[(Long, Seq[Double])] =
    emb.filter(col("vec_id") < n).orderBy("vec_id").select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))

  def trainIvf(emb: DataFrame, k: Int, iters: Int,
      init0: Option[Array[Seq[Double]]] = None): Array[Seq[Double]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val dec = DecimalType(28, 6)
    // init: the first k vectors, float components widened to double
    // (exact) — the oracle's c0 CTE does the identical CAST
    var centroids: Array[Seq[Double]] =
      init0.getOrElse(firstVectors(emb, k).map(_._2))
    require(centroids.length == k,
      s"trainIvf: init needs the $k vectors with vec_id < $k (dense ids " +
        s"from 0); got ${centroids.length}")
    (1 to iters).foreach { _ =>
      val cCols = centroids.map(c =>
        VectorFunctions.dotFd(col("embedding"), typedLit(c)) /
          (VectorFunctions.norm(col("embedding")) * typedLit(l2(c))))
      val assigned = emb.withColumn("dots", array(cCols: _*))
        .withColumn("cluster",
          expr("array_position(dots, array_max(dots))").cast("int") - 1)
      // re-estimation on the SURVEY §4 discipline: elements r6-widened,
      // summed in DECIMAL (accumulation-order invariant), divided once
      // in double and re-rounded — the same chain the DuckDB oracle
      // replays, and bit-stable under any partitioning (a plain avg()
      // of doubles would not be)
      val means = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(r6(sum(r6(col("v").cast(DoubleType)).cast(dec)).cast(DoubleType) /
          count(lit(1))).as("m"))
        .collect()
      val next = Array.tabulate(k)(i => centroids(i).toArray.clone())
      means.foreach { r =>
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("dim")) = r.getAs[Double]("m")
      }
      centroids = next.map(_.toSeq)
    }
    centroids
  }

  private def l2(c: Seq[Double]): Double =
    math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))

  /** IVF ANN: search only the `nprobe` clusters nearest to each query.
    * The correctness/recall trade is the classic IVF one: at 100 TB the
    * cluster assignment is computed at ingest and the candidate scan
    * touches nprobe/k of the data. Training still round-trips k·64
    * doubles through the driver (dimension-table sized, documented),
    * but every arithmetic step — init, assignment, decimal-exact
    * re-estimation, probe ranking — lives on the portable grid, so the
    * DuckDB oracle replays BOTH Lloyd iterations as a CTE chain and
    * the whole operator is oracle-backed. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val centroids = trainIvf(emb, k = 8, iters = 2)
    val cCols = centroids.map(c =>
      VectorFunctions.dotFd(col("embedding"), typedLit(c)) /
        (VectorFunctions.norm(col("embedding")) * typedLit(l2(c))))
    val assigned = emb.withColumn("dots", array(cCols: _*))
      .withColumn("cluster",
        expr("array_position(dots, array_max(dots))").cast("int") - 1)
      .withColumn("nrm", VectorFunctions.norm(col("embedding")))
      .drop("dots")
    // queries probe their 2 nearest clusters
    val queries = assigned.filter(col("vec_id") < 10)
      .withColumn("dots", array(cCols: _*))
      .withColumn("probe", expr(
        // explicit index tie-break: no reliance on array_sort stability
        "slice(array_sort(arrays_zip(dots, sequence(0, size(dots) - 1)), (a, b) -> CASE WHEN a.dots > b.dots THEN -1 WHEN a.dots < b.dots THEN 1 WHEN a.`1` < b.`1` THEN -1 ELSE 1 END), 1, 2).`1`"))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), explode(col("probe")).as("cluster"))
    val scored = broadcast(queries)
      .join(assigned, Seq("cluster"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", r6(VectorFunctions.cosine(
        col("q_emb"), col("embedding"), col("q_nrm"), col("nrm"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** One Lloyd iteration as CTE text: assignment against centroid set
    * `cPrev` (cluster, c double-list) → decimal-exact per-(cluster,dim)
    * means → next centroid set `cNext` (empty clusters keep their old
    * centroid). Mirrors trainIvf exactly. */
  private def lloydCtes(i: Int, cPrev: String, cNext: String): String = {
    val dot = s"list_sum(list_transform(list_zip(e.embedding, cp.c), lz -> CAST(lz[1] AS DOUBLE) * lz[2]))"
    val nrmE = "sqrt(list_sum(list_transform(e.embedding, nx -> CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))))"
    val nrmC = "sqrt(list_sum(list_transform(cp.c, nx -> nx * nx)))"
    s"""sc$i AS (
       |  SELECT e.vec_id, e.embedding, cp.cluster,
       |    ($dot / ($nrmE * $nrmC)) AS cos
       |  FROM embeddings e CROSS JOIN $cPrev cp),
       |asg$i AS (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT vec_id, embedding, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rn
       |    FROM sc$i) WHERE rn = 1),
       |mean$i AS (
       |  SELECT cluster, u.dim,
       |    ${rSql("(CAST(SUM(CAST(" + rSql("CAST(u.v AS DOUBLE)", 6) + " AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 6)} AS m
       |  FROM asg$i,
       |    LATERAL (SELECT unnest(list_transform(generate_series(1, len(embedding)),
       |      pe_i -> {'dim': pe_i - 1, 'v': embedding[pe_i]})) AS u)
       |  GROUP BY cluster, u.dim),
       |$cNext AS (
       |  SELECT od.cluster, list(COALESCE(mean$i.m, od.v) ORDER BY od.dim) AS c
       |  FROM (
       |    SELECT cluster, u.dim, u.v FROM $cPrev,
       |      LATERAL (SELECT unnest(list_transform(generate_series(1, len(c)),
       |        oe_i -> {'dim': oe_i - 1, 'v': c[oe_i]})) AS u) ) od
       |  LEFT JOIN mean$i ON od.cluster = mean$i.cluster AND od.dim = mean$i.dim
       |  GROUP BY od.cluster)""".stripMargin
  }

  /** The shared IVF oracle chain (init → 2 Lloyd rounds → cluster
    * assignment → nprobe=2 probe list) — composed by annIvfOracle and
    * the IVF-PQ oracle so the coarse quantizer can never diverge
    * between them. */
  private lazy val ivfChainCtes: String =
    s"""c0 AS (
       |  SELECT vec_id AS cluster, list_transform(embedding, cx -> CAST(cx AS DOUBLE)) AS c
       |  FROM embeddings WHERE vec_id < 8),
       |${lloydCtes(1, "c0", "c1")},
       |${lloydCtes(2, "c1", "c2")},
       |final_sc AS (
       |  SELECT e.vec_id, e.embedding, cp.cluster,
       |    (list_sum(list_transform(list_zip(e.embedding, cp.c), lz -> CAST(lz[1] AS DOUBLE) * lz[2]))
       |      / (sqrt(list_sum(list_transform(e.embedding, nx -> CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(cp.c, nx -> nx * nx))))) AS cos
       |  FROM embeddings e CROSS JOIN c2 cp),
       |assigned AS (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT vec_id, embedding, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rn
       |    FROM final_sc) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding, cluster FROM (
       |    SELECT vec_id, embedding, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rn
       |    FROM final_sc WHERE vec_id < 10) WHERE rn <= 2)""".stripMargin

  private val annIvfOracle = {
    val dotQ = "list_sum(list_transform(list_zip(q.embedding, e.embedding), qz -> CAST(qz[1] AS DOUBLE) * CAST(qz[2] AS DOUBLE)))"
    val nrm = (t: String) => s"sqrt(list_sum(list_transform($t.embedding, nx -> CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))))"
    s"""WITH $ivfChainCtes,
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |    ${rSql(s"($dotQ / (${nrm("q")} * ${nrm("e")}))", 6)} AS cos
       |  FROM probes q JOIN assigned e ON q.cluster = e.cluster AND e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  }

  /** Johnson–Lindenstrauss random projection 64→8 dims with an
    * Achlioptas ±1 (Rademacher) matrix — the dimensionality-reduction
    * pass in front of ANN indexing / clustering at scale. Signs derive
    * from the MID bits of a portable LCG on (k·64+j) (the low bit of
    * an LCG alternates — the classic trap), so unlike the murmur3 LSH
    * hyperplanes this is expressible in both engines and ORACLE-backed:
    * every projected coordinate is a left-to-right fold both engines
    * replay bit-for-bit. The emitted `norm_ratio` = ‖y‖²/‖x‖² is the
    * JL distortion itself — E[ratio] = 1 by construction.
    *
    * Scale: pure per-row expression (zero shuffles); the projection
    * matrix is program text, never materialized. */
  def randomProjection(spark: SparkSession, dir: String): DataFrame = {
    val kDims = 8
    def proj(k: Int): Column =
      VectorFunctions.rademacherDot(col("embedding"), k) / math.sqrt(kDims.toDouble)
    val x2 = expr(
      "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
    // materialize each 64-element fold ONCE (codegen does not CSE
    // repeated lambda-aggregates — naive reuse costs 3× the folds),
    // then derive the rounded outputs and norm_ratio from the columns
    val raw = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 50)
      .select(col("vec_id") +: col("label") +: x2.as("x2") +:
        (0 until kDims).map(k => proj(k).as(s"yr$k")): _*)
    val y2 = (0 until kDims).map(k => col(s"yr$k") * col(s"yr$k")).reduce(_ + _)
    val cols = col("vec_id") +: col("label") +:
      (0 until kDims).map(k => r6(col(s"yr$k")).as(s"y$k")) :+
      r4(y2 / col("x2")).as("norm_ratio")
    raw.select(cols: _*).orderBy("vec_id")
  }

  private val randomProjectionOracle = {
    val kDims = 8
    def proj(k: Int) =
      s"""(list_sum(list_transform(generate_series(0, len(embedding) - 1),
         |  j -> CAST(embedding[j + 1] AS DOUBLE) *
         |    (CASE WHEN ((CAST(1103515245 AS BIGINT) * CAST($k * 64 + j AS BIGINT) + 12345) // 1024) % 2 = 0
         |     THEN 1.0 ELSE -1.0 END))) / sqrt(${kDims}.0))""".stripMargin
    val x2 = "list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    val rawCols = (0 until kDims).map(k => s"${proj(k)} AS yr$k").mkString(",\n  ")
    val y2 = (0 until kDims).map(k => s"(yr$k * yr$k)")
      .reduce((a, b) => s"($a + $b)")
    val yCols = (0 until kDims).map(k => s"${rSql(s"yr$k", 6)} AS y$k").mkString(",\n  ")
    s"""WITH raw AS (
       |  SELECT vec_id, label, $x2 AS x2,
       |  $rawCols
       |  FROM embeddings WHERE vec_id < 50)
       |SELECT vec_id, label,
       |  $yCols,
       |  ${rSql(s"($y2 / x2)", 4)} AS norm_ratio
       |FROM raw ORDER BY vec_id""".stripMargin
  }

  /** Per-label embedding centroids + cluster cohesion — the
    * class-prototype pass behind centroid classifiers, cluster quality
    * monitoring, and IVF coarse-quantizer seeding: element-wise mean
    * vector per label, its norm, and the mean cosine of members to
    * their own centroid.
    *
    * Determinism: each float element is widened to double and
    * r6-rounded, component sums run in DECIMAL (order-invariant),
    * centroid components re-round — so the centroid lives on the 1e-6
    * grid and every later fold (norm, dot) is a fixed-order double
    * chain both engines replay exactly; member cosines r6-round before
    * the decimal cohesion mean.
    *
    * Scale: one posexplode shuffle to |labels|·dims component rows,
    * centroids re-assembled with sort_array(collect_list) on the TINY
    * (labels × dims) frame and broadcast back — the member pass is
    * scan-local. No driver state.
    */
  def embedCentroids(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val d = DecimalType(28, 6)
    val emb = Tables.embeddings(spark, dir)
    val comp = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(r6(col("v").cast(DoubleType)).cast(d)).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        r6(col("s").cast(DoubleType) / col("n")).as("m"))
    val cent = comp.groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("carr"))
      .withColumn("c_nrm", expr(
        "sqrt(aggregate(carr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"))
    val cos = expr(
      """(aggregate(zip_with(embedding, carr, (x, y) -> CAST(x AS DOUBLE) * y),
        |  CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) / (v_nrm * c_nrm))""".stripMargin)
    emb.withColumn("v_nrm", VectorFunctions.norm(col("embedding")))
      .join(broadcast(cent), "label")
      .select(col("label"), col("c_nrm"), r6(cos).as("cos"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        r6(max("c_nrm")).as("centroid_norm"),
        r4(sum(col("cos").cast(d)).cast(DoubleType) / count(lit(1))).as("cohesion"))
      .orderBy("label")
  }

  private val embedCentroidsOracle = {
    val vExpr = "CAST(embedding[i] AS DOUBLE)"
    val dot = "list_sum(list_transform(list_zip(embedding, carr), x -> CAST(x[1] AS DOUBLE) * x[2]))"
    s"""WITH comp AS (
       |  SELECT label, u.pos,
       |    ${rSql("(CAST(SUM(CAST(u.rv AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 6)} AS m
       |  FROM embeddings,
       |    LATERAL (SELECT unnest(list_transform(generate_series(1, len(embedding)),
       |      i -> {'pos': i - 1, 'rv': ${rSql(vExpr, 6)}})) AS u)
       |  GROUP BY label, u.pos),
       |cent AS (
       |  SELECT label, list(m ORDER BY pos) AS carr FROM comp GROUP BY label),
       |cent2 AS (
       |  SELECT label, carr,
       |    sqrt(list_sum(list_transform(carr, x -> x * x))) AS c_nrm
       |  FROM cent),
       |scored AS (
       |  SELECT e.label, c.c_nrm,
       |    ${rSql(
            s"($dot / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * c_nrm))",
            6)} AS cos
       |  FROM embeddings e JOIN cent2 c ON e.label = c.label)
       |SELECT label, COUNT(*) AS n_vecs,
       |  ${rSql("MAX(c_nrm)", 6)} AS centroid_norm,
       |  ${rSql("(CAST(SUM(CAST(cos AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 4)} AS cohesion
       |FROM scored GROUP BY label ORDER BY label""".stripMargin
  }

  // ----------------------------------------------------- Product quantization

  /** Train a product-quantization codebook: the 64-dim space splits
    * into M=8 subspaces of 8 dims; each subspace gets K=4 centroids —
    * deterministic init (subvectors of the first K vectors) + one Lloyd
    * round under squared-L2. Re-estimation follows the trainIvf
    * discipline: elements r6-widened, DECIMAL-summed (accumulation-
    * order invariant), divided once in double, re-rounded — so the
    * codebook lives on the 1e-6 grid and the DuckDB oracle replays
    * training as a CTE chain. Driver state is M·K·8 = 256 doubles. */
  def trainPq(emb: DataFrame, M: Int, dsub: Int, K: Int,
      init0: Option[Array[Seq[Double]]] = None): Array[Array[Array[Double]]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    import graft.functions.Compat.r6
    val dec = DecimalType(28, 6)
    val first = init0.getOrElse(firstVectors(emb, K).map(_._2))
    require(first.length >= K,
      s"trainPq: init needs the $K vectors with vec_id < $K (dense ids " +
        s"from 0); got ${first.length}")
    val init: Array[Array[Array[Double]]] =
      Array.tabulate(M, K)((s, j) => first(j).slice(s * dsub, (s + 1) * dsub).toArray)
    // assignment round 0: argmin squared-L2 per (vector, subspace);
    // array_position picks the FIRST minimum = lowest cluster index,
    // matching the oracle's ROW_NUMBER (dist, cl) tie-break
    var a0 = emb
    (0 until M).foreach { s =>
      val dists = array((0 until K).map(j => VectorFunctions.sqDistFd(
        slice(col("embedding"), s * dsub + 1, dsub), typedLit(init(s)(j).toSeq))): _*)
      a0 = a0.withColumn(s"pqd$s", dists)
        .withColumn(s"pqc$s", expr(s"array_position(pqd$s, array_min(pqd$s))").cast("int") - 1)
    }
    val means = a0
      .withColumn("codes0", array((0 until M).map(s => col(s"pqc$s")): _*))
      .select(col("codes0"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("s", expr(s"CAST(dim div $dsub AS INT)"))
      .withColumn("sd", (col("dim") % dsub).cast("int"))
      .withColumn("cl", element_at(col("codes0"), col("s") + 1))
      .groupBy("s", "cl", "sd")
      .agg(r6(sum(r6(col("v").cast(DoubleType)).cast(dec)).cast(DoubleType) /
        count(lit(1))).as("m"))
      .collect()
    val next = init.map(_.map(_.clone()))
    means.foreach { r =>
      next(r.getAs[Int]("s"))(r.getAs[Int]("cl"))(r.getAs[Int]("sd")) = r.getAs[Double]("m")
    }
    next
  }

  /** PQ-compressed ANN with asymmetric distance computation (Jégou et
    * al. 2011, "Product quantization for nearest neighbor search"):
    * every vector is encoded as M=8 one-byte codes (its nearest
    * centroid per subspace), and a query scores a candidate by summing
    * 8 LOOKUPS into its per-subspace distance table instead of 64
    * multiply-adds against raw floats.
    *
    * This is the memory side of the 100 TB ANN story (q_ann_ivf is the
    * scan side): 64 float32 dims = 256 B/vector compress to 8 B of
    * codes (32×), which is what lets a billion-vector index live in
    * RAM; IVF+PQ composed is the standard FAISS serving layout. At
    * scale the codebook trains on a sample, encoding is a scan-local
    * expression against the broadcast codebook, and only the 8-byte
    * codes ever shuffle.
    *
    * Determinism: squared-L2 folds are subtract/multiply/add only (no
    * transcendentals — bit-identical cross-engine), LUT entries are
    * r6-rounded, and the ADC sum folds the 8 grid values in fixed
    * subspace order in both engines. Oracle replays init → assign →
    * re-estimate → encode → LUT → ADC → rank as one CTE chain. */
  /** Composed IVF-PQ ANN — the standard FAISS serving layout (Jégou et
    * al. 2011; Johnson et al. 2017 "Billion-scale similarity search
    * with GPUs"): coarse IVF pruning picks nprobe=2 of the k=8
    * clusters per query (the SCAN side: touch nprobe/k of the data)
    * and PQ/ADC scores only the candidates inside the probed clusters
    * (the RAM side: 8-byte codes instead of 256-byte vectors). Both
    * training kernels are reused verbatim ([[trainIvf]], [[trainPq]]),
    * so the oracle composes the SAME c0→c2 Lloyd chain and the SAME
    * cb0→cb1→codes/lut PQ chain the two standalone operators verify
    * against, joined through the probe list.
    *
    * Scale: assignment + encoding are scan-local broadcast-codebook
    * expressions computed at ingest; a query reads nprobe/k of the
    * code table and sums 8 LUT lookups per candidate; the per-query
    * top-3 window runs over one cluster-bounded candidate set. The
    * recall floor is spec-pinned: every planted exact twin is
    * retrieved (Round7Spec), which also bounds it from below by the
    * full-scan PQ path on those queries. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame =
    ivfPqSearch(Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      col("vec_id") < 10)

  /** Train → persist artifacts → reload → serve: the full index
    * lifecycle as one driver-visible query (the bpeEncodeWith pattern
    * applied to ANN). The serve half runs zero Lloyd jobs — it reads
    * k + M·K artifact rows and searches — so its result must equal the
    * composed q_ann_ivfpq ranking bit-for-bit (same oracle). */
  def annServe(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val first8 = firstVectors(emb, 8)
    val trained = trainBoth(emb, first8)
    val stage = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ann_index_${java.util.UUID.randomUUID().toString.take(8)}")
    // cleanup registered BEFORE the write: a mid-write throw must not
    // leak the staging dir (the Maintenance.compactFiles ordering)
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(stage))
    writeIvfPqIndex(spark, stage.getAbsolutePath, trained)
    ivfPqSearchWith(
      readIvfPqIndex(spark, stage.getAbsolutePath), emb, col("vec_id") < 10)
  }

  /** The composed search, parameterized by the query predicate so the
    * recall spec can search planted twins over a seeded corpus. Trains
    * both quantizers inline (the correctness-gate shape); the
    * train-once/serve-many path is [[ivfPqSearchWith]]. */
  private[graft] def ivfPqSearch(emb: DataFrame, isQuery: Column): DataFrame = {
    // one init job covers both trainers: IVF inits on vec_id < 8, PQ on
    // vec_id < 4 — sliced BY ID, so sparse/offset id spaces still match
    // the oracle's `vec_id < k` init CTEs exactly
    val first8 = firstVectors(emb, 8)
    ivfPqSearchWith(trainBoth(emb, first8), emb, isQuery)
  }

  /** Train the coarse and fine quantizers CONCURRENTLY (guide §2.6 —
    * overlap independent jobs): the two trainers share only the init
    * rows, and each is a chain of tiny, job-latency-bound aggregations,
    * so running PQ's single Lloyd round on a second driver thread hides
    * its round-trips behind IVF's two. Results are the trainers' own —
    * scheduling overlap cannot change a decimal-exact aggregation. */
  private def trainBoth(emb: DataFrame,
      first8: Array[(Long, Seq[Double])]): IvfPqIndex = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val pqF = Future(trainPq(emb, M = 8, dsub = 8, K = 4,
      Some(first8.filter(_._1 < 4).map(_._2))))
    // if IVF throws, still await the PQ future (bounded) so its Spark
    // jobs can't keep running detached behind the propagated failure —
    // and a PQ failure surfaces as soon as IVF is done either way
    val ivf =
      try trainIvf(emb, k = 8, iters = 2, Some(first8.map(_._2)))
      catch { case t: Throwable =>
        try Await.ready(pqF, scala.concurrent.duration.Duration(120, "s"))
        catch { case _: Throwable => () }
        throw t
      }
    IvfPqIndex(ivf, Await.result(pqF, Duration.Inf))
  }

  /** Trained IVF-PQ serving artifacts: `centroids(cluster)` is the
    * coarse quantizer (cosine IVF), `codebook(s)(cl)` the fine product
    * quantizer (squared-L2, M subspaces × K centers). Persist with
    * [[writeIvfPqIndex]]; total size is k·d + M·K·dsub doubles —
    * dimension-bounded, broadcast as plan literals at serve time. */
  final case class IvfPqIndex(centroids: Array[Seq[Double]],
      codebook: Array[Array[Array[Double]]])

  /** Persist a trained index as two parquet tables (`ivf_centroids`,
    * `pq_codebook`) under `path` — the artifact layout a 100 TB
    * deployment trains once (on a sample) and every ingest/serve job
    * reads back. Doubles round-trip parquet bit-exactly, so a reloaded
    * index serves the identical ranking (Round8Spec pins this). */
  def writeIvfPqIndex(spark: SparkSession, path: String, index: IvfPqIndex): Unit = {
    import spark.implicits._
    graft.sources.Sources.writeTruncate(
      index.centroids.zipWithIndex.toSeq
        .map { case (c, i) => (i, c) }.toDF("cluster", "centroid"),
      s"$path/ivf_centroids")
    graft.sources.Sources.writeTruncate(
      (for {
        s <- index.codebook.indices
        cl <- index.codebook(s).indices
      } yield (s, cl, index.codebook(s)(cl).toSeq)).toDF("s", "cl", "center"),
      s"$path/pq_codebook")
  }

  /** Load [[writeIvfPqIndex]] artifacts back into driver arrays —
    * k + M·K rows total, dimension-bounded by construction. */
  def readIvfPqIndex(spark: SparkSession, path: String): IvfPqIndex = {
    val cents = spark.read.parquet(s"$path/ivf_centroids")
      .orderBy("cluster").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")))
    val cbRows = spark.read.parquet(s"$path/pq_codebook")
      .orderBy("s", "cl").collect()
      .map(r => (r.getInt(r.fieldIndex("s")), r.getInt(r.fieldIndex("cl")),
        r.getSeq[Double](r.fieldIndex("center")).toArray))
    val m = cbRows.map(_._1).max + 1
    val k = cbRows.map(_._2).max + 1
    val cb = Array.ofDim[Array[Double]](m, k)
    cbRows.foreach { case (s, cl, c) => cb(s)(cl) = c }
    IvfPqIndex(cents, cb)
  }

  /** SERVE path: search with pre-trained artifacts — zero training jobs
    * (Round8Spec audits that building this plan launches no Spark job;
    * every artifact lands as broadcast literals in scan-local
    * expressions). At 100 TB the assignment+encode projection runs once
    * at ingest and persists; here it's part of the query so the gate
    * exercises the full path. */
  def ivfPqSearchWith(index: IvfPqIndex, emb: DataFrame, isQuery: Column): DataFrame = {
    require(index.centroids.nonEmpty, "ivfPqSearchWith: empty IVF centroid table")
    require(index.codebook.nonEmpty && index.codebook.forall(s =>
      s.nonEmpty && s.forall(c => c.length == index.codebook.head.head.length)),
      "ivfPqSearchWith: ragged or empty PQ codebook")
    adcTopK(
      probeLut(index, emb.filter(isQuery)),
      pqEncode(index.codebook,
        assignCluster(index.centroids, emb).drop("dots")),
      index.codebook.length)
  }

  /** Coarse-assign every vector to its IVF cell: adds `dots` (cosine to
    * each centroid — scan-local literal expressions, no join) and
    * `cluster` (the argmax). */
  private def assignCluster(centroids: Array[Seq[Double]], emb: DataFrame): DataFrame = {
    val cCols = centroids.map(c =>
      VectorFunctions.dotFd(col("embedding"), typedLit(c)) /
        (VectorFunctions.norm(col("embedding")) * typedLit(l2(c))))
    emb.withColumn("dots", array(cCols: _*))
      .withColumn("cluster",
        expr("array_position(dots, array_max(dots))").cast("int") - 1)
  }

  /** Fine-encode an assigned frame with the PQ codebook — the ingest
    * projection (vec_id, cluster, codes): M scan-local argmins, nothing
    * wider than M bytes of code per vector leaves the scan. */
  private def pqEncode(cb: Array[Array[Array[Double]]], assigned: DataFrame): DataFrame = {
    val M = cb.length; val K = cb.head.length; val dsub = cb.head.head.length
    var enc = assigned
    (0 until M).foreach { s =>
      val dists = array((0 until K).map(j => VectorFunctions.sqDistFd(
        slice(col("embedding"), s * dsub + 1, dsub), typedLit(cb(s)(j).toSeq))): _*)
      enc = enc.withColumn(s"pqd$s", dists)
        .withColumn(s"pqc$s", expr(s"array_position(pqd$s, array_min(pqd$s))").cast("int") - 1)
    }
    enc.withColumn("codes", array((0 until M).map(s => col(s"pqc$s")): _*))
      .select("vec_id", "cluster", "codes")
  }

  /** Query-side coarse probe (2 nearest clusters) + per-query ADC
    * lookup table, exploded to one (q_id, lut, cluster) row per probed
    * cell — the broadcast side of every IVF-PQ search. */
  private def probeLut(index: IvfPqIndex, queries: DataFrame): DataFrame = {
    import graft.functions.Compat.r6
    val cb = index.codebook
    val M = cb.length; val K = cb.head.length; val dsub = cb.head.head.length
    assignCluster(index.centroids, queries)
      .withColumn("probe", expr(
        "slice(array_sort(arrays_zip(dots, sequence(0, size(dots) - 1)), (a, b) -> CASE WHEN a.dots > b.dots THEN -1 WHEN a.dots < b.dots THEN 1 WHEN a.`1` < b.`1` THEN -1 ELSE 1 END), 1, 2).`1`"))
      .withColumn("lut", array((0 until M).map(s => array((0 until K).map(j =>
        r6(VectorFunctions.sqDistFd(
          slice(col("embedding"), s * dsub + 1, dsub), typedLit(cb(s)(j).toSeq)))): _*)): _*))
      .select(col("vec_id").as("q_id"), col("lut"), explode(col("probe")).as("cluster"))
  }

  /** Ingest-side encode with trained artifacts: (vec_id, cluster,
    * codes) — the projection every new embedding batch runs ONCE, after
    * which searches never touch the raw vectors again. */
  def encodeWith(index: IvfPqIndex, emb: DataFrame): DataFrame =
    pqEncode(index.codebook, assignCluster(index.centroids, emb).drop("dots"))

  /** Persist the PQ-coded corpus under the index dir, PARTITIONED BY
    * IVF cluster — the ANN twin of [[graft.operators.Dedup.writeMinhashIndex]]'s
    * accumulated-corpus artifact. At 100 TB this layout is the whole
    * point: the coarse probe becomes DIRECTORY-level partition pruning
    * (a 2-of-k probe reads 2/k of the files), and each row is an id +
    * M code bytes — orders of magnitude smaller than the raw
    * embeddings, which a search never re-reads. */
  def writeCodedCorpus(spark: SparkSession, path: String, index: IvfPqIndex,
      emb: DataFrame): Unit =
    graft.sources.Sources.writePartitioned(
      encodeWith(index, emb), s"$path/coded", Seq("cluster"))

  /** Append a new embedding batch to a [[writeCodedCorpus]] corpus —
    * the daily increment: encode with the FROZEN artifacts (an index
    * never retrains inside ingest; retraining is a rebuild), append
    * O(batch) coded rows into the per-cluster directories. CONTRACT:
    * each vec_id is appended at most once (a re-appended id would rank
    * twice in later searches). One parquet append = one all-or-nothing
    * job commit, so there is no multi-table partial state to repair
    * here, unlike the minhash index's two tables. */
  def appendCodedCorpus(spark: SparkSession, path: String, index: IvfPqIndex,
      emb: DataFrame): Unit =
    encodeWith(index, emb).write.mode("append")
      .partitionBy("cluster").parquet(s"$path/coded")

  /** SERVE path against the persisted coded corpus: artifacts load as
    * k + M·K driver rows, the probe side broadcasts, and the only big
    * input is the coded table scan — pruned to the probed clusters via
    * the partition column. The corpus embeddings are structurally
    * unavailable (not an argument), so nothing can re-encode or
    * re-scan them; Round9Spec audits that every file scan in the plan
    * reads index artifacts only. */
  def searchCoded(spark: SparkSession, path: String, queries: DataFrame): DataFrame = {
    val index = readIvfPqIndex(spark, path)
    adcTopK(probeLut(index, queries),
      spark.read.parquet(s"$path/coded"), index.codebook.length)
  }

  /** ADC scoring + per-query top-3: broadcast the (tiny) probe side,
    * join coded candidates within probed cells only, sum M LUT lookups
    * per candidate, bounded rank window per query. */
  private def adcTopK(queries: DataFrame, coded: DataFrame, M: Int): DataFrame = {
    import graft.functions.Compat.r6
    val scored = broadcast(queries)
      .join(coded, Seq("cluster"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc", r6(expr(
        s"""aggregate(sequence(0, ${M - 1}), CAST(0.0 AS DOUBLE),
           |  (acc, s) -> acc + element_at(element_at(lut, s + 1), element_at(codes, s + 1) + 1))""".stripMargin)))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "vec_id", "adc")
      .orderBy("q_id", "rk")
  }

  /** IVF index health: per-cell population and cohesion — the ANN twin
    * of [[graft.operators.Dedup.indexStats]]. Cell balance is what the
    * coded-corpus layout's cost model assumes: a 2-of-k probe reads 2/k
    * of a 100 TB corpus only while cells stay near-uniform, so a
    * population skew here is the signal to re-train or re-balance
    * BEFORE the daily probe join degrades. `mean_cos`/`min_cos` (each
    * member's cosine to its own centroid, decimal-exact mean over
    * r6-rounded values) expose drift: a cell whose cohesion decays is
    * absorbing vectors its centroid no longer represents. Runs on the
    * assignment alone — scan-local literal expressions + ONE hash
    * aggregation, no joins. */
  def annStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Compat.r6
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val centroids = trainIvf(emb, k = 8, iters = 2)
    val assigned = assignCluster(centroids, emb)
      .withColumn("own_cos", r6(element_at(col("dots"), col("cluster") + 1)))
    assigned.groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        r6(sum(col("own_cos").cast("decimal(28,6)")).cast("double") /
          count(lit(1))).as("mean_cos"),
        min("own_cos").as("min_cos"))
      .orderBy("cluster")
  }

  private val annStatsOracle =
    s"""WITH $ivfChainCtes,
       |assigned_cos AS (
       |  SELECT vec_id, cluster, cos FROM (
       |    SELECT vec_id, cluster, cos,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rn
       |    FROM final_sc) WHERE rn = 1)
       |SELECT cluster, COUNT(*) AS n_vecs,
       |  ${rSql("(CAST(SUM(CAST(" + rSql("cos", 6) + " AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 6)} AS mean_cos,
       |  MIN(${rSql("cos", 6)}) AS min_cos
       |FROM assigned_cos GROUP BY cluster ORDER BY cluster""".stripMargin

  def annPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Compat.r6
    val M = 8; val dsub = 8; val K = 4
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val cb = trainPq(emb, M, dsub, K)
    var enc = emb
    (0 until M).foreach { s =>
      val dists = array((0 until K).map(j => VectorFunctions.sqDistFd(
        slice(col("embedding"), s * dsub + 1, dsub), typedLit(cb(s)(j).toSeq))): _*)
      enc = enc.withColumn(s"pqd$s", dists)
        .withColumn(s"pqc$s", expr(s"array_position(pqd$s, array_min(pqd$s))").cast("int") - 1)
    }
    val coded = enc
      .withColumn("codes", array((0 until M).map(s => col(s"pqc$s")): _*))
      .select("vec_id", "codes")
    val qlut = emb.filter(col("vec_id") < 10)
      .withColumn("lut", array((0 until M).map(s => array((0 until K).map(j =>
        r6(VectorFunctions.sqDistFd(
          slice(col("embedding"), s * dsub + 1, dsub), typedLit(cb(s)(j).toSeq)))): _*)): _*))
      .select(col("vec_id").as("q_id"), col("lut"))
    val scored = broadcast(qlut).join(coded, col("q_id") =!= col("vec_id"))
      .withColumn("adc", r6(expr(
        s"""aggregate(sequence(0, ${M - 1}), CAST(0.0 AS DOUBLE),
           |  (acc, s) -> acc + element_at(element_at(lut, s + 1), element_at(codes, s + 1) + 1))""".stripMargin)))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("q_id", "rk", "vec_id", "adc")
      .orderBy("q_id", "rk")
  }

  /** The shared PQ oracle chain (subspace split → codebook init → one
    * re-estimation round → codes + query LUTs) — composed by
    * annPqOracle and the IVF-PQ oracle so the fine quantizer can never
    * diverge between them. */
  private lazy val pqChainCtes: String = {
    val sq = (z: String) => s"list_sum(list_transform($z, pz -> (pz[1] - pz[2]) * (pz[1] - pz[2])))"
    s"""subsp AS (SELECT unnest(generate_series(0, 7)) AS s),
       |sub AS (
       |  SELECT e.vec_id, subsp.s,
       |    list_transform(list_slice(e.embedding, subsp.s * 8 + 1, subsp.s * 8 + 8),
       |      sx -> CAST(sx AS DOUBLE)) AS v
       |  FROM embeddings e CROSS JOIN subsp),
       |cb0 AS (SELECT s, CAST(vec_id AS INT) AS cl, v AS c FROM sub WHERE vec_id < 4),
       |d0 AS (
       |  SELECT sub.vec_id, sub.s, cb0.cl, ${sq("list_zip(sub.v, cb0.c)")} AS dist
       |  FROM sub JOIN cb0 ON sub.s = cb0.s),
       |a0 AS (
       |  SELECT vec_id, s, cl FROM (
       |    SELECT vec_id, s, cl,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, cl) AS rn
       |    FROM d0) WHERE rn = 1),
       |pqmean1 AS (
       |  SELECT a0.s, a0.cl, u.sd,
       |    ${rSql("(CAST(SUM(CAST(" + rSql("u.rv", 6) + " AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 6)} AS m
       |  FROM a0 JOIN sub ON a0.vec_id = sub.vec_id AND a0.s = sub.s,
       |    LATERAL (SELECT unnest(list_transform(generate_series(1, len(sub.v)),
       |      mi -> {'sd': mi - 1, 'rv': sub.v[mi]})) AS u)
       |  GROUP BY a0.s, a0.cl, u.sd),
       |cb1 AS (
       |  SELECT od.s, od.cl, list(COALESCE(pqmean1.m, od.ov) ORDER BY od.sd) AS c
       |  FROM (
       |    SELECT cb0.s, cb0.cl, u.sd, u.ov FROM cb0,
       |      LATERAL (SELECT unnest(list_transform(generate_series(1, len(cb0.c)),
       |        oi -> {'sd': oi - 1, 'ov': cb0.c[oi]})) AS u)) od
       |  LEFT JOIN pqmean1 ON od.s = pqmean1.s AND od.cl = pqmean1.cl AND od.sd = pqmean1.sd
       |  GROUP BY od.s, od.cl),
       |d1 AS (
       |  SELECT sub.vec_id, sub.s, cb1.cl, ${sq("list_zip(sub.v, cb1.c)")} AS dist
       |  FROM sub JOIN cb1 ON sub.s = cb1.s),
       |codes AS (
       |  SELECT vec_id, s, cl FROM (
       |    SELECT vec_id, s, cl,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, cl) AS rn
       |    FROM d1) WHERE rn = 1),
       |lut AS (
       |  SELECT vec_id AS q_id, s, cl, ${rSql("dist", 6)} AS lv FROM d1 WHERE vec_id < 10)""".stripMargin
  }

  private val annPqOracle =
    s"""WITH $pqChainCtes,
       |padc AS (
       |  SELECT l.q_id, c.vec_id, list_sum(list(l.lv ORDER BY l.s)) AS raw
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.cl = c.cl AND c.vec_id <> l.q_id
       |  GROUP BY l.q_id, c.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, ${rSql("raw", 6)} AS adc,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ${rSql("raw", 6)} ASC, vec_id) AS rk
       |  FROM padc)
       |SELECT q_id, rk, vec_id, adc FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  /** IVF-PQ composed oracle: the SAME coarse chain (probe list) and
    * fine chain (codes/LUTs), joined — candidates come from the probed
    * clusters only, scores from ADC. */
  private val annIvfPqOracle =
    s"""WITH $ivfChainCtes,
       |$pqChainCtes,
       |cand AS (
       |  SELECT q.q_id, e.vec_id
       |  FROM probes q JOIN assigned e
       |    ON q.cluster = e.cluster AND e.vec_id <> q.q_id),
       |padc AS (
       |  SELECT cand.q_id, cand.vec_id, list_sum(list(l.lv ORDER BY l.s)) AS raw
       |  FROM cand
       |  JOIN codes c ON c.vec_id = cand.vec_id
       |  JOIN lut l ON l.q_id = cand.q_id AND l.s = c.s AND l.cl = c.cl
       |  GROUP BY cand.q_id, cand.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, ${rSql("raw", 6)} AS adc,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ${rSql("raw", 6)} ASC, vec_id) AS rk
       |  FROM padc)
       |SELECT q_id, rk, vec_id, adc FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  // ----------------------------------------------------------- SemDeDup

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with k-means, then
    * look for near-duplicate pairs ONLY within each cluster — the
    * published trick that turns the quadratic all-pairs cosine search
    * into Σ|cluster|², tractable because k grows with the corpus. A
    * member is dropped when it has cosine ≥ 0.95 with any lower-id
    * member of its own cluster (greedy keep-first, deterministic).
    *
    * Training reuses [[trainIvf]] verbatim (decimal-grid Lloyd, k=8,
    * 2 iterations) so the oracle reuses the SAME c0→c1→c2 CTE chain as
    * q_ann_ivf — one clustering kernel, two operators. Random vectors
    * have no natural semantic dups, so (q_dedup_embed pattern) every
    * 10th vector is planted back re-keyed: the operator must find
    * exactly those unless random collisions exceed the threshold.
    *
    * Scale: assignment is a scan-local broadcast-centroid expression;
    * the pair join is hash-partitioned on cluster with both sides
    * |n/k|, never all-pairs; output is k summary rows. At 100 TB the
    * same plan holds with k raised to keep |cluster| bounded (the
    * paper's regime) — no step grows super-linearly. */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val emb = base.unionAll(base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    val centroids = trainIvf(base, k = 8, iters = 2)
    val cCols = centroids.map(c =>
      VectorFunctions.dotFd(col("embedding"), typedLit(c)) /
        (VectorFunctions.norm(col("embedding")) * typedLit(l2(c))))
    val assigned = emb.withColumn("dots", array(cCols: _*))
      .withColumn("cluster",
        expr("array_position(dots, array_max(dots))").cast("int") - 1)
      .withColumn("nrm", VectorFunctions.norm(col("embedding")))
      .drop("dots")
    val pairs = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", r6(VectorFunctions.cosine(
        col("a.embedding"), col("b.embedding"), col("a.nrm"), col("b.nrm"))))
      .filter(col("cos") >= 0.95)
      .select(col("a.cluster").as("cluster"), col("b.vec_id").as("dup_id"))
    val dupPairs = pairs.groupBy("cluster").agg(count(lit(1)).as("n_dup_pairs"))
    val dropped = pairs.distinct()
      .groupBy("cluster").agg(count(lit(1)).as("n_dropped"))
    assigned.groupBy("cluster").agg(count(lit(1)).as("n_members"))
      .join(dupPairs, Seq("cluster"), "left")
      .join(dropped, Seq("cluster"), "left")
      .select(col("cluster"), col("n_members"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .orderBy("cluster")
  }

  private val semDedupOracle = {
    val cos = "(list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
      "cz -> CAST(cz[1] AS DOUBLE) * CAST(cz[2] AS DOUBLE))) / (a.nrm * b.nrm))"
    s"""WITH c0 AS (
       |  SELECT vec_id AS cluster, list_transform(embedding, cx -> CAST(cx AS DOUBLE)) AS c
       |  FROM embeddings WHERE vec_id < 8),
       |${lloydCtes(1, "c0", "c1")},
       |${lloydCtes(2, "c1", "c2")},
       |emb2 AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
       |final_sc AS (
       |  SELECT e.vec_id, e.embedding, cp.cluster,
       |    (list_sum(list_transform(list_zip(e.embedding, cp.c), lz -> CAST(lz[1] AS DOUBLE) * lz[2]))
       |      / (sqrt(list_sum(list_transform(e.embedding, nx -> CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(cp.c, nx -> nx * nx))))) AS cos
       |  FROM emb2 e CROSS JOIN c2 cp),
       |assigned AS (
       |  SELECT vec_id, embedding, cluster,
       |    sqrt(list_sum(list_transform(embedding, nx -> CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE)))) AS nrm
       |  FROM (
       |    SELECT vec_id, embedding, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) AS rn
       |    FROM final_sc) WHERE rn = 1),
       |pairs AS (
       |  SELECT a.cluster, b.vec_id AS dup_id
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${rSql(cos, 6)} >= 0.95),
       |dup_pairs AS (SELECT cluster, COUNT(*) AS n_dup_pairs FROM pairs GROUP BY cluster),
       |dropped AS (
       |  SELECT cluster, COUNT(*) AS n_dropped
       |  FROM (SELECT DISTINCT cluster, dup_id FROM pairs) GROUP BY cluster)
       |SELECT m.cluster, m.n_members,
       |  COALESCE(dup_pairs.n_dup_pairs, 0) AS n_dup_pairs,
       |  COALESCE(dropped.n_dropped, 0) AS n_dropped
       |FROM (SELECT cluster, COUNT(*) AS n_members FROM assigned GROUP BY cluster) m
       |LEFT JOIN dup_pairs ON m.cluster = dup_pairs.cluster
       |LEFT JOIN dropped ON m.cluster = dropped.cluster
       |ORDER BY m.cluster""".stripMargin
  }

  /** The coded-corpus lifecycle as one driver-visible query: train →
    * persist artifacts → ingest the corpus in two batches (an initial
    * load plus a next-day [[appendCodedCorpus]] increment, exercising
    * the daily loop) → [[searchCoded]] over the persisted codes alone.
    * Encoding with frozen artifacts is deterministic, so the result is
    * bit-identical to the composed q_ann_ivfpq / q_ann_serve ranking —
    * same oracle. */
  def annCoded(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val first8 = firstVectors(emb, 8)
    val trained = trainBoth(emb, first8)
    val stage = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ann_coded_${java.util.UUID.randomUUID().toString.take(8)}")
    // cleanup registered BEFORE any write (the compactFiles ordering)
    graft.CacheScope.defer(() => graft.sources.Sources.deleteRecursively(stage))
    writeIvfPqIndex(spark, stage.getAbsolutePath, trained)
    val index = readIvfPqIndex(spark, stage.getAbsolutePath)
    writeCodedCorpus(spark, stage.getAbsolutePath, index,
      emb.filter(col("vec_id") % 2 === 0))
    appendCodedCorpus(spark, stage.getAbsolutePath, index,
      emb.filter(col("vec_id") % 2 === 1))
    searchCoded(spark, stage.getAbsolutePath, emb.filter(col("vec_id") < 10))
  }

  val ops: Seq[Op] = Seq(
    Op("q_knn_cosine", knnCosine, Some(knnCosineOracle), headline = true),
    Op("q_embed_centroids", embedCentroids, Some(embedCentroidsOracle)),
    Op("q_ann_lsh", annLsh, Some(annLshOracle)),
    Op("q_ann_ivf", annIvf, Some(annIvfOracle), headline = true),
    Op("q_ann_pq", annPq, Some(annPqOracle)),
    Op("q_ann_ivfpq", annIvfPq, Some(annIvfPqOracle), headline = true),
    Op("q_ann_serve", annServe, Some(annIvfPqOracle)),
    Op("q_ann_coded", annCoded, Some(annIvfPqOracle)),
    Op("q_ann_stats", annStats, Some(annStatsOracle)),
    Op("q_random_projection", randomProjection, Some(randomProjectionOracle)),
    Op("q_semdedup", semDedup, Some(semDedupOracle)),
  )
}
