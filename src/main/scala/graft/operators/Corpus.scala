package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Corpus-level operators for training-data curation (SURVEY.md §2
  * block C): retrieval scoring (BM25), n-gram language-model scoring
  * (the CCNet/Gopher-style "perplexity filter"), cross-document
  * repeated-substring detection (the suffix-array-dedup signal at
  * word-gram granularity), training-mix rebalancing (domain weights),
  * and a C4-style quality-rule funnel.
  *
  * Scale notes: every operator is explode → groupBy/join on corpus-
  * bounded keys (vocabulary, grams, domains). Nothing collects to the
  * driver; the only sub-linear sides (per-term document frequencies,
  * domain totals) are vocabulary- or domain-cardinality-sized and
  * broadcast. Determinism follows SURVEY §4: integer/decimal exact
  * until the final double division, `ln` applied per row then
  * half-away-from-zero rounded BEFORE any floating sum (sums of
  * rounded terms go through DECIMAL, so accumulation order never
  * matters).
  */
object Corpus {

  // ---------------------------------------------------------------- BM25

  private val bm25Terms = Seq("spark", "join", "vector", "stream")
  private val k1 = "1.2"
  private val b = "0.75"

  /** BM25 relevance of every document against a fixed query term set —
    * the retrieval-quality scoring pass of a data pipeline (e.g.
    * "select documents relevant to a target domain"). Robertson/
    * Sparck-Jones idf with the standard +1 stabilizer.
    *
    * Per-term tf comes from one conditional aggregation over the
    * exploded token table (no per-term scans); N, avgdl and per-term
    * document frequencies form a ONE-ROW frame cross-joined (broadcast)
    * into the per-doc side. Top-15 by rounded score — the rounding
    * makes the ordering engine-portable.
    */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = tfPerDoc(spark, dir)
    val statAggs = count(lit(1)).as("n_docs") +: sum("dl").as("sum_dl") +:
      bm25Terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    def contrib(t: String): Column = {
      val idf = expr(s"ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5))")
      val tf = col(s"tf_$t").cast(DoubleType)
      when(col(s"tf_$t") > 0,
        idf * tf * (lit(k1.toDouble) + 1.0) /
          (tf + lit(k1.toDouble) * (lit(1.0) - lit(b.toDouble) + lit(b.toDouble) * col("dl") / avgdl)))
        .otherwise(lit(0.0))
    }
    val score = bm25Terms.map(contrib).reduce(_ + _) // fixed left-to-right order
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), r4(score).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(15)
  }

  private val bm25Oracle = {
    val tfCols = bm25Terms.map(t =>
      s"COUNT(*) FILTER (WHERE word = '$t') AS tf_$t").mkString(",\n    ")
    val dfCols = bm25Terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n    ")
    val avgdl = "(CAST(sum_dl AS DOUBLE) / n_docs)"
    val score = bm25Terms.map { t =>
      val idf = s"ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5))"
      s"""(CASE WHEN tf_$t > 0 THEN $idf * CAST(tf_$t AS DOUBLE) * ($k1 + 1.0) /
         |      (CAST(tf_$t AS DOUBLE) + $k1 * (1.0 - $b + $b * dl / $avgdl)) ELSE 0.0 END)""".stripMargin
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS dl,
       |    $tfCols
       |  FROM toks GROUP BY doc_id),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
       |    $dfCols
       |  FROM perdoc)
       |SELECT doc_id, dl, ${rSql(s"($score)", 4)} AS bm25
       |FROM perdoc CROSS JOIN stats
       |WHERE ${rSql(s"($score)", 4)} > 0
       |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin
  }

  // ------------------------------------------------- retrieval evaluation

  /** Per-position DCG discounts 1/log₂(pos+1) for pos 1..10, emitted as
    * LITERAL text into both engines' plans (Double.toString is shortest
    * round-trip, so both parse the identical IEEE double) — no runtime
    * transcendental, no cross-engine ulp risk. */
  private val ndcgDiscounts: Seq[Double] =
    (1 to 10).map(pos => 1.0 / (math.log(pos + 1.0) / math.log(2.0)))

  /** nDCG@10 ranking evaluation per query term — the retrieval-quality
    * readout a curation pipeline runs over its search stack (hard-
    * negative mining, dedup-by-retrieval, eval-set construction all
    * rank documents; this grades the ranking). Candidates are docs
    * containing the term, the system ranking orders by normalized term
    * frequency tf/dl, and graded relevance is rel = min(tf, 3);
    * gain (2^rel−1)·disc(pos) with the standard log₂ discount.
    *
    * Scale: the per-term candidate list is selected through the native
    * TopKPerGroup plan (terms are LOW-cardinality — a per-term
    * row_number window would concentrate a near-global sort, the
    * q_weighted_sample lesson), so only 10·terms·partitions rows
    * shuffle; position assignment + DCG arithmetic run on the
    * ≤ 10·|terms| frame. Gains are r6-rounded then DECIMAL-summed;
    * (2^rel−1) ∈ {1,3,7} is an exact CASE, the discount an identical
    * literal in both engines. */
  /** The (doc, term, score, rel) frame BOTH retrieval-eval readouts
    * (q_ndcg, q_mrr) rank: per-doc tf for each query term, score =
    * r6(tf/dl), graded relevance rel = min(tf, 3) — one shared
    * construction so the two companions can never score differently. */
  private def termScored(spark: SparkSession, dir: String): DataFrame =
    tfPerDoc(spark, dir)
      .select(col("doc_id"), col("dl"), explode(array(bm25Terms.map(t =>
        struct(lit(t).as("term"), col(s"tf_$t").as("tf"))): _*)).as("s"))
      .select(col("doc_id"), col("dl"), col("s.term").as("term"), col("s.tf").as("tf"))
      .filter(col("tf") > 0)
      .withColumn("score", r6(col("tf") / col("dl")))
      .withColumn("rel", least(col("tf"), lit(3L)))

  /** The per-doc (dl, tf_<term>…) frame shared by the BM25 scorer AND
    * the retrieval-eval pair — ONE tokenization/tf construction, so
    * the scorer and the frame that q_ndcg/q_mrr grade it with can
    * never drift apart. */
  private def tfPerDoc(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tfAggs = count(lit(1)).as("dl") +:
      bm25Terms.map(t => sum(when(col("word") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    toks.groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)
  }

  /** Its DuckDB twin (toks/perdoc/scored CTE text), shared by the
    * ndcg and mrr oracles. */
  private lazy val termScoredSql: String = {
    val tfCols = bm25Terms.map(t =>
      s"COUNT(*) FILTER (WHERE word = '$t') AS tf_$t").mkString(",\n    ")
    val longf = bm25Terms.map(t =>
      s"SELECT doc_id, dl, '$t' AS term, tf_$t AS tf FROM perdoc WHERE tf_$t > 0")
      .mkString("\n  UNION ALL\n  ")
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS dl,
       |    $tfCols
       |  FROM toks GROUP BY doc_id),
       |scored AS (
       |  SELECT doc_id, term, ${rSql("(tf / dl)", 6)} AS score,
       |    LEAST(tf, 3) AS rel
       |  FROM ($longf))""".stripMargin
  }

  def ndcg(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val scored = termScored(spark, dir)
    val gainNum = "CASE rel WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 ELSE 7.0 END"
    def dcgOf(df: DataFrame, key: String, out: String): DataFrame = {
      val w = Window.partitionBy("term").orderBy(col(key).desc, col("doc_id"))
      graft.plans.TopK.topKPerGroup(df, Seq("term"), key, "doc_id", 10)
        .withColumn("pos", row_number().over(w))
        .withColumn("g", r6(expr(s"($gainNum)") *
          element_at(typedLit(ndcgDiscounts), col("pos"))))
        .groupBy("term")
        .agg(r4(sum(col("g").cast(dec)).cast(DoubleType)).as(out))
    }
    // TopK keys must be orderable columns: score for the system ranking,
    // rel (cast to double: TopKExec orders per-type) for the ideal one
    val sys = dcgOf(scored, "score", "dcg")
    val ideal = dcgOf(scored.withColumn("relkey", col("rel").cast(DoubleType)), "relkey", "idcg")
    scored.groupBy("term").agg(count(lit(1)).as("n_docs"))
      .join(sys, "term").join(ideal, "term")
      .withColumn("ndcg", r4(col("dcg") / col("idcg")))
      .select("term", "n_docs", "dcg", "idcg", "ndcg")
      .orderBy("term")
  }

  private val ndcgOracle = {
    val gainNum = "CASE rel WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 ELSE 7.0 END"
    val discArr = ndcgDiscounts.map(d => s"CAST($d AS DOUBLE)").mkString("[", ", ", "]")
    def dcgCte(orderKey: String, name: String, out: String) =
      s"""$name AS (
         |  SELECT term, ${rSql("(CAST(SUM(CAST(g AS DECIMAL(28,6))) AS DOUBLE))", 4)} AS $out
         |  FROM (
         |    SELECT term, ${rSql(s"(($gainNum) * ($discArr)[pos])", 6)} AS g
         |    FROM (
         |      SELECT term, rel,
         |        ROW_NUMBER() OVER (PARTITION BY term ORDER BY $orderKey DESC, doc_id) AS pos
         |      FROM scored)
         |    WHERE pos <= 10)
         |  GROUP BY term)""".stripMargin
    s"""WITH $termScoredSql,
       |${dcgCte("score", "sysdcg", "dcg")},
       |${dcgCte("rel", "idealdcg", "idcg")},
       |cand AS (SELECT term, COUNT(*) AS n_docs FROM scored GROUP BY term)
       |SELECT cand.term, n_docs, dcg, idcg, ${rSql("(dcg / idcg)", 4)} AS ndcg
       |FROM cand JOIN sysdcg ON cand.term = sysdcg.term
       |JOIN idealdcg ON cand.term = idealdcg.term
       |ORDER BY cand.term""".stripMargin
  }

  // ------------------------------------------------- bigram LM scoring

  /** Bigram language-model scoring — the distributed version of the
    * CCNet/Gopher "perplexity filter": train add-half-smoothed bigram
    * counts over the WHOLE corpus in one pass, then score a document
    * sample by average log-probability. Low (very negative) scores =
    * improbable word salad; high = in-distribution text.
    *
    * lp(w1,w2) = ln((c(w1,w2) + 0.5) / (c(w1) + 0.5·V)).
    *
    * Determinism: each bigram's lp is rounded to 6 decimals and summed
    * in DECIMAL, so the per-doc total is independent of accumulation
    * order; the final mean divides once in double.
    *
    * Scale: bigram/unigram count tables are vocabulary-bounded
    * (|V|², |V|) — they shuffle-join against the scored sample's
    * occurrence table; AQE broadcasts them when small. No driver
    * collection.
    */
  /** Bigram-LM scored-occurrence frame shared by q_ngram_lm and
    * q_ppl_filter: the additively-smoothed LM trains on the FULL
    * corpus (uni counts, vocabulary size, bigram counts), then the
    * `scoreFilter` docs get one r6 lp per bigram occurrence with
    * `carry` columns kept. ONE construction, so the sampled scorer
    * and the full corpus filter can never score the same LM
    * differently — the termScoredSql discipline. */
  private def bigramLmScored(spark: SparkSession, dir: String,
      carry: Seq[String], scoreFilter: Column): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(explode(split(col("text"), " ")).as("word"))
    val uni = toks.groupBy("word").agg(count(lit(1)).as("c1"))
      .withColumnRenamed("word", "w1")
    val vocab = toks.select(countDistinct(col("word")).as("v"))
    def bigrams(df: DataFrame): DataFrame = {
      val keep = ("doc_id" +: carry).map(col)
      df.select(keep :+ split(col("text"), " ").as("toks"): _*)
        .filter(size(col("toks")) >= 2)
        .select(keep :+ explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> named_struct('w1', toks[i-1], 'w2', toks[i]))"))
          .as("bg"): _*)
        .select(keep :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
    }
    val bi = bigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bigrams(docs.filter(scoreFilter))
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", r6(expr("ln((c2 + 0.5) / (c1 + 0.5 * v))")))
  }

  def ngramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmScored(spark, dir, Nil, col("doc_id") % 5 === 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"),
        r4(col("sum_lp") / col("n_bigrams")).as("avg_logprob"))
      .orderBy("doc_id")

  /** The full CCNet-style perplexity FILTER built on the bigram LM
    * above: score EVERY document (not a sample), convert to perplexity
    * ppl = exp(−avg_lp), and band the corpus head/middle/tail around
    * the corpus-wide score distribution (μ ± σ/2 on avg log-prob —
    * CCNet keeps the middle band: the head is boilerplate-ish
    * over-predictable text, the tail is word salad). Output is the
    * per-source band profile a curation run reports before choosing
    * keep-rates.
    *
    * Scale: LM training and scoring are the same vocabulary-bounded
    * joins as q_ngram_lm over one corpus pass; the banding thresholds
    * are a ONE-ROW broadcast (decimal-exact moments of the per-doc
    * score), so the band assignment is scan-local — no second
    * corpus-wide shuffle beyond the per-doc rollup. Docs with < 2
    * tokens have no bigrams and are excluded (no score exists).
    *
    * Determinism: per-bigram lp r6 + DECIMAL sums (as q_ngram_lm);
    * per-doc avg r4; ppl = r4(exp(−avg)) — exp/ln on identical doubles
    * agree bitwise across engines; μ, σ and both thresholds r6 before
    * the comparison, so banding is bit-portable. */
  def perplexityFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val perDoc = bigramLmScored(spark, dir, Seq("source"), lit(true))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("nb"),
        sum(col("lp").cast(d)).cast(DoubleType).as("slp"))
      .withColumn("alp", r4(col("slp") / col("nb")))
      .withColumn("ppl", r4(exp(-col("alp"))))
    val stats = perDoc.agg(count(lit(1)).as("nd"),
        sum(col("alp").cast(d)).cast(DoubleType).as("s"),
        sum(r6(col("alp") * col("alp")).cast(d)).cast(DoubleType).as("ss"))
      .withColumn("mu", r6(col("s") / col("nd")))
      // greatest(0, ·): the r6-rounded alp² terms can push the variance
      // a few 1e-7 below zero on a constant-alp corpus — Spark's
      // sqrt(-x) is NaN but DuckDB's is a hard Out of Range ERROR, so
      // both sides clamp
      .withColumn("sigma", r6(sqrt(greatest(lit(0.0),
        (col("ss") - col("s") * col("s") / col("nd")) / col("nd")))))
      .select(r6(col("mu") + col("sigma") / 2).as("hi"),
        r6(col("mu") - col("sigma") / 2).as("lo"))
    perDoc.crossJoin(broadcast(stats))
      .withColumn("band", when(col("alp") > col("hi"), "head")
        .when(col("alp") < col("lo"), "tail").otherwise("middle"))
      .groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"),
        r6(sum(col("ppl").cast(d)).cast(DoubleType) / count(lit(1))).as("avg_ppl"))
      .orderBy("source", "band")
  }

  private val perplexityFilterOracle =
    s"""WITH ${bigramLmCtes(carrySource = true, "")},
       |perdoc0 AS (
       |  SELECT doc_id, source,
       |    ${rSql("(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 4)} AS alp
       |  FROM scored GROUP BY 1, 2),
       |pd AS (
       |  SELECT doc_id, source, alp, ${rSql("exp(-alp)", 4)} AS ppl FROM perdoc0),
       |stats AS (
       |  SELECT COUNT(*) AS nd,
       |    CAST(SUM(CAST(alp AS DECIMAL(28,6))) AS DOUBLE) AS s,
       |    CAST(SUM(CAST(${rSql("(alp * alp)", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS ss
       |  FROM pd),
       |th AS (
       |  SELECT ${rSql("(s / nd)", 6)} AS mu,
       |    ${rSql("sqrt(greatest(0.0, (ss - s * s / nd) / nd))", 6)} AS sigma
       |  FROM stats),
       |th2 AS (
       |  SELECT ${rSql("(mu + sigma / 2)", 6)} AS hi,
       |    ${rSql("(mu - sigma / 2)", 6)} AS lo
       |  FROM th),
       |banded AS (
       |  SELECT source,
       |    CASE WHEN alp > hi THEN 'head' WHEN alp < lo THEN 'tail'
       |      ELSE 'middle' END AS band, ppl
       |  FROM pd CROSS JOIN th2)
       |SELECT source, band, COUNT(*) AS n_docs,
       |  ${rSql("(CAST(SUM(CAST(ppl AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 6)} AS avg_ppl
       |FROM banded GROUP BY 1, 2 ORDER BY source, band""".stripMargin

  /** Shared bigram-LM CTE chain (toks/uni/vocab/bi_all/bi_occ/bi/
    * scored) — one oracle text for the q_ngram_lm / q_ppl_filter pair,
    * mirroring [[bigramLmScored]]. */
  private def bigramLmCtes(carrySource: Boolean, scoreWhere: String): String = {
    val src = if (carrySource) ", source" else ""
    val srcSel = if (carrySource) ", o.source" else ""
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |uni AS (SELECT word AS w1, COUNT(*) AS c1 FROM toks GROUP BY 1),
       |vocab AS (SELECT COUNT(DISTINCT word) AS v FROM toks),
       |bi_all AS (
       |  SELECT doc_id$src,
       |    unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
       |      i -> {'w1': string_split(text, ' ')[i], 'w2': string_split(text, ' ')[i+1]})) AS bg
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
       |bi_occ AS (SELECT doc_id$src, bg.w1 AS w1, bg.w2 AS w2 FROM bi_all),
       |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi_occ GROUP BY 1, 2),
       |scored AS (
       |  SELECT o.doc_id$srcSel,
       |    ${rSql("ln((c2 + 0.5) / (c1 + 0.5 * v))", 6)} AS lp
       |  FROM bi_occ o
       |  JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab$scoreWhere)""".stripMargin
  }

  private val ngramLmOracle =
    s"""WITH ${bigramLmCtes(carrySource = false, "\n  WHERE o.doc_id % 5 = 0")}
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  ${rSql("(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))", 4)} AS avg_logprob
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------- cross-doc repeated substrings

  /** Cross-document repeated-substring detection at word-12-gram
    * granularity — the signal behind suffix-array dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"):
    * verbatim spans appearing in ≥2 distinct documents mark
    * boilerplate/templated text. True suffix arrays don't distribute;
    * fixed-width gram hashing is the standard scalable surrogate.
    *
    * Per doc: total distinct 12-grams, how many are shared with any
    * other document, and the shared ratio. Only docs with at least one
    * shared span are emitted.
    */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 12)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 11), i -> array_join(slice(toks, i, 12), ' '))"))
        .as("gram"))
      .distinct()
    val shared = grams.groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    grams.join(shared, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_docs").isNotNull, 1L).otherwise(0L)).as("n_shared"))
      .filter(col("n_shared") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        r4(col("n_shared").cast(DoubleType) / col("n_grams")).as("shared_ratio"))
      .orderBy("doc_id")
  }

  private val dedupSubstringOracle =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 11),
       |      i -> array_to_string(string_split(text, ' ')[i:i+11], ' '))) AS gram
       |  FROM documents WHERE len(string_split(text, ' ')) >= 12),
       |shared AS (
       |  SELECT gram, COUNT(*) AS n_docs FROM grams GROUP BY 1 HAVING COUNT(*) >= 2),
       |agg AS (
       |  SELECT g.doc_id, COUNT(*) AS n_grams,
       |    SUM(CASE WHEN s.n_docs IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
       |  FROM grams g LEFT JOIN shared s USING (gram)
       |  GROUP BY g.doc_id)
       |SELECT doc_id, n_grams, CAST(n_shared AS BIGINT) AS n_shared,
       |  ${rSql("(CAST(n_shared AS DOUBLE) / n_grams)", 4)} AS shared_ratio
       |FROM agg WHERE n_shared > 0 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- training-mix plan

  /** Training-mix rebalancing plan — given target domain shares (the
    * LLaMA-style data-mixture table), compute per-domain sampling plans
    * against a token^W document budget: planned n, sampling rate, and
    * the repeat factor ("epochs") where a domain must be upsampled.
    * Target shares here derive deterministically from the domain index
    * (share ∝ index+1) so both engines bind identical weights.
    *
    * Pure aggregation arithmetic on domain-cardinality rows — the
    * actual materialization pass is q_stratified_sample's
    * hash-threshold sampling at these rates.
    */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    // NULLIF guards the digitless-source case in BOTH engines: a bare
    // CAST('' AS BIGINT) is silent NULL in Spark but a hard Conversion
    // Error in DuckDB — asymmetric failure modes on unexpected data.
    val perSrc = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("k", expr(
        "coalesce(CAST(nullif(regexp_extract(source, '([0-9]+)', 1), '') AS BIGINT), 0)"))
    val total = perSrc.agg(sum("n_docs").as("total"),
      sum(col("k") + 1).as("w_sum"))
    perSrc.crossJoin(broadcast(total))
      .withColumn("target_share", (col("k") + 1).cast(DoubleType) / col("w_sum"))
      .withColumn("budget", floor(col("total") * 0.6).cast("long"))
      .withColumn("planned_n",
        least(col("n_docs"), floor(col("target_share") * col("budget")).cast("long")))
      .select(col("source"), col("n_docs"),
        r6(col("target_share")).as("target_share"),
        col("planned_n"),
        r6(col("planned_n").cast(DoubleType) / col("n_docs")).as("rate"),
        r4(col("target_share") * col("budget") / col("n_docs")).as("epochs"))
      .orderBy("source")
  }

  private val domainMixOracle =
    s"""WITH persrc AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    COALESCE(CAST(NULLIF(regexp_extract(source, '([0-9]+)', 1), '') AS BIGINT), 0) AS k
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total, CAST(SUM(k + 1) AS BIGINT) AS w_sum FROM persrc),
       |plan AS (
       |  SELECT source, n_docs,
       |    CAST(k + 1 AS DOUBLE) / w_sum AS target_share,
       |    CAST(FLOOR(total * 0.6) AS BIGINT) AS budget
       |  FROM persrc CROSS JOIN tot),
       |planned AS (
       |  SELECT source, n_docs, target_share, budget,
       |    LEAST(n_docs, CAST(FLOOR(target_share * budget) AS BIGINT)) AS planned_n
       |  FROM plan)
       |SELECT source, n_docs,
       |  ${rSql("target_share", 6)} AS target_share, planned_n,
       |  ${rSql("(CAST(planned_n AS DOUBLE) / n_docs)", 6)} AS rate,
       |  ${rSql("(target_share * budget / n_docs)", 4)} AS epochs
       |FROM planned ORDER BY source""".stripMargin

  // ------------------------------------------------ C4 quality funnel

  /** C4-style quality-rule funnel (Raffel et al. 2020 §2.2 analog):
    * per-document boolean rules — minimum length, mean word length in
    * range, stopword evidence, repetition — rolled up per source as a
    * drop-reason funnel plus the surviving count. Every rule is a
    * scan-local expression; the rollup is one domain-cardinality
    * aggregation.
    */
  def c4Filters(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val meanWl = (length(col("text")) - nTok + 1).cast(DoubleType) / nTok
    val stopHits = expr("size(filter(split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'is')))")
    val distinctRatio = size(array_distinct(toks)).cast(DoubleType) / nTok
    val fLen = nTok >= 20
    val fWl = meanWl >= 3.0 && meanWl <= 8.0
    val fStop = stopHits >= 2
    val fRep = distinctRatio >= 0.2
    Tables.documents(spark, dir)
      .select(col("source"), fLen.as("f_len"), fWl.as("f_wl"),
        fStop.as("f_stop"), fRep.as("f_rep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("f_len"), 1L).otherwise(0L)).as("drop_len"),
        sum(when(col("f_len") && !col("f_wl"), 1L).otherwise(0L)).as("drop_wordlen"),
        sum(when(col("f_len") && col("f_wl") && !col("f_stop"), 1L).otherwise(0L)).as("drop_stopword"),
        sum(when(col("f_len") && col("f_wl") && col("f_stop") && !col("f_rep"), 1L).otherwise(0L)).as("drop_repetition"),
        sum(when(col("f_len") && col("f_wl") && col("f_stop") && col("f_rep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("source")
  }

  private val c4FiltersOracle = {
    val nTok = "len(string_split(text, ' '))"
    val meanWl = s"(CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok)"
    val stop = "len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'is')))"
    val dr = s"(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nTok)"
    s"""WITH flags AS (
       |  SELECT source,
       |    ($nTok >= 20) AS f_len,
       |    ($meanWl >= 3.0 AND $meanWl <= 8.0) AS f_wl,
       |    ($stop >= 2) AS f_stop,
       |    ($dr >= 0.2) AS f_rep
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN NOT f_len THEN 1 ELSE 0 END) AS BIGINT) AS drop_len,
       |  CAST(SUM(CASE WHEN f_len AND NOT f_wl THEN 1 ELSE 0 END) AS BIGINT) AS drop_wordlen,
       |  CAST(SUM(CASE WHEN f_len AND f_wl AND NOT f_stop THEN 1 ELSE 0 END) AS BIGINT) AS drop_stopword,
       |  CAST(SUM(CASE WHEN f_len AND f_wl AND f_stop AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS drop_repetition,
       |  CAST(SUM(CASE WHEN f_len AND f_wl AND f_stop AND f_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM flags GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------------------------- quality classifier (GD)

  private val lrIters = 8

  /** Distributed logistic-regression quality classifier — the
    * trainable analog of the fixed-rule q_c4_filters (real pipelines
    * train a lightweight classifier on labeled good/bad docs and score
    * the corpus with it). Full-batch gradient descent, η=1, a fixed
    * 8 iterations: each iteration is ONE map-side-combined aggregation
    * producing the 4 gradient components; the driver holds only the
    * 4-double weight vector (dimension-bounded, like IVF centroids).
    * Features are scan-local ratios; the label is a held-out quality
    * rule the continuous features must approximate (not re-derive).
    *
    * Oracle-backed DESPITE being iterative ML: per-row gradient terms
    * are rounded to 6 decimals and summed in DECIMAL, so every
    * intermediate weight is bit-reproducible — the DuckDB oracle
    * unrolls the same 8 iterations as a CTE chain and must land on the
    * identical weights, predictions, and confusion counts.
    *
    * Scale: the feature frame is computed once and persisted
    * ([[graft.CacheScope]]); 8 passes × one aggregation each — the
    * same pass structure distributed L-BFGS/SGD systems use. */
  private def lrFeatures(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val stopHits =
      expr("size(filter(split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'is')))")
    val uniqRatio = size(array_distinct(toks)).cast(DoubleType) / nTok
    Tables.documents(spark, dir).select(
      col("source"),
      uniqRatio.as("x1"),
      (stopHits.cast(DoubleType) / nTok).as("x2"),
      ((length(col("text")) - nTok + 1).cast(DoubleType) / nTok / 10.0).as("x3"),
      when(stopHits >= 2 && uniqRatio >= 0.3, 1.0).otherwise(0.0).as("y"))
  }

  /** Full-batch GD on the persisted feature frame; the driver holds
    * only the 4-double weight vector. Gradient terms r6-round before
    * the DECIMAL sum, so the weight path is bit-reproducible. */
  private def trainLr(features: DataFrame): Array[Double] = {
    val dec = DecimalType(28, 6)
    // n rides the FIRST gradient pass (r12): a separate count() job
    // paid one more driver round-trip on a loop that is already
    // job-latency-bound; the update w -= g/n only needs n alongside g.
    var n = 0L
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (it <- 1 to lrIters) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - col("y")
      val g = features.agg(
        sum(r6(err).cast(dec)).cast(DoubleType),
        sum(r6(err * col("x1")).cast(dec)).cast(DoubleType),
        sum(r6(err * col("x2")).cast(dec)).cast(DoubleType),
        sum(r6(err * col("x3")).cast(dec)).cast(DoubleType),
        count(lit(1))).head()
      if (it == 1) n = g.getLong(4)
      w = Array.tabulate(4)(j => w(j) - g.getDouble(j) / n.toDouble)
    }
    w
  }

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val features = graft.CacheScope.track(lrFeatures(spark, dir).persist())
    val w = trainLr(features)
    val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    features
      .withColumn("pred", when(z > 0, 1.0).otherwise(0.0))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1.0 && col("pred") === 1.0, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === 0.0 && col("pred") === 1.0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 0.0 && col("pred") === 0.0, 1L).otherwise(0L)).as("tn"),
        sum(when(col("y") === 1.0 && col("pred") === 0.0, 1L).otherwise(0L)).as("fn"))
      .select(col("source"), col("n_docs"), col("tp"), col("fp"), col("tn"), col("fn"),
        r4((col("tp") + col("tn")).cast(DoubleType) / col("n_docs")).as("accuracy"))
      .orderBy("source")
  }

  /** The final trained weights, driver-side — exposed for the spec's
    * exactness pin against an independent single-machine GD. */
  def qualityClassifierWeights(spark: SparkSession, dir: String): Array[Double] =
    trainLr(graft.CacheScope.track(lrFeatures(spark, dir).persist()))

  /** The shared DuckDB CTE prelude replaying lrFeatures + the full
    * 8-iteration GD weight path (f, cnt, it0..it8) — composed by BOTH
    * the classifier and calibration oracles so they can never verify
    * against divergent weight chains. Also exposes the sigmoid text. */
  private lazy val (lrOracleCtes: String, lrSigSql: String) = {
    val nTok = "len(string_split(text, ' '))"
    val stop = "len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'is')))"
    val x1 = s"(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nTok)"
    val x2 = s"(CAST($stop AS DOUBLE) / $nTok)"
    val x3 = s"(CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok / 10.0)"
    val y = s"(CASE WHEN $stop >= 2 AND $x1 >= 0.3 THEN 1.0 ELSE 0.0 END)"
    val sig = "(1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2 + w3 * x3))))"
    def gSum(xj: String) =
      s"CAST(SUM(CAST(${rSql(s"(($sig - y) * $xj)", 6)} AS DECIMAL(28,6))) AS DOUBLE)"
    val iterCtes = (1 to lrIters).map { k =>
      s"""it$k AS (
         |  SELECT w0 - ${gSum("1.0")} / CAST(n AS DOUBLE) AS w0,
         |         w1 - ${gSum("x1")} / CAST(n AS DOUBLE) AS w1,
         |         w2 - ${gSum("x2")} / CAST(n AS DOUBLE) AS w2,
         |         w3 - ${gSum("x3")} / CAST(n AS DOUBLE) AS w3
         |  FROM f CROSS JOIN it${k - 1} CROSS JOIN cnt
         |  GROUP BY w0, w1, w2, w3, n)""".stripMargin
    }.mkString(",\n")
    val ctes =
      s"""f AS (
         |  SELECT source, $x1 AS x1, $x2 AS x2, $x3 AS x3, $y AS y FROM documents),
         |cnt AS (SELECT COUNT(*) AS n FROM f),
         |it0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
         |$iterCtes""".stripMargin
    (ctes, sig)
  }

  private val qualityClassifierOracle = {
    s"""WITH $lrOracleCtes,
       |scored AS (
       |  SELECT source, y,
       |    CASE WHEN (w0 + w1 * x1 + w2 * x2 + w3 * x3) > 0 THEN 1.0 ELSE 0.0 END AS pred
       |  FROM f CROSS JOIN it$lrIters)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN y = 1.0 AND pred = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN y = 0.0 AND pred = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN y = 0.0 AND pred = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |  CAST(SUM(CASE WHEN y = 1.0 AND pred = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  ${rSql("(CAST(SUM(CASE WHEN y = pred THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))", 4)} AS accuracy
       |FROM scored GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------------------------------- classifier calibration

  /** Calibration / reliability readout for the trained quality
    * classifier (q_quality_classifier's model): predicted probabilities
    * bin into deciles, each bin reports mean confidence vs actual
    * positive rate, and the ALL row carries the expected calibration
    * error ECE = Σ (n_b/N)·|acc_b − conf_b| — the standard "can you
    * trust the score as a probability" gate before using classifier
    * scores to threshold or mix training data (Guo et al. 2017).
    *
    * Determinism: p = r6(sigmoid) so both engines bin identically;
    * per-bin confidence sums are r6-then-DECIMAL; ECE terms likewise.
    * The oracle re-derives the weights through the SAME 8-iteration
    * CTE chain the classifier oracle replays (bit-reproducible weight
    * path, proven in round 5).
    *
    * Scale: training is q_quality_classifier's (one map-side-combined
    * pass per GD iteration); scoring + binning is scan-local over the
    * persisted feature frame; the bin frame is ≤10 rows. */
  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val features = graft.CacheScope.track(lrFeatures(spark, dir).persist())
    calibrationFrom(features, trainLr(features))
  }

  /** Binning + ECE stage on an explicit (x1,x2,x3,y) frame and weight
    * vector — split out so the multi-bin path (bin ordering, per-bin
    * conf/acc, ECE weighting) is unit-testable on a synthetic frame
    * whose scores span several deciles, which the sf fixtures' trained
    * scores do not (they collapse into one bin). */
  private[graft] def calibrationFrom(features: DataFrame, w: Array[Double]): DataFrame = {
    val dec = DecimalType(28, 6)
    val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    val binned = features
      .withColumn("p", r6(lit(1.0) / (lit(1.0) + exp(-z))))
      .withColumn("bin", least(floor(col("p") * 10).cast("long"), lit(9L)))
    val per = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(r6(col("p")).cast(dec)).cast(DoubleType).as("sp"),
        sum(col("y").cast(dec)).cast(DoubleType).as("sy"))
      .withColumn("conf_raw", col("sp") / col("n"))
      .withColumn("acc_raw", col("sy") / col("n"))
    val rows = per.select(col("bin").cast("string").as("bin"), col("n"),
      r4(col("conf_raw")).as("conf"), r4(col("acc_raw")).as("acc"),
      r4(abs(col("acc_raw") - col("conf_raw"))).as("gap"))
    val all = per
      .withColumn("term", r6(col("n") * abs(col("acc_raw") - col("conf_raw"))))
      .agg(sum("n").as("n"),
        sum(col("sp").cast(dec)).cast(DoubleType).as("sp"),
        sum(col("sy").cast(dec)).cast(DoubleType).as("sy"),
        sum(col("term").cast(dec)).cast(DoubleType).as("st"))
      .select(lit("ALL").as("bin"), col("n"),
        r4(col("sp") / col("n")).as("conf"),
        r4(col("sy") / col("n")).as("acc"),
        r4(col("st") / col("n")).as("gap"))
    rows.unionByName(all).orderBy("bin")
  }

  private val calibrationOracle = {
    s"""WITH $lrOracleCtes,
       |binned AS (
       |  SELECT y, ${rSql(lrSigSql, 6)} AS p,
       |    LEAST(CAST(FLOOR(${rSql(lrSigSql, 6)} * 10) AS BIGINT), 9) AS bin
       |  FROM f CROSS JOIN it$lrIters),
       |per AS (
       |  SELECT bin, COUNT(*) AS n,
       |    CAST(SUM(CAST(${rSql("p", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS sp,
       |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy
       |  FROM binned GROUP BY bin),
       |per2 AS (
       |  SELECT bin, n, sp, sy, sp / n AS conf_raw, sy / n AS acc_raw FROM per)
       |SELECT CAST(bin AS VARCHAR) AS bin, n,
       |  ${rSql("conf_raw", 4)} AS conf, ${rSql("acc_raw", 4)} AS acc,
       |  ${rSql("abs(acc_raw - conf_raw)", 4)} AS gap
       |FROM per2
       |UNION ALL
       |SELECT 'ALL' AS bin, CAST(SUM(n) AS BIGINT) AS n,
       |  ${rSql("(CAST(SUM(CAST(sp AS DECIMAL(28,6))) AS DOUBLE) / SUM(n))", 4)} AS conf,
       |  ${rSql("(CAST(SUM(CAST(sy AS DECIMAL(28,6))) AS DOUBLE) / SUM(n))", 4)} AS acc,
       |  ${rSql("(CAST(SUM(CAST(" + rSql("(n * abs(acc_raw - conf_raw))", 6) + " AS DECIMAL(28,6))) AS DOUBLE) / SUM(n))", 4)} AS gap
       |FROM per2
       |ORDER BY bin""".stripMargin
  }

  // ------------------------------------------------------------- TF-IDF

  /** TF-IDF keyword extraction: the top-3 characteristic terms of each
    * sampled document, scored tf·idf with the sklearn-style smoothed
    * idf = ln((1+N)/(1+df)) + 1 — the classic "what is this document
    * about" signal used for topic tagging and mix analysis.
    *
    * Document frequencies come from the WHOLE corpus (one explode →
    * distinct (doc,term) → per-term count — vocabulary-bounded, exactly
    * the BM25 shuffle shape); only the scored sample (doc_id < 30) pays
    * the per-doc ranking. idf is a per-term `ln` rounded with the score
    * at the very end — a single transcendental per output row, no sums
    * of transcendentals, so no decimal staging is needed.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val docTerm = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = docTerm.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = docTerm.filter(col("doc_id") < 30)
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", r6(col("tf") *
        (log((lit(1L) + col("n_docs")).cast(DoubleType) / (lit(1L) + col("df"))) + 1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  private val tfidfOracle = {
    val score = rSql("(tf * (ln(CAST(1 + n_docs AS DOUBLE) / (1 + df)) + 1.0))", 6)
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |docterm AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM docterm GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df, $score AS score
       |  FROM docterm JOIN dfreq USING (term) CROSS JOIN n
       |  WHERE doc_id < 30),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, term) AS "rank"
       |  FROM scored)
       |SELECT doc_id, "rank", term, tf, df, score
       |FROM ranked WHERE "rank" <= 3 ORDER BY doc_id, "rank"""".stripMargin
  }

  // ------------------------------------------- entropy / KL divergence

  /** Per-source unigram entropy and KL divergence against the corpus
    * distribution — the domain-shift diagnostic behind training-mix
    * decisions: low entropy = repetitive/templated source, high KL =
    * source vocabulary diverges from the corpus at large.
    *
    * H(s) = −Σ_t p_ts·ln(p_ts),  KL(s‖corpus) = Σ_t p_ts·ln(p_ts/q_t),
    * with p from per-source term counts and q from corpus-wide counts.
    * Both are sums of per-term transcendentals, so each term is
    * r6-rounded THEN summed in DECIMAL (SURVEY §4 order invariance) —
    * the q_ngram_lm discipline. Every p_ts > 0 by construction and
    * q_t > 0 whenever the (s,t) pair exists, so the logs are total.
    *
    * Scale: two vocabulary-bounded count tables (|source × term|,
    * |term|) hash-join on term — AQE broadcasts the corpus side when
    * small; no driver collection, no raw-row second pass.
    */
  def entropy(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
    val st = toks.groupBy("source", "term").agg(count(lit(1)).as("c_st"))
    val srcTot = st.groupBy("source").agg(sum("c_st").as("n_s"))
    val corpus = st.groupBy("term").agg(sum("c_st").as("c_t"))
    val corpusTot = corpus.agg(sum("c_t").as("n_tot"))
    val p = col("c_st").cast(DoubleType) / col("n_s")
    val q = col("c_t").cast(DoubleType) / col("n_tot")
    st.join(srcTot, "source").join(corpus, "term")
      .crossJoin(broadcast(corpusTot))
      .select(col("source"), col("n_s"),
        r6(-p * log(p)).as("h_term"), r6(p * log(p / q)).as("kl_term"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        sum(col("h_term").cast(d)).cast(DoubleType).as("entropy"),
        sum(col("kl_term").cast(d)).cast(DoubleType).as("kl_corpus"))
      .select(col("source"), col("n_tokens"),
        r4(col("entropy")).as("entropy"), r4(col("kl_corpus")).as("kl_corpus"))
      .orderBy("source")
  }

  private val entropyOracle = {
    val p = "(CAST(c_st AS DOUBLE) / n_s)"
    val q = "(CAST(c_t AS DOUBLE) / n_tot)"
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
       |st AS (SELECT source, term, COUNT(*) AS c_st FROM toks GROUP BY 1, 2),
       |srctot AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
       |corpus AS (SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
       |corpustot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_tot FROM corpus),
       |terms AS (
       |  SELECT source, n_s,
       |    ${rSql(s"(-$p * ln($p))", 6)} AS h_term,
       |    ${rSql(s"($p * ln($p / $q))", 6)} AS kl_term
       |  FROM st JOIN srctot USING (source) JOIN corpus USING (term)
       |    CROSS JOIN corpustot)
       |SELECT source, MAX(n_s) AS n_tokens,
       |  ${rSql("CAST(SUM(CAST(h_term AS DECIMAL(28,6))) AS DOUBLE)", 4)} AS entropy,
       |  ${rSql("CAST(SUM(CAST(kl_term AS DECIMAL(28,6))) AS DOUBLE)", 4)} AS kl_corpus
       |FROM terms GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------------------------------ BPE pair counting

  /** The inner loop of distributed BPE tokenizer training: count every
    * adjacent character pair inside every word across the corpus and
    * rank the merge candidates — iteration 1 of the merge loop (Sennrich
    * et al.; real training re-runs this after applying each merge).
    *
    * One explode → groupBy on a pair-alphabet-bounded key; the top-20
    * readout is TakeOrderedAndProject with a total-order tie-break
    * (count desc, pair asc), so no global sort and no ambiguity.
    */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  private val bpePairsOracle =
    """WITH words AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |pairs AS (
      |  SELECT unnest(list_transform(generate_series(1, length(word) - 1),
      |    i -> substring(word, i, 2))) AS pair
      |  FROM words WHERE length(word) >= 2)
      |SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY 1
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  // ------------------------------------------------- BPE merge training

  private val bpeIters = 8

  /** Full BPE tokenizer induction (Sennrich et al. 2016) — the
    * iterated count→merge→re-tokenize loop that q_bpe_pairs only runs
    * one step of. Eight rounds, each: count adjacent symbol pairs
    * weighted by word frequency, take the most frequent pair
    * (deterministic (count desc, lhs, rhs) tie-break), fuse it across
    * the vocabulary. The output is the merge table — the trained
    * artifact a tokenizer ships (merges.txt).
    *
    * Portable merge kernel: a word's symbol sequence is one STRING
    * with each symbol space-wrapped (" a  b  c " — words are
    * space-split, so no symbol can ever contain the separator), and
    * fusing the pair (l, r) is `replace(s, " l  r ", " lr ")`. Both
    * engines' replace() scans left-to-right non-overlapping, which IS
    * greedy BPE merging, and the double separator means adjacent
    * matches share no characters — so "a a a a" under (a,a) correctly
    * fuses to "aa aa", and a symbol ending in `l` can never
    * false-match before one starting with `r`. Identical kernel in
    * the unrolled MATERIALIZED-CTE oracle (the kcore discipline).
    *
    * Scale: the corpus is touched ONCE (word-frequency vocabulary);
    * every round runs on the DISTINCT vocabulary (vocabulary-bounded,
    * the BM25/q_ngram_lm shuffle shape), pair counts are map-side
    * combined, only the single winning pair row comes to the driver
    * per round (dimension-bounded, the IVF-centroid discipline), and
    * each round's vocabulary is checkpointed + retired on the khop
    * fixed-round contract (reliable under `spark.graft.checkpointDir`,
    * [[graft.CacheScope.checkpoint]]). */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainBpeMerges(spark, dir)
    import spark.implicits._
    merges.toDF("it", "lhs", "rhs", "merged", "cnt").orderBy("it")
  }

  /** The count→merge→re-tokenize loop behind q_bpe_train / q_bpe_encode:
    * returns the ordered merge table (it, lhs, rhs, merged, pair count). */
  private def trainBpeMerges(spark: SparkSession, dir: String): Seq[(Int, String, String, String, Long)] = {
    import graft.CacheScope.CheckpointOps
    var vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(expr(
        "concat_ws('', transform(split(word, ''), c -> concat(' ', c, ' ')))").as("s"),
        col("cnt"))
      .graftCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var k = 1
    var dry = false
    while (k <= bpeIters && !dry) {
      val top1 = vocab
        .select(col("cnt"), split(expr("substring(s, 2, length(s) - 2)"), "  ").as("syms"))
        // single-symbol words carry no pairs — and Spark's
        // sequence(1, 0) counts DOWN, which under ANSI mode turns the
        // unguarded transform into an array-index error
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> named_struct('l', syms[i-1], 'r', syms[i]))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
      // r12: the winner comes to the driver as ONE dimension-bounded
      // row (the IVF-centroid discipline) and the fuse applies it as
      // plan LITERALS — the former broadcast-1-row left join + observe()
      // machinery planned a join and an extra AQE broadcast stage into
      // every generation for the same answer. Two actions per round
      // (winner readout + generation checkpoint), simpler plans, and a
      // dry vocabulary (no pairs anywhere) is just an empty readout —
      // the next generation is never built, exactly the old early-exit.
      val won = top1.collect().headOption.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      won match {
        case None =>
          // every word is down to one symbol: the (shorter) merge
          // table found so far IS the trained artifact
          dry = true
        case Some((l, r, c)) =>
          val next = vocab
            .select(call_function("replace", col("s"),
              lit(s" $l  $r "), lit(s" $l$r ")).as("s"), col("cnt"))
            .graftCheckpoint()
          merges += ((k, l, r, l + r, c))
          graft.CacheScope.freeCheckpoint(vocab)
          vocab = next
          k += 1
      }
    }
    // the merge table is the trained artifact; the final vocabulary
    // generation is no longer referenced
    graft.CacheScope.freeCheckpoint(vocab)
    merges.result()
  }

  /** BPE tokenizer APPLICATION — the other half of the tokenizer
    * lifecycle (train → encode): segment the vocabulary with the merge
    * table q_bpe_train produces. Once the merges are known the encode
    * is a SCAN-LOCAL chain of 8 literal replaces over the distinct-word
    * vocabulary — no iteration, no shuffle beyond the vocabulary
    * groupBy — which is exactly how a 100 TB corpus gets tokenized
    * (merges broadcast as literals, one embarrassingly-parallel pass;
    * here the chain is folded into a single projected expression).
    * Output: the 20 most frequent words with their segmentation and
    * token count. Oracle: the q_bpe_train CTE chain with the word
    * column carried through every fused generation. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    bpeEncodeWith(trainBpeMerges(spark, dir).map(m => (m._2, m._3)), vocab)
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)
  }

  /** Library entry for APPLYING an already-trained merge table (the
    * production path: train once, encode many corpora — re-training per
    * encode would waste 8 driver rounds). `vocab` needs a `word`
    * column; all other columns pass through. Appends `n_tokens` and
    * `seg` (space-joined BPE segmentation). Scan-local: the merges
    * land as literals in one projected replace chain. */
  def bpeEncodeWith(merges: Seq[(String, String)], vocab: DataFrame): DataFrame = {
    val wrapped = vocab.withColumn("s", expr(
      "concat_ws('', transform(split(word, ''), c -> concat(' ', c, ' ')))"))
    val encoded = merges.foldLeft(wrapped) { case (df, (l, r)) =>
      df.withColumn("s", call_function("replace",
        col("s"), lit(s" $l  $r "), lit(s" $l$r ")))
    }
    encoded
      .withColumn("toks", split(expr("substring(s, 2, length(s) - 2)"), "  "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("seg", concat_ws(" ", col("toks")))
      .drop("s", "toks")
  }

  private val bpeEncodeOracle =
    s"""WITH ${bpeChainSql(withWord = true)}
       |SELECT word, cnt,
       |  len(string_split(substring(s, 2, length(s) - 2), '  ')) AS n_tokens,
       |  array_to_string(string_split(substring(s, 2, length(s) - 2), '  '), ' ') AS seg
       |FROM v$bpeIters ORDER BY cnt DESC, word LIMIT 20""".stripMargin

  /** The unrolled BPE CTE chain (v0..v8 vocabulary generations + p1..p8
    * winning pairs), shared by the train and encode oracles so the
    * merge kernel can never silently diverge between them — the
    * ivfChainCtes/pqChainCtes discipline. `withWord` carries the word
    * column through every fused generation (the encode oracle needs
    * the original word beside its segmentation; pair counting is
    * unaffected because the vocabulary rows are distinct words either
    * way). */
  private def bpeChainSql(withWord: Boolean): String = {
    val w = if (withWord) "word, " else ""
    val base =
      s"""v0 AS MATERIALIZED (
         |  SELECT ${w}concat(' ', array_to_string(list_transform(
         |      generate_series(1, length(word)), i -> substring(word, i, 1)), '  '), ' ') AS s,
         |    cnt
         |  FROM (
         |    SELECT word, COUNT(*) AS cnt
         |    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |    WHERE length(word) >= 1 GROUP BY 1))""".stripMargin
    val steps = (1 to bpeIters).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT pr.l AS l, pr.r AS r, SUM(cnt) AS c
         |  FROM (
         |    SELECT cnt, unnest(list_transform(generate_series(1, len(syms) - 1),
         |      i -> {'l': syms[i], 'r': syms[i + 1]})) AS pr
         |    FROM (SELECT string_split(trim(s, ' '), '  ') AS syms, cnt FROM v${k - 1}))
         |  GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT ${w}COALESCE(replace(s, ' ' || l || '  ' || r || ' ', ' ' || l || r || ' '), s) AS s, cnt
         |  FROM v${k - 1} LEFT JOIN p$k ON TRUE)""".stripMargin
    }.mkString(",\n")
    // LEFT JOIN ON TRUE + COALESCE, not CROSS JOIN: if training runs
    // DRY before round k (every word one symbol — the Spark side's
    // early stop), p$k is empty and a cross join would annihilate the
    // vocabulary chain, collapsing the encode oracle to zero rows
    // while Spark still emits the encoded vocab; the left join keeps
    // v_k ≡ v_(k−1) instead. With the usual single-row winner the two
    // shapes are identical.
    s"$base,\n$steps"
  }

  private val bpeTrainOracle = {
    val outs = (1 to bpeIters).map { k =>
      s"SELECT $k AS it, l AS lhs, r AS rhs, l || r AS merged, CAST(c AS BIGINT) AS cnt FROM p$k"
    }.mkString("\nUNION ALL\n")
    s"WITH ${bpeChainSql(withWord = false)}\n$outs\nORDER BY it"
  }

  // ------------------------------------------------- PMI collocations

  /** Pointwise-mutual-information collocation mining: adjacent word
    * pairs that co-occur far more than their unigram frequencies
    * predict — the phrase/multi-word-token discovery pass (Mikolov-
    * style phrase building) run before vocabulary induction.
    * pmi = ln(c₁₂·N / (c₁·c₂)), minimum support 5, top-20.
    *
    * Every factor is promoted to double BEFORE multiplying (fixed
    * order, both engines) so counts can exceed 2^31.5 without integer
    * overflow; the ranking key is the 1e-6-rounded pmi with a
    * total-order tie-break. Vocabulary-bounded joins; corpus totals
    * ride a one-row broadcast.
    */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(explode(split(col("text"), " ")).as("word"))
    val uni = toks.groupBy("word").agg(count(lit(1)).as("c"))
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val bi = docs.select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> named_struct('w1', toks[i-1], 'w2', toks[i]))"))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 5)
    val pmi = expr("ln((CAST(c12 AS DOUBLE) * CAST(n_tok AS DOUBLE)) / " +
      "(CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))")
    bi.join(uni.select(col("word").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("word").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nTok))
      .select(col("w1"), col("w2"), col("c12"), r6(pmi).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  private val pmiOracle = {
    val pmi = "ln((CAST(c12 AS DOUBLE) * CAST(n_tok AS DOUBLE)) / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))"
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |uni AS (SELECT word, COUNT(*) AS c FROM toks GROUP BY 1),
       |ntok AS (SELECT COUNT(*) AS n_tok FROM toks),
       |bi AS (
       |  SELECT bg.w1 AS w1, bg.w2 AS w2 FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
       |      i -> {'w1': string_split(text, ' ')[i], 'w2': string_split(text, ' ')[i+1]})) AS bg
       |    FROM documents WHERE len(string_split(text, ' ')) >= 2)),
       |bic AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= 5)
       |SELECT w1, w2, c12, ${rSql(pmi, 6)} AS pmi
       |FROM bic
       |JOIN (SELECT word AS w1, c AS c1 FROM uni) USING (w1)
       |JOIN (SELECT word AS w2, c AS c2 FROM uni) USING (w2)
       |CROSS JOIN ntok
       |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------- Zipf-slope fit

  /** Zipf rank-frequency fit per source: OLS slope of ln(freq) on
    * ln(rank) over the top-100 terms — the vocabulary-health
    * diagnostic (natural text sits near slope −1; templated/generated
    * text flattens or steepens, a cheap corpus-quality tripwire).
    *
    * Ranks come from a per-source window over the VOCABULARY table
    * (|source × term| rows, never raw tokens) with a total-order
    * tie-break; ln(rank)/ln(freq) are logs of integers so both engines
    * compute identical doubles, each moment term is r6-rounded then
    * decimal-summed (SURVEY §4), and the closed-form slope/intercept
    * divide once in a fixed expression order.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    val byRank = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("cnt").desc, col("term"))
    val ranked = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(byRank))
      .filter(col("rk") <= 100)
      .select(col("source"),
        log(col("rk").cast(DoubleType)).as("x"),
        log(col("cnt").cast(DoubleType)).as("y"))
    def ds(c: Column): Column = sum(r6(c).cast(d)).cast(DoubleType)
    val m = ranked.groupBy("source").agg(
      count(lit(1)).cast(DoubleType).as("n"),
      ds(col("x")).as("sx"), ds(col("y")).as("sy"),
      ds(col("x") * col("y")).as("sxy"), ds(col("x") * col("x")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col("source"), col("n").cast("long").as("n_terms"),
        r4(slope).as("zipf_slope"),
        r4((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
      .orderBy("source")
  }

  private val zipfOracle = {
    def ds(e: String) = s"CAST(SUM(CAST(${rSql(e, 6)} AS DECIMAL(28,6))) AS DOUBLE)"
    val slope = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
       |vocab AS (SELECT source, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
       |ranked AS (
       |  SELECT source, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
       |  FROM (SELECT source, cnt, ROW_NUMBER() OVER (PARTITION BY source
       |          ORDER BY cnt DESC, term) AS rk FROM vocab)
       |  WHERE rk <= 100),
       |m AS (
       |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${ds("x")} AS sx, ${ds("y")} AS sy,
       |    ${ds("(x * y)")} AS sxy, ${ds("(x * x)")} AS sxx
       |  FROM ranked GROUP BY source)
       |SELECT source, CAST(n AS BIGINT) AS n_terms,
       |  ${rSql(slope, 4)} AS zipf_slope,
       |  ${rSql(s"((sy - $slope * sx) / n)", 4)} AS intercept
       |FROM m ORDER BY source""".stripMargin
  }

  // ----------------------------------------------------------------- DSIR

  private val dsirBuckets = 256

  /** DSIR importance weighting (Xie et al. 2023, arXiv:2302.03169) —
    * Data Selection with Importance Resampling, the published recipe
    * for tilting a raw crawl toward a target domain: fit two hashed
    * bag-of-bigram models (target = `lang = 'en'` docs, raw = whole
    * corpus), then score every document by its log importance weight
    * λ(x) = Σ_feats [ln p̂_target(f) − ln p̂_raw(f)] and keep the top
    * of the ranking. Features are word bigrams hashed into 256 buckets
    * with the portable polynomial hash (HashFunctions.polyHash — the
    * same kernel the minhash stack verifies cross-engine), add-half
    * smoothing on both models.
    *
    * Determinism (SURVEY §4): each per-bucket log-ratio is r6-rounded,
    * per-doc sums run in DECIMAL, the final weight re-rounds to 1e-4
    * before the rank, ties break on doc_id.
    *
    * Scale: bucket counts are a 256-row broadcast; the per-doc score is
    * one hash-join of the exploded bigram table against that broadcast
    * + one per-doc aggregation; top-20 is TakeOrdered. The hashed-model
    * trick is exactly what makes DSIR run on a full crawl — model size
    * is O(buckets), never O(vocabulary). */
  def dsir(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFunctions
    val d = DecimalType(28, 6)
    val bib = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
        .as("bg"))
      .withColumn("bucket",
        HashFunctions.polyHashCol(col("bg"), HashFunctions.PolySeed,
          HashFunctions.PolyMul) % dsirBuckets)
    val bucketCnt = bib.groupBy("bucket").agg(
      count(lit(1)).as("c_raw"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_tgt"))
    val totals = bucketCnt.agg(
      sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))
    val half = dsirBuckets * 0.5
    val lw = expr(
      s"""(ln((CAST(c_tgt AS DOUBLE) + 0.5) / (CAST(n_tgt AS DOUBLE) + $half))
         | - ln((CAST(c_raw AS DOUBLE) + 0.5) / (CAST(n_raw AS DOUBLE) + $half)))""".stripMargin)
    val ratios = bucketCnt.crossJoin(broadcast(totals))
      .select(col("bucket"), r6(lw).as("lw"))
    bib.join(broadcast(ratios), "bucket")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feats"),
        r4(sum(col("lw").cast(d)).cast(DoubleType)).as("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(20)
  }

  private val dsirOracle = {
    import graft.functions.HashFunctions.polyHashSql
    val half = dsirBuckets * 0.5
    val lw = s"""(ln((CAST(c_tgt AS DOUBLE) + 0.5) / (CAST(n_tgt AS DOUBLE) + $half))
                | - ln((CAST(c_raw AS DOUBLE) + 0.5) / (CAST(n_raw AS DOUBLE) + $half)))""".stripMargin
    s"""WITH bib AS (
       |  SELECT doc_id, lang, (${polyHashSql("bg")}) % $dsirBuckets AS bucket FROM (
       |    SELECT doc_id, lang,
       |      unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
       |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
       |    FROM documents WHERE len(string_split(text, ' ')) >= 2)),
       |bc AS (
       |  SELECT bucket, COUNT(*) AS c_raw,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
       |  FROM bib GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw, CAST(SUM(c_tgt) AS BIGINT) AS n_tgt FROM bc),
       |ratios AS (
       |  SELECT bucket, ${rSql(lw, 6)} AS lw FROM bc CROSS JOIN tot)
       |SELECT doc_id, lang, COUNT(*) AS n_feats,
       |  ${rSql("CAST(SUM(CAST(lw AS DECIMAL(28,6))) AS DOUBLE)", 4)} AS logw
       |FROM bib JOIN ratios USING (bucket)
       |GROUP BY doc_id, lang
       |ORDER BY logw DESC, doc_id LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------ MRR / recall@k

  /** MRR + recall@k for the tf/dl ranker over the BM25 query terms —
    * the companion readout to q_ndcg: nDCG grades the whole top-10
    * ordering, MRR answers "how deep must a user scroll to the first
    * relevant hit", recall@k answers "how much of the relevant set the
    * cutoff keeps" (relevant = graded rel ≥ 2, the ndcg scale). The
    * top-10 per term comes through the native TopKPerGroup plan —
    * bounded heaps, no per-term sort — and the relevant-set totals are
    * one conditional aggregation over the same scored frame. */
  def mrr(spark: SparkSession, dir: String): DataFrame = {
    val scored = termScored(spark, dir)
    val w = Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))
    val top = graft.plans.TopK.topKPerGroup(scored, Seq("term"), "score", "doc_id", 10)
      .withColumn("pos", row_number().over(w))
    val nRel = scored.groupBy("term")
      .agg(sum(when(col("rel") >= 2, 1L).otherwise(0L)).as("n_rel"))
    top.groupBy("term").agg(
        min(when(col("rel") >= 2, col("pos").cast("long"))).as("first_rel"),
        sum(when(col("rel") >= 2 && col("pos") <= 5, 1L).otherwise(0L)).as("rel5"),
        sum(when(col("rel") >= 2, 1L).otherwise(0L)).as("rel10"))
      .join(nRel, Seq("term"))
      .select(col("term"), col("n_rel"), col("first_rel"),
        coalesce(r4(lit(1.0) / col("first_rel")), lit(0.0)).as("mrr"),
        r4(col("rel5") / when(col("n_rel") =!= 0, col("n_rel"))).as("recall_5"),
        r4(col("rel10") / when(col("n_rel") =!= 0, col("n_rel"))).as("recall_10"))
      .orderBy("term")
  }

  private val mrrOracle = {
    s"""WITH $termScoredSql,
       |ranked AS (
       |  SELECT term, rel,
       |    ROW_NUMBER() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS pos
       |  FROM scored),
       |top AS (
       |  SELECT term,
       |    MIN(CASE WHEN rel >= 2 THEN pos END) AS first_rel,
       |    CAST(COUNT(*) FILTER (WHERE rel >= 2 AND pos <= 5) AS BIGINT) AS rel5,
       |    CAST(COUNT(*) FILTER (WHERE rel >= 2) AS BIGINT) AS rel10
       |  FROM ranked WHERE pos <= 10 GROUP BY term),
       |nrel AS (
       |  SELECT term, CAST(COUNT(*) FILTER (WHERE rel >= 2) AS BIGINT) AS n_rel
       |  FROM scored GROUP BY term)
       |SELECT term, n_rel, first_rel,
       |  COALESCE(${rSql("(1.0 / first_rel)", 4)}, 0.0) AS mrr,
       |  ${rSql("(rel5 / NULLIF(n_rel, 0))", 4)} AS recall_5,
       |  ${rSql("(rel10 / NULLIF(n_rel, 0))", 4)} AS recall_10
       |FROM top JOIN nrel USING (term)
       |ORDER BY term""".stripMargin
  }

  // --------------------------------------------- negative-sampling table

  /** word2vec-style negative-sampling table: p_ns(w) ∝ count(w)^0.75
    * (Mikolov et al. 2013) — the unigram smoothing that up-weights rare
    * words as negatives during embedding training. The ¾ power is
    * computed as sqrt(c·sqrt(c)): sqrt and multiply are IEEE
    * correctly-rounded on every engine, where a libm pow() is only
    * 1-ulp-faithful — so the table is cross-engine exact without
    * rounding tricks. Top-20 by raw count with a total-order
    * tie-break; `boost` shows the rare-word up-weighting factor
    * p_ns/p_uni.
    *
    * Scale: one vocabulary-bounded aggregation + a one-row broadcast
    * totals frame + TakeOrdered — never a global sort. */
  def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 6)
    // uni feeds the totals frame AND the final projection — persist
    // the vocabulary-bounded frame so the corpus tokenizes once
    val uni = graft.CacheScope.track(Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .withColumn("w", r6(sqrt(col("c") * sqrt(col("c")))))
      .persist())
    val tot = uni.agg(sum("c").as("n_tok"),
      sum(col("w").cast(d)).cast(DoubleType).as("w_tot"))
    uni.crossJoin(broadcast(tot))
      .select(col("word"), col("c"),
        r6(col("c") / col("n_tok")).as("p_uni"),
        r6(col("w") / col("w_tot")).as("p_ns"),
        r4((col("w") / col("w_tot")) / (col("c") / col("n_tok"))).as("boost"))
      .orderBy(col("c").desc, col("word")).limit(20)
  }

  private val negativeSamplingOracle =
    s"""WITH uni AS (
       |  SELECT word, COUNT(*) AS c,
       |    ${rSql("sqrt(COUNT(*) * sqrt(COUNT(*)))", 6)} AS w
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY word),
       |tot AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS n_tok,
       |    CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS w_tot
       |  FROM uni)
       |SELECT word, c,
       |  ${rSql("(c / n_tok)", 6)} AS p_uni,
       |  ${rSql("(w / w_tot)", 6)} AS p_ns,
       |  ${rSql("((w / w_tot) / (c / n_tok))", 4)} AS boost
       |FROM uni, tot
       |ORDER BY c DESC, word LIMIT 20""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_bm25", bm25, Some(bm25Oracle)),
    Op("q_mrr", mrr, Some(mrrOracle)),
    Op("q_negative_sampling", negativeSampling, Some(negativeSamplingOracle)),
    Op("q_ndcg", ndcg, Some(ndcgOracle)),
    Op("q_dsir", dsir, Some(dsirOracle)),
    Op("q_tfidf", tfidf, Some(tfidfOracle)),
    Op("q_entropy", entropy, Some(entropyOracle)),
    Op("q_bpe_pairs", bpePairs, Some(bpePairsOracle)),
    Op("q_bpe_train", bpeTrain, Some(bpeTrainOracle), headline = true),
    Op("q_bpe_encode", bpeEncode, Some(bpeEncodeOracle)),
    Op("q_pmi", pmiCollocations, Some(pmiOracle)),
    Op("q_zipf", zipfFit, Some(zipfOracle)),
    Op("q_quality_classifier", qualityClassifier, Some(qualityClassifierOracle), headline = true),
    Op("q_calibration", calibration, Some(calibrationOracle)),
    Op("q_ngram_lm", ngramLm, Some(ngramLmOracle)),
    Op("q_ppl_filter", perplexityFilter, Some(perplexityFilterOracle)),
    Op("q_dedup_substring", dedupSubstring, Some(dedupSubstringOracle)),
    Op("q_domain_mix", domainMix, Some(domainMixOracle)),
    Op("q_c4_filters", c4Filters, Some(c4FiltersOracle)),
  )
}
