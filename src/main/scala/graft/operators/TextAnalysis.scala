package graft.operators

import graft.{Op, Tables}
import graft.functions.Compat._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2 block C):
  * language ID, quality scoring, token counting, fingerprinting.
  * All pure per-row expressions → no shuffle until the final rollup;
  * trivially parallel at any scale.
  */
object TextAnalysis {

  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "de", "est"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "y", "de", "es"),
  )

  private def hitScore(lang: String): Column = {
    val lst = markers(lang).map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(split(text, ' '), t -> t IN ($lst)))")
  }

  private def hitScoreSql(lang: String): String = {
    val lst = markers(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> t IN ($lst)))"
  }

  /** Stopword-hit language ID vs the labelled `lang` column →
    * confusion-matrix rollup. (The test corpus is a synthetic
    * shared-vocabulary salad, so accuracy is meaningless here — the
    * operator mechanics are what is verified.) Ties and no-hits
    * resolve to 'und' (undetermined). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .withColumn("s_en", hitScore("en")).withColumn("s_fr", hitScore("fr"))
      .withColumn("s_de", hitScore("de")).withColumn("s_es", hitScore("es"))
    val best = greatest(col("s_en"), col("s_fr"), col("s_de"), col("s_es"))
    scored
      .withColumn("pred",
        when(best === 0, "und")
          .when(col("s_en") === best, "en") // priority order breaks ties
          .when(col("s_fr") === best, "fr")
          .when(col("s_de") === best, "de")
          .otherwise("es"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred")
  }

  private val langIdOracle = {
    val (en, fr, de, es) =
      (hitScoreSql("en"), hitScoreSql("fr"), hitScoreSql("de"), hitScoreSql("es"))
    s"""WITH scored AS (
       |  SELECT lang, $en AS s_en, $fr AS s_fr, $de AS s_de, $es AS s_es
       |  FROM documents),
       |pred AS (
       |  SELECT lang, CASE
       |    WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
       |    WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
       |    WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
       |    WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
       |    ELSE 'es' END AS pred
       |  FROM scored)
       |SELECT lang, pred, COUNT(*) AS n FROM pred GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin
  }

  /** The composite text-quality score on `text` (unique-token ratio,
    * stopword ratio, average token length — each saturated, weighted,
    * r4-rounded onto the decimal grid). Shared by [[qualityScore]] and
    * the [[corpusPipeline]] filter so the two can never drift. */
  private def qualityScoreExpr: Column = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = hitScore("en").cast("double") / nTok
    val avgTokLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    r4(lit(0.4) * least(uniqRatio * 3, lit(1.0)) +
      lit(0.3) * least(stopRatio * 10, lit(1.0)) +
      lit(0.3) * least(avgTokLen / 8, lit(1.0)))
  }

  /** DuckDB twin of [[qualityScoreExpr]]. */
  private val qualityScoreExprSql: String = {
    val nTok = "len(string_split(text, ' '))"
    val uniq = s"CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nTok"
    val stop = s"CAST(${hitScoreSql("en")} AS DOUBLE) / $nTok"
    val avgLen = s"CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok"
    s"(sign(0.4 * least($uniq * 3, 1.0) + 0.3 * least($stop * 10, 1.0) + 0.3 * least($avgLen / 8, 1.0)) * floor(abs(0.4 * least($uniq * 3, 1.0) + 0.3 * least($stop * 10, 1.0) + 0.3 * least($avgLen / 8, 1.0)) * 1e4 + 0.5) / 1e4)"
  }

  /** Text-quality features: length, token stats, stopword ratio, unique
    * ratio → a composite score, rolled up per score-decile. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val score = qualityScoreExpr
    Tables.documents(spark, dir)
      .select(floor(score * 10).as("score_decile"),
        col("n_chars"), nTok.as("n_tok"))
      .groupBy("score_decile")
      .agg(count(lit(1)).as("n_docs"),
        r2(avg(col("n_tok"))).as("avg_tokens"))
      .orderBy("score_decile")
  }

  private val qualityScoreOracle = {
    val nTok = "len(string_split(text, ' '))"
    val score = qualityScoreExprSql
    s"""SELECT CAST(FLOOR($score * 10) AS BIGINT) AS score_decile,
       |  COUNT(*) AS n_docs,
       |  (sign(AVG($nTok)) * floor(abs(AVG($nTok)) * 1e2 + 0.5) / 1e2) AS avg_tokens
       |FROM documents GROUP BY 1 ORDER BY score_decile""".stripMargin
  }

  /** Token counting per language: whitespace tokens plus a BPE-ish
    * subtoken count (⌈len/4⌉ pieces per token). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), size(split(col("text"), " ")).as("n_tok"),
        expr("aggregate(split(text, ' '), 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))")
          .as("n_subtok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("tokens"),
        sum("n_subtok").as("subtokens"),
        r4(avg(col("n_subtok").cast("double") / col("n_tok"))).as("subtok_per_tok"))
      .orderBy("lang")

  private val tokenCountOracle =
    """WITH t AS (
      |  SELECT lang, len(string_split(text, ' ')) AS n_tok,
      |    list_sum(list_transform(string_split(text, ' '),
      |      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS n_subtok
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |  CAST(SUM(n_subtok) AS BIGINT) AS subtokens,
      |  (sign(AVG(CAST(n_subtok AS DOUBLE) / n_tok)) * floor(abs(AVG(CAST(n_subtok AS DOUBLE) / n_tok)) * 1e4 + 0.5) / 1e4) AS subtok_per_tok
      |FROM t GROUP BY 1 ORDER BY lang""".stripMargin

  /** Polynomial rolling-hash document fingerprint (Karp-Rabin style)
    * over per-token codes, mod 2^31-1 — a portable pure-arithmetic
    * fold, so the oracle checks it exactly. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        expr("""aggregate(split(text, ' '), 0L,
                |  (acc, t) -> (acc * 31 + ascii(t) * 100 + length(t)) % 2147483647)""".stripMargin)
          .as("fingerprint"))
      .orderBy("doc_id")

  private val fingerprintOracle =
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ' '),
      |      t -> CAST(ascii(t) * 100 + length(t) AS BIGINT))),
      |    (acc, v) -> (acc * 31 + v) % 2147483647) AS fingerprint
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** Per-language heavy hitters through the custom SpaceSaving
    * aggregate ([[graft.functions.TopKAgg]]). Capacity (1024) far
    * exceeds the corpus vocabulary, so the sketch is exact here and the
    * plain count/row_number oracle applies; at real scale the same
    * query runs ε-approximate at fixed memory. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy("lang")
      .agg(graft.functions.TopKAgg.topkItems(col("word"), 5).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).as("rank"),
        col("col.item").as("word"), col("col.cnt").as("cnt"))
      .orderBy("lang", "rank")

  private val heavyHittersOracle =
    """SELECT lang, rank, word, cnt FROM (
      |  SELECT lang, word, COUNT(*) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS rank
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY lang, word)
      |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin

  /** Corpus term frequencies through the mergeable Count-Min sketch
    * aggregate ([[graft.functions.CmsAgg]]): ONE 1.5 KB sketch absorbs
    * the whole token stream (map-side partial merge = counter addition,
    * so the shuffle carries D·W counters per partition, not tokens),
    * then the exact top-10 tokens probe it. CM never undercounts and
    * overcounts by at most ‖stream‖/W per row — `cms_ge_exact` is the
    * driver-visible half of that contract.
    *
    * Unlike HLL/GK (rows-only), the sketch rows hash with the PORTABLE
    * polynomial hash, so the DuckDB oracle rebuilds the ENTIRE counter
    * grid as three GROUP BYs and replays the min-over-rows probe —
    * estimates match bit-for-bit, making this the sketch whose 100 TB
    * scale path is itself cross-engine verified. */
  def cmsFrequency(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsAgg
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val sk = toks.agg(CmsAgg.cms(col("word")).as("sk"))
    val top = toks.groupBy("word").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("word")).limit(10)
    val ests = (0 until CmsAgg.Depth).map(d =>
      element_at(col("sk"),
        (lit(d * CmsAgg.Width) + pmod(graft.functions.HashFunctions.polyHashCol(
          col("word"), CmsAgg.seeds(d), graft.functions.HashFunctions.PolyMul),
          lit(CmsAgg.Width.toLong))).cast("int") + 1))
    top.join(broadcast(sk))
      .withColumn("n_cms", least(ests: _*))
      .select(col("word"), col("n_exact"), col("n_cms"),
        (col("n_cms") >= col("n_exact")).as("cms_ge_exact"))
      .orderBy(col("n_exact").desc, col("word"))
  }

  private val cmsFrequencyOracle = {
    import graft.functions.CmsAgg
    val b = (d: Int) => CmsAgg.bucketSql("word", d)
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |tb AS (
       |  SELECT word, ${b(0)} AS b0, ${b(1)} AS b1, ${b(2)} AS b2 FROM toks),
       |c0 AS (SELECT b0 AS b, COUNT(*) AS n FROM tb GROUP BY 1),
       |c1 AS (SELECT b1 AS b, COUNT(*) AS n FROM tb GROUP BY 1),
       |c2 AS (SELECT b2 AS b, COUNT(*) AS n FROM tb GROUP BY 1),
       |top AS (
       |  SELECT word, COUNT(*) AS n_exact, MIN(b0) AS b0, MIN(b1) AS b1, MIN(b2) AS b2
       |  FROM tb GROUP BY word ORDER BY n_exact DESC, word LIMIT 10)
       |SELECT top.word, top.n_exact,
       |  LEAST(c0.n, c1.n, c2.n) AS n_cms,
       |  (LEAST(c0.n, c1.n, c2.n) >= top.n_exact) AS cms_ge_exact
       |FROM top
       |JOIN c0 ON top.b0 = c0.b
       |JOIN c1 ON top.b1 = c1.b
       |JOIN c2 ON top.b2 = c2.b
       |ORDER BY top.n_exact DESC, top.word""".stripMargin
  }

  /** Benchmark decontamination — the training-data pass that flags
    * documents sharing any verbatim word-8-gram with an evaluation set.
    * The "leaked" eval set here is a re-keyed copy of every 25th doc
    * (verbatim contamination), so the operator must recover exactly
    * those documents with full overlap.
    *
    * Scale: the eval side is benchmark-sized (small) — its distinct
    * 8-gram set joins against scan-local train-doc grams; AQE
    * broadcasts it. Train grams are exploded once, never collected. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), ' '))"))
          .as("gram")).distinct()
    val train = grams(Tables.documents(spark, dir))
    // only the eval GRAM SET matters (doc identity is dropped before
    // the join), so no re-keying of eval ids is needed
    val eval8 = grams(Tables.documents(spark, dir)
        .filter(col("doc_id") % 25 === 0))
      .select(col("gram")).distinct()
    train.join(eval8, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_8grams"))
      .orderBy("doc_id")
  }

  private val decontaminateOracle =
    """WITH tr AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 7),
      |      i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS gram
      |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
      |ev AS (
      |  SELECT DISTINCT
      |    unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 7),
      |      i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS gram
      |  FROM documents WHERE doc_id % 25 = 0 AND len(string_split(text, ' ')) >= 8)
      |SELECT doc_id, COUNT(*) AS n_shared_8grams
      |FROM tr JOIN ev USING (gram)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Within-document repetition profile (quality filtering): per
    * sampled doc, word-trigram totals, distinct ratio, and the most
    * repeated trigram's count — the features behind "drop docs that
    * repeat themselves" filters. */
  def repetitionProfile(spark: SparkSession, dir: String): DataFrame = {
    val tri = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> array_join(slice(toks, i, 3), ' '))"))
        .as("gram"))
    tri.groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max("cnt").as("max_repeat"),
        r4(count(lit(1)).cast("double") / sum("cnt")).as("distinct_ratio"))
      .orderBy("doc_id")
  }

  private val repetitionProfileOracle =
    """WITH tri AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS gram
      |  FROM documents WHERE doc_id % 10 = 0 AND len(string_split(text, ' ')) >= 3),
      |counts AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM tri GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
      |  COUNT(*) AS n_distinct, CAST(MAX(cnt) AS BIGINT) AS max_repeat,
      |  (sign(CAST(COUNT(*) AS DOUBLE) / SUM(cnt)) * floor(abs(CAST(COUNT(*) AS DOUBLE) / SUM(cnt)) * 1e4 + 0.5) / 1e4) AS distinct_ratio
      |FROM counts GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** PII scrubbing: regex-redact emails and 10-digit phone numbers,
    * reporting redaction counts and size deltas. PII is planted
    * deterministically on every 7th doc so both engines scrub the same
    * rows. Pure per-row regexes → scan-local at any scale. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    // [.] not \. — Spark's SQL string literals eat lone backslashes,
    // DuckDB's don't; the character class reads identically in both
    val emailPat = "[a-z0-9]+@[a-z]+[.]com"
    val phonePat = "[0-9]{10}"
    val salted = Tables.documents(spark, dir)
      .withColumn("text2", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact: user"), col("doc_id"),
          lit("@example.com code 4155551234"))).otherwise(col("text")))
    salted
      .withColumn("n_emails", size(expr(s"regexp_extract_all(text2, '$emailPat', 0)")))
      .withColumn("n_phones", size(expr(s"regexp_extract_all(text2, '$phonePat', 0)")))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text2"), emailPat, "<EMAIL>"), phonePat, "<PHONE>"))
      .groupBy((col("n_emails") + col("n_phones")).as("n_redactions"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text2")) - length(col("redacted"))).as("chars_removed"))
      .orderBy("n_redactions")
  }

  private val piiScrubOracle =
    """WITH salted AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
      |    THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com code 4155551234'
      |    ELSE text END AS text2
      |  FROM documents),
      |scrubbed AS (
      |  SELECT len(regexp_extract_all(text2, '[a-z0-9]+@[a-z]+[.]com', 0)) AS n_emails,
      |    len(regexp_extract_all(text2, '[0-9]{10}', 0)) AS n_phones,
      |    length(text2) AS len_before,
      |    length(regexp_replace(regexp_replace(text2, '[a-z0-9]+@[a-z]+[.]com', '<EMAIL>', 'g'), '[0-9]{10}', '<PHONE>', 'g')) AS len_after
      |  FROM salted)
      |SELECT (n_emails + n_phones) AS n_redactions, COUNT(*) AS n_docs,
      |  CAST(SUM(len_before - len_after) AS BIGINT) AS chars_removed
      |FROM scrubbed GROUP BY 1 ORDER BY n_redactions""".stripMargin

  /** Token-budget batch packing — group documents into ≈`budget`-token
    * bins for training-batch construction. True first-fit bin packing
    * is sequential; the scalable formulation packs WITHIN power-of-two
    * length classes (docs in one class have near-equal length, so
    * greedy order-fill is near-optimal there), where each class is an
    * independent window partition: lc = bit-length of the BPE-ish
    * subtoken count, bin = exclusive-running-token-sum div budget.
    * All-integer arithmetic → oracle hash-exact.
    *
    * Scale: one scan-local token count, then cumulative sums
    * partitioned by length class — no global sort; class cardinality
    * (~20) bounds skew and each partition's window is a linear pass. */
  def packBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("aggregate(split(text, ' '), 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))")
          .as("n_subtok"))
      .withColumn("lc", length(expr("bin(n_subtok)")).cast("long"))
    val w = Window.partitionBy("lc").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum", coalesce(sum("n_subtok").over(w), lit(0L)))
      .withColumn("bin", expr(s"cum div $budget"))
      .groupBy("lc", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_subtok").as("bin_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lc", "bin")
  }

  private val packBudgetOracle =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(string_split(text, ' '),
      |      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subtok
      |  FROM documents),
      |c AS (SELECT doc_id, n_subtok, CAST(length(bin(n_subtok)) AS BIGINT) AS lc FROM d),
      |s AS (
      |  SELECT doc_id, n_subtok, lc,
      |    CAST(COALESCE(SUM(n_subtok) OVER (PARTITION BY lc ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
      |  FROM c)
      |SELECT lc, cum // 2048 AS bin, COUNT(*) AS n_docs,
      |  CAST(SUM(n_subtok) AS BIGINT) AS bin_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM s GROUP BY 1, 2 ORDER BY lc, bin""".stripMargin

  // -------------------------------------------------------- RAG chunking

  private val chunkSize = 64
  private val chunkStride = 48

  /** Sliding-window document chunking — the context-window prep pass of
    * retrieval/RAG pipelines and long-context training: each document
    * splits into 64-token chunks at stride 48 (16-token overlap so no
    * boundary sentence is lost), the final chunk keeping whatever
    * remains. Emits per chunk its token offset/length, character
    * length, and a portable polynomial fingerprint of the chunk text —
    * the join key a downstream embedding/dedup stage would use.
    *
    * Chunk count for n tokens: 1 if n ≤ 64 else ⌈(n−64)/48⌉ + 1 — all
    * integer arithmetic, identical in the oracle.
    *
    * Scale: pure scan-local explode (zero shuffles, no window) — the
    * per-doc chunk fan-out is data-parallel by construction; the final
    * orderBy exists only for the deterministic dump and would be absent
    * in a pipeline stage. */
  def ragChunk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFunctions
    val C = chunkSize; val S = chunkStride
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_tok") <= C, 1L)
          .otherwise(expr(s"(n_tok - $C + ${S - 1}) div $S") + 1L))
      .withColumn("chunk_idx", explode(expr("sequence(0L, n_chunks - 1)")))
      .withColumn("tok_start", col("chunk_idx") * S)
      .withColumn("tok_len", least(lit(C.toLong), col("n_tok") - col("tok_start")))
      .withColumn("chunk_text",
        expr("array_join(slice(toks, CAST(tok_start + 1 AS INT), CAST(tok_len AS INT)), ' ')"))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"), col("tok_len"),
        length(col("chunk_text")).cast("long").as("chunk_chars"),
        HashFunctions.polyHashCol(col("chunk_text"),
          HashFunctions.PolySeed, HashFunctions.PolyMul).as("fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Shared oracle CTE chain: per-doc token lists → chunk fan-out →
    * per-chunk offsets + fingerprint (mirrors [[ragChunk]] exactly). */
  private val ragChunkCtes: String = {
    import graft.functions.HashFunctions.polyHashSql
    val C = chunkSize; val S = chunkStride
    val chunkText =
      s"array_to_string(toks[CAST(chunk_idx * $S + 1 AS INT):CAST(chunk_idx * $S + LEAST($C, n_tok - chunk_idx * $S) AS INT)], ' ')"
    s"""t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks, n_tok,
       |    CASE WHEN n_tok <= $C THEN 1
       |         ELSE (n_tok - $C + ${S - 1}) // $S + 1 END AS n_chunks
       |  FROM t),
       |x AS (
       |  SELECT doc_id, toks, n_tok,
       |    CAST(unnest(generate_series(0, n_chunks - 1)) AS BIGINT) AS chunk_idx
       |  FROM c),
       |chunks AS (
       |  SELECT doc_id, chunk_idx,
       |    chunk_idx * $S AS tok_start,
       |    LEAST($C, n_tok - chunk_idx * $S) AS tok_len,
       |    CAST(length($chunkText) AS BIGINT) AS chunk_chars,
       |    ${polyHashSql(chunkText)} AS fp
       |  FROM x)""".stripMargin
  }

  private val ragChunkOracle =
    s"""WITH $ragChunkCtes
       |SELECT doc_id, chunk_idx, tok_start, tok_len, chunk_chars, fp
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  /** Chunk-granularity deduplication: a chunk is boilerplate when its
    * fingerprint appears in MORE THAN ONE distinct document — the
    * finer-grained dedup pass run after doc-level dedup (headers,
    * licence blocks and templated sections repeat across documents
    * whose full texts differ). Per-source rollup: chunk count,
    * cross-doc duplicate chunks, duplicate ratio.
    *
    * Scale: the fingerprint spine is already computed by the chunking
    * pass; dup detection is one groupBy(fp) over 8-byte keys (the
    * smallest possible shuffle for this decision) joined back AQE-
    * sized. No text moves after chunking. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = ragChunk(spark, dir)
      .select(col("doc_id"), col("fp"))
    val byFp = chunks.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("nd"))
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    chunks.join(byFp, "fp").join(src, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_ratio",
        r4(col("n_dup_chunks").cast("double") / col("n_chunks")))
      .orderBy("source")
  }

  private val chunkDedupOracle =
    s"""WITH $ragChunkCtes,
       |byfp AS (
       |  SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY fp)
       |SELECT d.source, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  ${graft.functions.Compat.rSql("(CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))", 4)} AS dup_ratio
       |FROM chunks ch
       |JOIN byfp ON ch.fp = byfp.fp
       |JOIN documents d ON ch.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Unicode canonicalization over the corpus through the native
    * [[graft.functions.NfcNormExpr]] kernel (NFC compose + control
    * strip + whitespace collapse — Spark itself has no NFC builtin).
    * The query injects a deterministic mess around every document —
    * a combining-acute sequence (NFC must compose it), a C0 control
    * (must vanish without a space), tabs and double spaces (must
    * collapse), and flanking whitespace (must trim) — so the kernel's
    * entire contract is exercised and hash-checked on EVERY row, even
    * though the synthetic corpus text is clean ASCII. Scan-local
    * per-row expression inside whole-stage codegen; zero shuffles
    * before the output sort. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextNorm.textNorm
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        textNorm(concat(lit("  e\u0301\u0001\t "), col("text"), lit(" \t x  ")))
          .as("norm"))
      .orderBy("doc_id")
  }

  private val textNormalizeOracle =
    """SELECT doc_id, trim(regexp_replace(regexp_replace(
      |    nfc_normalize('  e' || chr(769) || chr(1) || chr(9) || ' ' || text || ' ' || chr(9) || ' x  '),
      |    '[\x00-\x08\x0B\x0E-\x1F\x7F-\x9F]', '', 'g'),
      |  '[ \t\n\f\r]+', ' ', 'g')) AS norm
      |FROM documents ORDER BY doc_id""".stripMargin

  /** URL canonicalization — the key-normalization step in front of any
    * web-corpus dedup (two crawls of one page must map to one key
    * before exact/minhash dedup can see them as duplicates). Rules:
    * lowercase scheme+host, strip a leading `www.`, strip the scheme's
    * default port (443/https, 80/http) but keep explicit non-default
    * ports, drop the fragment, drop `utm_*` tracking params, and sort
    * the surviving params so parameter order never splits a key.
    *
    * The corpus has no URL column, so the query synthesizes a
    * deterministic adversarial URL per doc_id — mixed-case scheme/host,
    * default and non-default ports, tracking params out of order,
    * fragments — and the whole contract is hash-checked on every row
    * (the q_text_norm discipline). Scan-local per-row string work
    * inside whole-stage codegen; zero shuffles before the output sort. */
  def urlNormalize(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val url = concat(
      when(d % 2 === 0, lit("HTTPS")).otherwise(lit("http")), lit("://"),
      lit("WWW.Example"), (d % 7).cast("string"), lit(".COM"),
      when(d % 3 === 0, when(d % 2 === 0, lit(":443")).otherwise(lit(":80")))
        .when(d % 3 === 1, lit(":8080")).otherwise(lit("")),
      lit("/Cat/item"), d.cast("string"),
      when(d % 4 === 0, lit("")).otherwise(
        concat(lit("?utm_source=feed&b="), (d % 5).cast("string"),
          lit("&utm_campaign=x&a=1"))),
      when(d % 2 === 1, lit("#Sec2")).otherwise(lit("")))
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = regexp_replace(
      lower(regexp_extract(hostport, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(hostport, ":(\\d+)$", 1)
    val keepPort = when(port === "", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      x => x =!= "" && substring(x, 1, 4) =!= "utm_")
    val q = array_join(array_sort(params), "&")
    Tables.documents(spark, dir)
      .select(d, url.as("url"),
        concat(scheme, lit("://"), host, keepPort, path,
          when(q === "", lit("")).otherwise(concat(lit("?"), q))).as("canon"))
      .orderBy("doc_id")
  }

  private val urlNormalizeOracle =
    """WITH urls AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
      |    || '://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
      |    || (CASE WHEN doc_id % 3 = 0
      |              THEN (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
      |             WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
      |    || '/Cat/item' || CAST(doc_id AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN ''
      |             ELSE '?utm_source=feed&b=' || CAST(doc_id % 5 AS VARCHAR)
      |                  || '&utm_campaign=x&a=1' END)
      |    || (CASE WHEN doc_id % 2 = 1 THEN '#Sec2' ELSE '' END) AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
      |    regexp_extract(url, '\?([^#]*)', 1) AS query
      |  FROM urls),
      |built AS (
      |  SELECT doc_id, url, scheme,
      |    regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)), '^www\.', '') AS host,
      |    regexp_extract(hostport, ':(\d+)$', 1) AS port,
      |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) AS path,
      |    COALESCE(array_to_string(list_sort(list_filter(string_split(query, '&'),
      |      x -> x <> '' AND substr(x, 1, 4) <> 'utm_')), '&'), '') AS q
      |  FROM parts)
      |SELECT doc_id, url,
      |  scheme || '://' || host
      |  || (CASE WHEN port = '' THEN ''
      |           WHEN scheme = 'https' AND port = '443' THEN ''
      |           WHEN scheme = 'http' AND port = '80' THEN ''
      |           ELSE ':' || port END)
      |  || path || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canon
      |FROM built ORDER BY doc_id""".stripMargin

  /** The corpus-curation funnel end-to-end — block C's flagship, the
    * training-data sibling of q_sb_pipeline's switchback DAG: raw crawl
    * (documents plus the re-crawled copies every 10th doc contributes —
    * the [[Dedup.dedupExact]] corpus) → exact dedup on the content
    * digest (keep lowest doc_id; one shuffle on the 128-bit hash,
    * perfectly spread at any scale) → quality filter at score ≥ 0.7 on
    * the SHARED [[qualityScoreExpr]] → per-source funnel rollup: raw
    * count, dedup drops, quality drops, kept docs, kept whitespace
    * tokens. Re-crawled copies hash-equal their originals, so the
    * min-id survivor is always the original — the survivor set needs
    * no special casing downstream.
    *
    * Scale: ONE digest groupBy over the crawl (the dominant shuffle —
    * it moves (digest, doc_id) pairs, never text), one semi-join of
    * documents against the survivor ids, and two per-source hash
    * aggregations. The raw per-source counts need no join at all: the
    * copy multiplicity is a pure function of doc_id, so the rollup is
    * a single scan-aggregation of documents. Because every survivor is
    * an ORIGINAL id, the semi-join's probe side is documents itself —
    * the union never appears above the digest aggregation, so the
    * optimizer cannot duplicate it through join pushdown (the naive
    * crawl-side semi-join plan computed the digest shuffle TWICE). All
    * per-row work (md5, score, token count) is scan-local in codegen. */
  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val crawl = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val keep = crawl.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
    val surv = docs.select(col("doc_id"), col("source"), col("text"))
      .join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      .withColumn("score", qualityScoreExpr)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val raw = docs.groupBy("source").agg(
      (count(lit(1)) +
        sum(when(col("doc_id") % 10 === 0, 1L).otherwise(0L))).as("n_raw"))
    val funnel = surv.groupBy("source").agg(
      count(lit(1)).as("n_unique"),
      sum(when(col("score") >= 0.7, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("score") >= 0.7, col("n_tok")).otherwise(0L)).as("tokens_kept"))
    raw.join(funnel, Seq("source"))
      .select(col("source"), col("n_raw"),
        (col("n_raw") - col("n_unique")).as("n_dedup_dropped"),
        (col("n_unique") - col("n_kept")).as("n_quality_dropped"),
        col("n_kept"), col("tokens_kept"))
      .orderBy("source")
  }

  private val corpusPipelineOracle =
    s"""WITH crawl AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |keep AS (
       |  SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM crawl GROUP BY 1),
       |surv AS (
       |  SELECT d.doc_id, d.source,
       |    $qualityScoreExprSql AS score,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM keep)),
       |raw AS (
       |  SELECT source, CAST(COUNT(*) +
       |    SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_raw
       |  FROM documents GROUP BY 1),
       |funnel AS (
       |  SELECT source, COUNT(*) AS n_unique,
       |    CAST(SUM(CASE WHEN score >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(SUM(CASE WHEN score >= 0.7 THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
       |  FROM surv GROUP BY 1)
       |SELECT r.source, r.n_raw,
       |  r.n_raw - f.n_unique AS n_dedup_dropped,
       |  f.n_unique - f.n_kept AS n_quality_dropped,
       |  f.n_kept, f.tokens_kept
       |FROM raw r JOIN funnel f ON r.source = f.source
       |ORDER BY r.source""".stripMargin

  /** The corpus funnel run INCREMENTALLY — five "daily" crawls
    * processed in order, each day exact-deduped first within its own
    * batch and then against the accumulated seen-hash state, never
    * against raw history (the O(day) ingest contract; re-crawled
    * copies deliberately arrive one day AFTER their originals — capped
    * at day 4, where the copy lands same-day — so the cross-day path
    * does real work in the stated direction). The per-day readout is (raw,
    * newly kept, dropped-as-duplicate). The oracle is the BATCH
    * formulation — first-seen = min (day, doc_id) per content hash —
    * so the gate hash-checks the central incremental-ingest theorem:
    * day-by-day processing with carried state must equal the one-shot
    * batch dedup exactly.
    *
    * Scale: per day, one within-batch digest aggregation + one
    * anti-join against the seen-hash table (at 100 TB that table is a
    * bucketed/persisted index — [[Dedup.appendToMinhashIndex]] is the
    * near-dup sibling with real artifacts); the seen state carries
    * (hash) only, never text, and each round persists it so lineage
    * stays flat across days. */
  def corpusIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // day = least(doc_id mod 5 + crawl-generation, 4): originals spread
    // over days 0-4, each copy lands the day AFTER its original (capped
    // at day 4, so a copy of a day-4 original arrives the same day and
    // exercises the within-batch path instead; a mod-5 wrap would land
    // those copies on day 0 BEFORE their originals, inverting the
    // cross-day direction the comment promises).
    // persist once: each day's loop body reads the crawl twice (digest
    // dedup + raw count), so an unpersisted plan would re-scan and
    // re-hash the full corpus ~10× inside the one final job
    val crawl = graft.CacheScope.track(docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .withColumn("day",
        least((col("doc_id") % 5) + expr("doc_id div 1000000"), lit(4L)))
      .withColumn("h", md5(col("text")))
      .persist())
    var seen: DataFrame = null
    val days = (0L to 4L).map { d =>
      val batch = crawl.filter(col("day") === d)
      val inBatch = batch.groupBy("h").agg(min("doc_id").as("keep_id"))
      val fresh =
        if (seen == null) inBatch
        else inBatch.join(seen, Seq("h"), "left_anti")
      val freshP = graft.CacheScope.track(fresh.persist())
      seen =
        if (seen == null) freshP.select("h")
        else graft.CacheScope.track(
          seen.unionByName(freshP.select("h")).persist())
      batch.agg(count(lit(1)).as("n_raw"))
        .crossJoin(freshP.agg(count(lit(1)).as("n_new")))
        .select(lit(d).as("day"), col("n_raw"), col("n_new"),
          (col("n_raw") - col("n_new")).as("n_dup_dropped"))
    }
    days.reduce(_ unionByName _).orderBy("day")
  }

  private val corpusIncrementalOracle =
    """WITH crawl AS (
      |  SELECT doc_id, text,
      |    least((doc_id % 5) + (doc_id // 1000000), 4) AS day,
      |    md5(text) AS h
      |  FROM (SELECT doc_id, text FROM documents
      |        UNION ALL
      |        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)),
      |firstday AS (SELECT h, MIN(day) AS d0 FROM crawl GROUP BY 1),
      |raw AS (SELECT day, COUNT(*) AS n_raw FROM crawl GROUP BY 1),
      |fresh AS (
      |  SELECT f.d0 AS day, COUNT(*) AS n_new
      |  FROM firstday f GROUP BY 1)
      |SELECT r.day, r.n_raw, COALESCE(f.n_new, 0) AS n_new,
      |  r.n_raw - COALESCE(f.n_new, 0) AS n_dup_dropped
      |FROM raw r LEFT JOIN fresh f ON r.day = f.day
      |ORDER BY r.day""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_corpus_pipeline", corpusPipeline, Some(corpusPipelineOracle),
      headline = true),
    Op("q_corpus_incremental", corpusIncremental, Some(corpusIncrementalOracle)),
    Op("q_url_norm", urlNormalize, Some(urlNormalizeOracle)),
    Op("q_text_norm", textNormalize, Some(textNormalizeOracle)),
    Op("q_pack_budget", packBudget, Some(packBudgetOracle)),
    Op("q_rag_chunk", ragChunk, Some(ragChunkOracle)),
    Op("q_chunk_dedup", chunkDedup, Some(chunkDedupOracle)),
    Op("q_heavy_hitters", heavyHitters, Some(heavyHittersOracle)),
    Op("q_cms", cmsFrequency, Some(cmsFrequencyOracle)),
    Op("q_lang_id", langId, Some(langIdOracle)),
    Op("q_quality_score", qualityScore, Some(qualityScoreOracle)),
    Op("q_token_count", tokenCount, Some(tokenCountOracle), headline = true),
    Op("q_fingerprint", fingerprint, Some(fingerprintOracle)),
    Op("q_decontam", decontaminate, Some(decontaminateOracle)),
    Op("q_repetition", repetitionProfile, Some(repetitionProfileOracle)),
    Op("q_pii_scrub", piiScrub, Some(piiScrubOracle)),
  )
}
