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

  /** Text-quality features: length, token stats, stopword ratio, unique
    * ratio → a composite score, rolled up per score-decile. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = hitScore("en").cast("double") / nTok
    val avgTokLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    val score = r4(lit(0.4) * least(uniqRatio * 3, lit(1.0)) +
        lit(0.3) * least(stopRatio * 10, lit(1.0)) +
        lit(0.3) * least(avgTokLen / 8, lit(1.0)))
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
    val uniq = s"CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $nTok"
    val stop = s"CAST(${hitScoreSql("en")} AS DOUBLE) / $nTok"
    val avgLen = s"CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok"
    val score =
      s"(sign(0.4 * least($uniq * 3, 1.0) + 0.3 * least($stop * 10, 1.0) + 0.3 * least($avgLen / 8, 1.0)) * floor(abs(0.4 * least($uniq * 3, 1.0) + 0.3 * least($stop * 10, 1.0) + 0.3 * least($avgLen / 8, 1.0)) * 1e4 + 0.5) / 1e4)"
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

  val ops: Seq[Op] = Seq(
    Op("q_heavy_hitters", heavyHitters, Some(heavyHittersOracle)),
    Op("q_lang_id", langId, Some(langIdOracle)),
    Op("q_quality_score", qualityScore, Some(qualityScoreOracle)),
    Op("q_token_count", tokenCount, Some(tokenCountOracle), headline = true),
    Op("q_fingerprint", fingerprint, Some(fingerprintOracle)),
  )
}
