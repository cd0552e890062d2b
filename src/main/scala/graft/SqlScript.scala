package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Flat multi-statement SQL script execution — the reference's whole
  * operational interface is BigQuery scripts (DECLARE + chained
  * CREATE OR REPLACE TABLE statements,
  * sql_queries/data_extraction_queries_automated_script.sql), fired
  * statement-by-statement from its DAG. This runner gives the same UX
  * over Spark SQL + the snapshot catalog:
  *
  * {{{
  *   SqlScript.run(spark, """
  *     DECLARE cutoff BIGINT DEFAULT 500;
  *     CREATE OR REPLACE TABLE lake.daily AS
  *       SELECT * FROM src WHERE k <= cutoff;   -- session variable
  *     SET VAR cutoff = 1000;
  *     SELECT COUNT(*) FROM lake.daily;
  *   """)
  * }}}
  *
  * Splitting respects string literals (`'…'` with `''` and backslash
  * escapes), quoted identifiers (`"…"`, backticks), and both comment
  * forms (`-- …`, `/* … */`); each statement runs through
  * `spark.sql`, so DECLARE/SET VAR land on Spark's native session
  * variables, DML lands on [[graft.plans.SnapshotDmlStrategy]], and
  * CREATE OR REPLACE lands on the staging catalog's
  * version-preserving replace. Returns every statement's result;
  * [[run]] returns the LAST one (the script's answer, BQ-script
  * convention). Purely driver-side orchestration — each statement's
  * execution is whatever Spark plans for it. */
object SqlScript {

  /** Split `script` into executable statements: comments stripped,
    * quoting respected, empty statements dropped. */
  private[graft] def split(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    val n = script.length
    // quote = the active string/identifier delimiter, 0 = none
    var quote: Char = 0
    while (i < n) {
      val c = script.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == '\\' && quote != '`' && i + 1 < n) {
          // backslash escape inside a string literal: consume the next
          // char verbatim so \' doesn't close the quote
          cur.append(script.charAt(i + 1)); i += 1
        } else if (c == quote) {
          if (i + 1 < n && script.charAt(i + 1) == quote) {
            cur.append(quote); i += 1 // doubled-delimiter escape ('' "" ``)
          } else quote = 0
        }
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; cur.append(c); i += 1
      } else if (c == '-' && i + 1 < n && script.charAt(i + 1) == '-') {
        while (i < n && script.charAt(i) != '\n') i += 1 // line comment
      } else if (c == '/' && i + 1 < n && script.charAt(i + 1) == '*') {
        val end = script.indexOf("*/", i + 2) // block comment
        i = if (end < 0) n else end + 2
      } else if (c == ';') {
        out += cur.toString; cur.clear(); i += 1
      } else {
        cur.append(c); i += 1
      }
    }
    require(quote == 0,
      s"unterminated ${if (quote == '`') "identifier" else "string"} in SQL script")
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Run every statement in order; return each result (commands yield
    * empty frames). */
  def runAll(spark: SparkSession, script: String): Seq[DataFrame] =
    split(script).map(spark.sql)

  /** Run the script; return the LAST statement's result. */
  def run(spark: SparkSession, script: String): DataFrame = {
    val results = runAll(spark, script)
    require(results.nonEmpty, "empty SQL script")
    results.last
  }
}
