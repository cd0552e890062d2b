package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through [[SparkEntry]].
  *
  * @param name    query id (SURVEY.md §2)
  * @param fn      (session, tableDir) => result DataFrame
  * @param oracle  equivalent DuckDB SQL over the same parquet tables;
  *                None for ops whose semantics aren't portable SQL
  *                (hash-based sketches, RNG, binary payloads) — the
  *                driver then records a rows-only check.
  * @param headline included in the Bench headline set
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
)
