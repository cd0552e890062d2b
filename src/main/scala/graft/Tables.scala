package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central parquet table loaders for the graft engine.
  *
  * The engine is pointed at a directory of parquet tables (the driver's
  * TPC-H-ish synthetic set). All operators read through here so that
  * column pruning / predicate pushdown is applied uniformly at the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  /** `events.ts` has been written by the driver as parquet
    * TIMESTAMP(NANOS) in some data generations and TIMESTAMP(MICROS) in
    * others. NANOS Spark's TimestampType (µs) refuses outright, so the
    * column is read as its physical int64 (legacy nanos conf + explicit
    * LongType schema) and the unit decided by magnitude: ns-since-epoch
    * for any plausible event date is ~1e18, µs ~1e15 — 5e16 separates
    * them (a µs value that large would mean year ~3550; a ns value that
    * small, mid-1971). Per-row CASE so the check is codegen'd and a
    * mixed file would still convert correctly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // Scoped nanos handling: an explicit schema (ts as LONG) skips the
    // inference path, which would consult the SESSION conf; the reader
    // option lands in this relation's hadoop conf, which is what the
    // execution-time schema converter reads. No session-wide
    // spark.conf.set — later parquet reads in the session are untouched.
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // integer `div`, NOT `/`: ns-since-epoch (~1.7e18) exceeds a double's
    // 2^53 exact-integer range, so float division would round the tail.
    spark.read
      .schema(schema)
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts",
        expr("timestamp_micros(CASE WHEN ts > 50000000000000000 THEN ts div 1000 ELSE ts END)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
