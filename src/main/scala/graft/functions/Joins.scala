package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reusable scale-safe join formulations. */
object Joins {

  /** Integer division of a (non-negative) long column by a constant,
    * via double floor — exact while the dividend < 2^53, i.e. for
    * microsecond timestamps until ~year 2255. */
  private def longDiv(c: Column, b: Long): Column =
    floor(c / lit(b.toDouble)).cast(LongType)

  /** Interval (range) join `facts.ts ∈ [start, end)` as an EQUI join.
    *
    * Spark's native plan for a non-equi join predicate is a broadcast
    * nested-loop join — O(|facts|·|intervals|) comparisons that die as
    * soon as the interval table stops being tiny. This formulation
    * expands each interval into the fixed-width time buckets it
    * overlaps (cost bounded by interval length / bucket width — pick
    * `bucketMicros` of the same order as typical interval length),
    * joins on the bucket as an ordinary shuffle/hash equi key, then
    * re-applies the exact range predicate as a residual filter. The
    * same grid trick as a spatial join; correct for ANY bucket width
    * because the residual keeps only true matches. Works at any table
    * size, partitions by time bucket.
    *
    * `facts` and `intervals` must have disjoint column names; the
    * result carries both sides' columns (the internal bucket column is
    * dropped). One fact row matches each interval it falls in.
    *
    * Used by TimeSeries.rangeJoin (promo windows); reuse for
    * attribution windows, geo dwell intervals, session overlap.
    */
  def bucketedRangeJoin(
      facts: DataFrame,
      intervals: DataFrame,
      tsCol: Column,
      startCol: Column,
      endCol: Column,
      bucketMicros: Long = 3600000000L): DataFrame = {
    val bucket = "__graft_range_bucket"
    // end-exclusive: the last covered bucket is (end−1) div B
    val expanded = intervals.withColumn(bucket,
      explode(sequence(longDiv(unix_micros(startCol), bucketMicros),
        longDiv(unix_micros(endCol) - 1, bucketMicros))))
    facts.withColumn(bucket, longDiv(unix_micros(tsCol), bucketMicros))
      .join(expanded, Seq(bucket))
      .filter(tsCol >= startCol && tsCol < endCol)
      .drop(bucket)
  }
}
