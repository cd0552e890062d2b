package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the shuffle killer for
  * "filter a huge fact table by a medium key set": build a bloom
  * filter over the dim keys (one distributed pass, mergeable sketch),
  * evaluate `might_contain` SCAN-LOCALLY on the fact side, and only
  * shuffle the survivors into the exact join. Shuffle volume becomes
  * ∝ matches (+ fpp·misses), not ∝ the fact table. No false
  * negatives, so an exact second phase keeps results identical to the
  * plain semi-join — the bloom is invisible in the output, which is
  * exactly how the oracle checks it.
  *
  * The filter itself ships as a plan literal (built by
  * `dim.stat.bloomFilter`, a distributed treeAggregate): right for
  * key sets up to a few million (100k keys @1% fpp ≈ 120 KB). For
  * dim sides too big to literal-ize, Spark's AQE runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) plans the same
  * shape automatically; this operator is the explicit, tunable form.
  *
  * `might_contain` evaluation reuses Spark's own codegen'd
  * [[BloomFilterMightContain]]; `stat.bloomFilter` puts raw longs and
  * `mightContainLong` probes raw longs — consistent hashing by
  * construction.
  */
object Bloom {

  /** A Column testing `key might-be-in dim[dimKey]`. */
  def mightContain(dim: DataFrame, dimKey: String, key: Column,
      expectedKeys: Long, fpp: Double): Column = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    Bridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      Bridge.expression(key)))
  }

  /** Two-phase exact semi-join: scan-local bloom pre-filter, then the
    * exact join on the survivors. Result set identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey), "left_semi")`. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val pre = fact.filter(
      mightContain(dim, dimKey, col(factKey), expectedKeys, fpp))
    // no distinct(): a left_semi join emits each surviving fact row
    // once regardless of build-side key multiplicity, so deduping the
    // dim side was a full shuffle+aggregate that could not change the
    // result
    pre.join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }
}
