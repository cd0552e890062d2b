package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * A shuffle join keyed on a skewed column puts a hot key's entire
  * volume on one task. [[saltedJoin]] splits every hot key `salts`
  * ways: the large side gets a random salt per row, the small side is
  * replicated once per salt value, and the join key becomes
  * (key, salt) — the hot key now spreads over `salts` tasks. AQE's
  * skew-join handles moderate skew automatically; salting is for the
  * pathological keys AQE can't split (e.g. a single null-like key
  * holding 30% of a 100 TB table).
  */
object Skew {
  /** Inner equi-join of `large ⋈ small` on `key`, salted `salts` ways.
    * `small` is replicated `salts`× — keep it dimension-sized.
    *
    * The salt is hash-derived from the large side's full row (NOT from
    * the key — every row of a hot key must land in a different bucket),
    * keeping the whole operator RNG-free: reruns and retries salt
    * identically. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
