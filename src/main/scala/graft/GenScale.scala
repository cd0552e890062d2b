package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger scale factor from an existing driver
  * sf directory by unioning `copies` key-shifted images of every table
  * — one more decade of range for the bench's scaling block (the
  * driver generates sf0.001/0.01/0.1; the scale-exponent evidence
  * wants a 1000× span). NOT a correctness input: the oracle gates run
  * only on driver-generated data; this feeds timing runs alone.
  *
  * Shift discipline — the properties the headline plans are sensitive
  * to must scale the way a real 10× corpus would:
  *  - every key column shifts by copy · (max+1), so joins fan exactly
  *    as at the source scale (customer copies own their order copies);
  *  - events.user_id shifts by a multiple of 10 — the switchback zone
  *    assignment (user_id % 10) keeps its distribution;
  *  - events.ts stays the RAW int64 (unit untouched — Tables.events
  *    autodetects), so the time axis keeps its density: 10× rows in
  *    the same window, which is what a 10× traffic year looks like;
  *  - document TEXT is re-tokenized per copy (every token suffixed
  *    `_i`), so shingle/token sets are disjoint across copies: the
  *    dedup/minhash pair space scales linearly, as a real corpus does —
  *    verbatim copies would square the LSH bucket loads and measure a
  *    synthetic blowup, not the operator;
  *  - embeddings get a tiny per-copy first-component offset, breaking
  *    exact-tie degeneracy while preserving the cosine geometry.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(
      new java.io.File(sys.props("user.dir"), "testdata/sf1").getAbsolutePath)
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    def scaled(df: DataFrame, shifts: Map[String, Long])
        (xform: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, m)) =>
          d.withColumn(c, col(c) + lit(i * m))
        }
        xform(shifted, i)
      }.reduce(_ unionAll _)

    def write(df: DataFrame, name: String, nFiles: Int): Unit =
      df.repartition(nFiles).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    // dims that stay nation/region-shaped stay verbatim
    write(Tables.region(spark, src), "region", 1)
    write(Tables.nation(spark, src), "nation", 1)

    val cust = Tables.customer(spark, src)
    val ords = Tables.orders(spark, src)
    val prt = Tables.part(spark, src)
    val supp = Tables.supplier(spark, src)
    val li = Tables.lineitem(spark, src)
    val (mCust, mOrd, mPart, mSupp) = (maxOf(cust, "c_custkey"),
      maxOf(ords, "o_orderkey"), maxOf(prt, "p_partkey"), maxOf(supp, "s_suppkey"))
    write(scaled(cust, Map("c_custkey" -> mCust))(), "customer", 4)
    write(scaled(supp, Map("s_suppkey" -> mSupp))(), "supplier", 2)
    write(scaled(prt, Map("p_partkey" -> mPart))(), "part", 4)
    write(scaled(ords, Map("o_orderkey" -> mOrd, "o_custkey" -> mCust))(),
      "orders", 8)
    write(scaled(li, Map("l_orderkey" -> mOrd, "l_partkey" -> mPart,
      "l_suppkey" -> mSupp))(), "lineitem", 16)

    val ev = Tables.eventsRaw(spark, src)
    val mEvent = maxOf(ev, "event_id")
    val mUser = ((maxOf(ev, "user_id") + 9) / 10) * 10 // multiple of 10
    write(scaled(ev, Map("event_id" -> mEvent, "user_id" -> mUser))(),
      "events", 16)

    val docs = Tables.documents(spark, src)
    val mDoc = maxOf(docs, "doc_id")
    write(scaled(docs, Map("doc_id" -> mDoc)) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text",
          concat(regexp_replace(col("text"), " ", s"_$i "), lit(s"_$i")))
        .withColumn("n_chars", length(col("text")))
    }, "documents", 8)

    val emb = Tables.embeddings(spark, src)
    val mVec = maxOf(emb, "vec_id")
    write(scaled(emb, Map("vec_id" -> mVec)) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        expr(s"transform(embedding, (v, j) -> CASE WHEN j = 0 " +
          s"THEN CAST(v + $i * 0.013 AS FLOAT) ELSE v END)"))
    }, "embeddings", 8)

    println(s"""{"gen_scale":"$out","copies":$copies,"src":"$src"}""")
    spark.stop()
  }
}
