package graft

import org.apache.spark.sql.functions._

/** Throwaway profiler for q_dedup_minhash stage attribution (round-4
  * perf work; not part of the driver surface). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.HashFunctions

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = operators.Dedup.corpus(spark, dir)
    time("warmup corpus count")(docs.count())
    time("corpus scan (noop)")(force(docs))
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val sig = toks.select(col("doc_id"), HashFunctions.minhashSketch(col("toks")).as("sk"))
    time("sketch kernel (noop)")(force(sig))
    val bandStructs = (0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws(":", (0 until 4).map(r => col("sk").getItem(bnd * 4 + r)): _*).as("bucket"))
    }
    val bands = sig.select(col("doc_id"), col("sk").getItem(16).as("sz"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("sz"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.sz").as("sz_a"),
        col("b.doc_id").as("id_b"), col("b.sz").as("sz_b")).distinct()
    time("band self-join count")(println("cand=" + cand.count()))
    // NOTE: this un-persisted rebuild of the band join plans TWO
    // Exchanges and no ReusedExchange under AQE — i.e. the corpus
    // sketch kernel would run once per join side. That measurement is
    // why dedupMinhash persists + eagerly materializes `sig`.
    // full operator, 3 runs
    (1 to 3).foreach { i =>
      time(s"full dedupMinhash #$i") {
        force(operators.Dedup.dedupMinhash(spark, dir))
        CacheScope.releaseAll()
      }
    }
    spark.stop()
  }
}
