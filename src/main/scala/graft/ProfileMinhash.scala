package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q_dedup_minhash sub-stages (dev only).
  * All probes force evaluation via sums over computed columns —
  * count() alone lets Catalyst prune the interesting work away. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    spark.range(100).count()
    Tables.documents(spark, dir).count()

    import graft.functions.HashFunctions
    val d = Tables.documents(spark, dir)
    val base = d.select(col("doc_id"), col("text"))
    val corpus = base.unionAll(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val docs = corpus.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val sig = docs.select(col("doc_id"), HashFunctions.minhashSketch(col("toks")).as("sk"))
    (1 to 3).foreach { i =>
      time(s"sketch forced #$i")(sig.agg(sum(col("sk").getItem(0))).collect())
    }
    time("shingle explode+distinct") {
      docs.select(col("doc_id"), explode(
        expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
        .as("shingle")).distinct().count()
    }
    time("full (sig persisted)")(operators.Dedup.dedupMinhash(spark, dir).count())
    time("full again")(operators.Dedup.dedupMinhash(spark, dir).count())
    spark.stop()
  }
}
