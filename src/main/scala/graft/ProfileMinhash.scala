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
    // the bench's forcing: noop-sink write + CacheScope release, ×3
    (1 to 3).foreach { i =>
      time(s"full write-forced #$i") {
        operators.Dedup.dedupMinhash(spark, dir)
          .write.format("noop").mode("overwrite").save()
        CacheScope.releaseAll()
      }
    }
    // attribution: candidate-build alone, WITHOUT persisting sig —
    // does ReuseExchange dedupe the self-join's two sketch scans?
    val sigNP = docs.select(col("doc_id"), HashFunctions.minhashSketch(col("toks")).as("sk"))
    val bandStructs = (0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws(":", (0 until 4).map(r => col("sk").getItem(bnd * 4 + r)): _*).as("bucket"))
    }
    val bands = sigNP.select(col("doc_id"), col("sk").getItem(16).as("sz"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("sz"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val candNP = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.sz").as("sz_a"),
        col("b.doc_id").as("id_b"), col("b.sz").as("sz_b")).distinct()
    (1 to 2).foreach { i => time(s"cand no-persist #$i")(candNP.count()) }
    candNP.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("ReusedExchange") || l.contains("Exchange"))
      .take(8).foreach(l => println("[prof-plan] " + l.trim.take(120)))
    // verify-phase attribution with cand cached
    val cand2 = candNP.persist(); cand2.count()
    val candIds = cand2.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val candShingles = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(HashFunctions.shingleHashes(col("toks"))).as("sh"))
    (1 to 2).foreach { i => time(s"candShingles #$i")(candShingles.count()) }
    val inter = cand2.select("id_a", "id_b")
      .join(candShingles.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(candShingles.as("sb"), col("id_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    (1 to 2).foreach { i => time(s"inter #$i")(inter.count()) }
    cand2.unpersist()
    spark.stop()
  }
}
