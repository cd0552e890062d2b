package graft

import org.apache.spark.sql.functions._

/** Throwaway profiler for q_dedup_minhash stage attribution (round-4
  * perf work; not part of the driver surface). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
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
    // NOTE (historical): this un-persisted band SELF-JOIN plans TWO
    // Exchanges and no ReusedExchange under AQE — the corpus sketch
    // kernel runs once per join side. That measurement first forced
    // dedupMinhash to persist + eagerly materialize `sig`; the r8
    // reshape (the "variant" below, now the shipped operator) removed
    // the self-join entirely — groupBy(bucket)+collect_list reads the
    // sketch stream exactly once, so neither persist nor eager count
    // survives.
    // full operator, 3 runs
    (1 to 3).foreach { i =>
      time(s"full dedupMinhash #$i") {
        force(operators.Dedup.dedupMinhash(spark, dir))
        CacheScope.releaseAll()
      }
    }

    // stage attribution of the CURRENT operator shape (replicated here;
    // keep in sync with Dedup.dedupMinhash when profiling a change)
    (1 to 2).foreach { i =>
      val docs2 = operators.Dedup.corpus(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val sig2 = docs2.select(col("doc_id"),
        HashFunctions.minhashSketch(col("toks")).as("sk")).persist()
      time(s"stage sig persist+count #$i")(sig2.count())
      val bandFolds = (0 until 4).map { bnd =>
        (0 until 4).foldLeft(lit(bnd.toLong): org.apache.spark.sql.Column)(
          (acc, r) => acc * 31L + col("sk").getItem(bnd * 4 + r))
      }
      val bands2 = sig2.select(col("doc_id"), col("sk").getItem(16).as("sz"),
        explode(array(bandFolds: _*)).as("bucket"))
        .filter(col("sz") > 0)
      val cand2 = bands2.as("a")
        .join(bands2.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("a.sz").as("sz_a"),
          col("b.doc_id").as("id_b"), col("b.sz").as("sz_b")).distinct().persist()
      time(s"stage cand persist+count #$i")(cand2.count())
      sig2.unpersist(blocking = false)
      val candIds2 = cand2.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
      val candSh2 = operators.Dedup.corpus(spark, dir)
        .join(candIds2, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), HashFunctions.shingleHashes(split(col("text"), " ")).as("shs"))
        .persist()
      time(s"stage candShingles count #$i")(candSh2.count())
      time(s"stage verify+order #$i") {
        force(cand2
          .join(candSh2.as("sa"), col("id_a") === col("sa.doc_id"))
          .join(candSh2.as("sb"), col("id_b") === col("sb.doc_id"))
          .withColumn("inter", size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long"))
          .withColumn("jaccard", graft.functions.Compat.r4(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter"))))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b"))
      }
      cand2.unpersist(blocking = false)
      candSh2.unpersist(blocking = false)
    }

    // variant: ONE pass — groupBy(bucket)+collect_list instead of the
    // band self-join (sig read once -> no persist, no eager count; one
    // exchange instead of two join sides; singleton buckets pruned
    // before pair expansion)
    (1 to 3).foreach { i =>
      val docs3 = operators.Dedup.corpus(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val sig3 = docs3.select(col("doc_id"),
        HashFunctions.minhashSketch(col("toks")).as("sk"))
      val bandFolds = (0 until 4).map { bnd =>
        (0 until 4).foldLeft(lit(bnd.toLong): org.apache.spark.sql.Column)(
          (acc, r) => acc * 31L + col("sk").getItem(bnd * 4 + r))
      }
      val bands3 = sig3.select(col("doc_id"), col("sk").getItem(16).as("sz"),
        explode(array(bandFolds: _*)).as("bucket"))
        .filter(col("sz") > 0)
      val cand3 = bands3
        .groupBy("bucket")
        .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("a.sz").as("sz_a"),
          col("b.doc_id").as("id_b"), col("b.sz").as("sz_b"))
        .distinct().persist()
      time(s"variant grouped cand count #$i")(println("cand3=" + cand3.count()))
      val candIds3 = cand3.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
      val candSh3 = operators.Dedup.corpus(spark, dir)
        .join(candIds3, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), HashFunctions.shingleHashes(split(col("text"), " ")).as("shs"))
        .persist()
      time(s"variant candShingles #$i")(candSh3.count())
      time(s"variant verify+order #$i") {
        force(cand3
          .join(candSh3.as("sa"), col("id_a") === col("sa.doc_id"))
          .join(candSh3.as("sb"), col("id_b") === col("sb.doc_id"))
          .withColumn("inter", size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long"))
          .withColumn("jaccard", graft.functions.Compat.r4(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter"))))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b"))
      }
      cand3.unpersist(blocking = false)
      candSh3.unpersist(blocking = false)
    }
    // A/B: is the candShingles persist+count worth it, or does exchange
    // reuse absorb the two join-side reads (both shuffle candShingles on
    // doc_id — identical exchange) the way AQE stage reuse absorbed the
    // ngram shingle copies?
    def verifyHalf(persistSh: Boolean): Unit = {
      val bands4 = operators.Dedup.bandBuckets(operators.Dedup.corpus(spark, dir))
      val cand4 = operators.Dedup.bandCandidates(bands4).persist()
      cand4.count()
      val candIds4 = cand4.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
      val sh0 = operators.Dedup.corpus(spark, dir)
        .join(candIds4, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), HashFunctions.shingleHashes(split(col("text"), " ")).as("shs"))
      val sh = if (persistSh) { val p = sh0.persist(); p.count(); p } else sh0
      force(cand4
        .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("id_b") === col("sb.doc_id"))
        .withColumn("inter", size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long"))
        .withColumn("jaccard", graft.functions.Compat.r4(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b"))
      cand4.unpersist(blocking = false)
      if (persistSh) sh.unpersist(blocking = false)
    }
    (1 to 3).foreach { i =>
      time(s"AB sh persisted   #$i")(verifyHalf(persistSh = true))
      time(s"AB sh lazy        #$i")(verifyHalf(persistSh = false))
    }
    spark.stop()
  }
}
