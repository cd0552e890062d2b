package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Dev profiler for the r13 optimization round: interleaved same-JVM
  * A/B harness (the ProfileCC/ProfileMinhash discipline — cross-run
  * box contention on this sandbox swings multi-core wall-clock 1.3–2×
  * load-invisibly, so only interleaved variants are comparable) plus a
  * jobs/stages counter so every claim also has a structural reading.
  * Not part of the driver contract.
  *
  * Modes (arg 2+):
  *  - `stats`  — print Catalyst size estimates for the size-gated
  *               co-partition frames (which branch the gate takes).
  *  - `copart` — A/B the iterative graph/dedup queries with
  *               spark.graft.copartition.minBytes = default (gated)
  *               vs 0 (the r12 always-repartition shape).
  *  - `merge`  — A/B snapshotMerge's persisted merged frame (r13)
  *               vs the unpersisted r12 shape.
  *  - query names — timed runs with job/stage counts (like ProfileR12).
  *
  * Usage: runMain graft.tools.ProfileR13 [sfDir] [mode ...]
  */
object ProfileR13 {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val modes = if (args.length > 1) args.tail.toSeq else Seq("stats")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    var jobs = 0; var stagesN = 0; var tasksN = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stagesN += 1; tasksN += e.stageInfo.numTasks
      }
    })
    def counted[T](label: String)(f: => T): T = {
      jobs = 0; stagesN = 0; tasksN = 0
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(250)
      println(f"[r13] $label%-34s wall=$wall%7.3f s jobs=$jobs%3d stages=$stagesN%3d tasks=$tasksN%4d")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def runQ(n: String): Unit = {
      try force(graft.Registry.byName(n).fn(spark, sfDir))
      finally graft.CacheScope.releaseAll()
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.lineitem(spark, sfDir).count()
    graft.Tables.documents(spark, sfDir).count()

    if (modes.contains("stats")) {
      import graft.operators.Dedup
      def est(label: String, df: org.apache.spark.sql.DataFrame): Unit =
        println(s"[r13] stats $label sizeInBytes=" +
          df.queryExecution.optimizedPlan.stats.sizeInBytes)
      val e = graft.operators.Graph.rawEdges(spark, sfDir)
      est("pagerank edgesWithDeg", graft.operators.Graph.edgesWithDeg(spark, sfDir))
      est("khop edges", e.select(col("src"), col("dst")))
      est("lpa sym", e.select(col("src").as("u"), col("dst").as("w"))
        .unionAll(e.select(col("dst").as("u"), col("src").as("w"))).distinct())
      val pairs = Dedup.dedupNgram(spark, sfDir)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      est("cc sym (dedup pairs)", pairs.select(col("src"), col("dst"))
        .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst"))))
    }

    if (modes.contains("copart")) {
      val qs = Seq("q_pagerank", "q_dedup_clusters", "q_lpa", "q_khop")
      // untimed warmup of both variants
      qs.foreach { q =>
        spark.conf.set("spark.graft.copartition.minBytes", "0")
        runQ(q)
        spark.conf.unset("spark.graft.copartition.minBytes")
        runQ(q)
      }
      (1 to 3).foreach { i =>
        qs.foreach { q =>
          spark.conf.set("spark.graft.copartition.minBytes", "0")
          counted(s"$q r12-always #$i")(runQ(q))
          spark.conf.unset("spark.graft.copartition.minBytes")
          counted(s"$q r13-gated  #$i")(runQ(q))
        }
      }
    }

    if (modes.contains("merge")) {
      import graft.operators.{Maintenance, Relational}
      def staged[T](body: String => T): T = {
        val stage = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_r13m_${java.util.UUID.randomUUID().toString.take(8)}")
        try body(stage.getAbsolutePath)
        finally graft.sources.Sources.deleteRecursively(stage)
      }
      val o = graft.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      def changes = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("U").as("op"),
          lit("N").as("o_orderstatus"),
          (col("o_totalprice") + lit(100.0)).as("o_totalprice"))
      // A = shipped r13 snapshotMerge (persisted merged frame);
      // B = the r12 shape (commitSnapshot over the lazy merged frame,
      //     full-outer join recomputed by each shaper pass + the write)
      def variantA(): Unit = staged { p =>
        Maintenance.snapshotWrite(o, s"$p/t", nFiles = 8,
          statsCols = Seq("o_orderkey"), clusterBy = Some("o_orderkey"))
        counted("merge A r13-persisted")(
          Maintenance.snapshotMerge(spark, s"$p/t", changes, "o_orderkey", 8))
      }
      // exact replica of snapshotMerge MINUS the persist (the r12 shape):
      // same touched-file broadcast pruning, same mergeSchema read, same
      // carry and pinned-base commit — the only delta is the cache
      def variantB(): Unit = staged { p =>
        Maintenance.snapshotWrite(o, s"$p/t", nFiles = 8,
          statsCols = Seq("o_orderkey"), clusterBy = Some("o_orderkey"))
        counted("merge B r12-lazy     ") {
          val key = "o_orderkey"
          val mf = spark.read.parquet(f"$p%s/t/versions/v${1L}%05d")
          val touched = changes.select(col(key).as("__k")).distinct()
            .join(broadcast(mf.select(col("file"), col(s"min_$key"), col(s"max_$key"))),
              col("__k") >= col(s"min_$key") && col("__k") <= col(s"max_$key"))
            .select("file").distinct().collect().map(_.getString(0)).toSet
          val base = spark.read.option("mergeSchema", "true")
            .parquet(touched.toIndexedSeq.sorted.map(f => s"$p/t/data/$f"): _*)
          val merged = Relational.applyMerge(base, changes, key)
          val carry: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
            fresh => mf.filter(!col("file").isin(touched.toSeq: _*))
              .select("file", "n_rows", s"min_$key", s"max_$key").unionByName(fresh)
          Maintenance.commitSnapshot(merged, s"$p/t", 8, carry,
            Seq(key), Some(col(key)), Some(1L))
        }
      }
      variantA(); variantB() // warmup
      (1 to 3).foreach { _ => variantA(); variantB() }
    }

    if (modes.contains("minhash")) {
      // attribute the minhash regression: eager cand.count() vs letting
      // the candShingles job materialize both caches transitively
      import graft.operators.Dedup
      import graft.functions.HashFunctions
      def variant(eager: Boolean): Unit = {
        val cand = graft.CacheScope.track(
          Dedup.bandCandidates(Dedup.bandBuckets(Dedup.corpus(spark, sfDir))).persist())
        if (eager) cand.count(): Unit
        val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
        val candShingles = graft.CacheScope.track(
          Dedup.corpus(spark, sfDir).join(candIds, Seq("doc_id"), "left_semi")
            .select(col("doc_id"),
              HashFunctions.shingleHashes(split(col("text"), " ")).as("shs"))
            .persist())
        candShingles.count()
        val out = cand
          .join(candShingles.as("sa"), col("id_a") === col("sa.doc_id"))
          .join(candShingles.as("sb"), col("id_b") === col("sb.doc_id"))
          .withColumn("inter",
            size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("long"))
          .withColumn("jaccard", graft.functions.Compat.r4(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter"))))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
        try force(out) finally graft.CacheScope.releaseAll()
      }
      val k = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
      def combo(eager: Boolean, aqe: Boolean): Unit = {
        spark.conf.set(k, aqe.toString); variant(eager); spark.conf.unset(k)
      }
      combo(true, false); combo(false, true); runQ("q_dedup_minhash") // warmups
      (1 to 3).foreach { i =>
        spark.conf.set(k, "false")
        counted(s"minhash eager+fixed #$i")(variant(true))
        counted(s"minhash lazy+fixed  #$i")(variant(false))
        spark.conf.unset(k)
        counted(s"minhash registry    #$i")(runQ("q_dedup_minhash"))
        counted(s"gauge q_mwu         #$i")(runQ("q_mwu"))
      }
    }

    if (modes.contains("cachedcoalesce")) {
      // A/B spark.sql.optimizer.canChangeCachedPlanOutputPartitioning:
      // default false leaves every persisted frame at the raw
      // shuffle-partition count (32 locally) — each cache-reading stage
      // then schedules 32 tasks over KB-sized slices; true lets AQE
      // coalesce the cached plan's output like any other stage.
      val k = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
      val qs = Seq("q_dedup_minhash", "q_dedup_clusters", "q_sql_merge", "q_pagerank")
      qs.foreach { q =>
        spark.conf.set(k, "false"); runQ(q)
        spark.conf.set(k, "true"); runQ(q)
      }
      (1 to 3).foreach { i =>
        qs.foreach { q =>
          spark.conf.set(k, "false")
          counted(s"$q cachePart-fixed #$i")(runQ(q))
          spark.conf.set(k, "true")
          counted(s"$q cachePart-aqe   #$i")(runQ(q))
        }
      }
      spark.conf.unset(k)
    }

    val qnames = modes.filter(_.startsWith("q_"))
    if (qnames.nonEmpty) {
      qnames.foreach(runQ) // warmup
      (1 to 3).foreach { i => qnames.foreach(q => counted(s"$q #$i")(runQ(q))) }
    }

    spark.stop()
  }
}
