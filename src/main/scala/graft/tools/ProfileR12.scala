package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Dev profiler for the r12 optimization round: runs named queries
  * (default: the bench headliners) under a SparkListener that
  * attributes wall-clock to jobs and stages — job count, per-stage
  * task time, shuffle bytes — so the expensive queries' cost is
  * empirically located (guide §1.1) without the Spark UI (disabled in
  * the bench session shape). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.ProfileR12 [sfDir] [queryName ...]
  */
object ProfileR12 {

  private final case class StageRow(name: String, tasks: Int,
      runMs: Long, cpuMs: Long, shufReadMB: Double, shufWriteMB: Double,
      inputMB: Double, wallMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else graft.Registry.ops.filter(_.headline).map(_.name)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // diagnostic conf overrides: -Dprofile.conf=key=value,key=value
    sys.props.get("profile.conf").toSeq.flatMap(_.split(',')).foreach { kv =>
      val Array(k, v) = kv.split("=", 2) // conf values may contain '='
      spark.conf.set(k, v)
      println(s"[profile] conf override: $k=$v")
    }

    val stages = mutable.Buffer[StageRow]()
    val jobs = mutable.Buffer[(Int, Long)]() // jobId, wallMs
    val jobSpans = mutable.Buffer[(Long, Long)]() // startT, endT
    val jobStart = mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { t0 =>
          jobs += ((e.jobId, e.time - t0)); jobSpans += ((t0, e.time))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        stages += StageRow(
          si.name.takeWhile(_ != '\n').take(90), si.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1048576.0,
          m.shuffleWriteMetrics.bytesWritten / 1048576.0,
          m.inputMetrics.bytesRead / 1048576.0, wall)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.lineitem(spark, sfDir).count()

    // driver stack sampler: attributes main-thread time to subsystems
    val mainThread = Thread.currentThread()
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val tag =
            if (st.exists(s => s.getMethodName == "park" ||
                s.getMethodName == "awaitResult" || s.getMethodName == "await" ||
                s.getMethodName.startsWith("wait"))) "blocked-waiting"
            else if (st.exists(_.getClassName.contains("janino")) ||
                st.exists(_.getClassName.contains("CodeGenerator"))) "codegen"
            else if (st.exists(_.getClassName.contains("sql.catalyst.analysis"))) "analysis"
            else if (st.exists(_.getClassName.contains("sql.catalyst.optimizer"))) "optimizer"
            else if (st.exists(_.getClassName.contains("adaptive"))) "aqe"
            else if (st.exists(_.getClassName.contains("sql.execution.exchange")) ||
                st.exists(_.getClassName.contains("ShuffleExchange"))) "exchange-prep"
            else if (st.exists(_.getClassName.contains("QueryPlanner")) ||
                st.exists(_.getClassName.contains("SparkStrateg"))) "planning"
            else if (st.exists(_.getClassName.contains("CacheManager"))) "cache-mgr"
            else if (st.exists(s => s.getClassName.contains("DAGScheduler") ||
                s.getMethodName == "awaitResult" || s.getMethodName == "awaitReady")) "await-job"
            else if (st.exists(_.getClassName.contains("TreeNode")) ||
                st.exists(_.getClassName.contains("sql.catalyst"))) "catalyst-misc"
            else st.drop(2).headOption.map(f =>
              f.getClassName.split('.').takeRight(2).mkString(".") + "." + f.getMethodName)
              .getOrElse("?")
          sampleCounts.merge(tag, 1, (a, b) => a + b)
        }
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    if (names.contains("abdec")) {
      // interleaved A/B: wide-decimal product (BigDecimal path) vs
      // compact-precision product (long fast path) on the same scan
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      import graft.functions.Compat._
      def base = graft.Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
      def wide = base.agg(r4(sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
        (lit(1) - col("l_discount")).cast(DecimalType(9, 6))).cast(DoubleType)).as("x"))
      def compact = base.agg(r4(sum(col("l_extendedprice").cast(DecimalType(10, 2)) *
        (lit(1) - col("l_discount")).cast(DecimalType(7, 6))).cast(DoubleType)).as("x"))
      def force(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      force(wide); force(compact)
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime(); force(wide)
        val t1 = System.nanoTime(); force(compact)
        val t2 = System.nanoTime()
        println(f"[abdec] #$i wide=${(t1 - t0) / 1e9}%.3f s compact=${(t2 - t1) / 1e9}%.3f s")
      }
      spark.stop()
      return
    }

    if (names.contains("maint")) {
      // profile the m_merge maintenance verb (bench maintenance block)
      import graft.operators.{Maintenance, SqlSurface}
      val stage = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_prof_maint_${java.util.UUID.randomUUID().toString.take(8)}")
      val p = stage.getAbsolutePath
      val o = graft.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Maintenance.snapshotWrite(o, s"$p/t", nFiles = 8,
        statsCols = Seq("o_orderkey"), clusterBy = Some("o_orderkey"))
      o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") + lit(100.0)).as("price"))
        .createOrReplaceTempView("prof_chg")
      stages.clear(); jobs.clear(); jobSpans.clear()
      val t0 = System.nanoTime()
      SqlSurface.withCatalog(spark, p) { cat =>
        spark.sql(s"MERGE INTO $cat.t t USING prof_chg c " +
          "ON t.o_orderkey = c.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET o_totalprice = c.price " +
          "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, " +
          "o_totalprice) VALUES (c.o_orderkey, 'N', c.price)"): Unit
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"\n### m_merge wall=$wall%.3f s jobs=${jobs.size} stages=${stages.size} " +
        f"stageWallSum=${stages.map(_.wallMs).sum / 1000.0}%.3f s")
      stages.sortBy(-_.wallMs).take(15).foreach { s =>
        println(f"  stage wall=${s.wallMs}%5d ms run=${s.runMs}%6d tasks=${s.tasks}%3d " +
          f"sr=${s.shufReadMB}%7.2fMB sw=${s.shufWriteMB}%7.2fMB  ${s.name}")
      }
      graft.sources.Sources.deleteRecursively(stage)
      spark.stop()
      return
    }

    if (names.contains("micro")) {
      // floor measurement: sequential tiny actions on a persisted frame
      val f = spark.range(100000).selectExpr("id", "id % 7 as k",
        "cast(id as double) / 3 as v").persist()
      f.count()
      (1 to 3).foreach { round =>
        val t0 = System.nanoTime()
        (1 to 10).foreach { i =>
          f.agg(sum(col("v") * lit(i.toDouble)), sum(col("v") + lit(i.toDouble))).head()
        }
        println(f"[micro] 10 sequential agg().head() round $round: " +
          f"${(System.nanoTime() - t0) / 1e9}%.3f s")
        val t1 = System.nanoTime()
        (1 to 10).foreach { i =>
          f.groupBy("k").agg(sum(col("v") * lit(i.toDouble)).as("s"))
            .write.format("noop").mode("overwrite").save()
        }
        println(f"[micro] 10 sequential groupBy noop round $round: " +
          f"${(System.nanoTime() - t1) / 1e9}%.3f s")
        // constant literal: same generated source every time -> codegen
        // cache hit; new Dataset each action -> analysis still paid
        val t2 = System.nanoTime()
        (1 to 10).foreach { _ =>
          f.agg(sum(col("v") * lit(2.0)), sum(col("v") + lit(2.0))).head()
        }
        println(f"[micro] 10 const-literal agg().head() round $round: " +
          f"${(System.nanoTime() - t2) / 1e9}%.3f s")
        // same Dataset object re-collected: no analysis, no codegen
        val d = f.agg(sum(col("v") * lit(3.0)), sum(col("v") + lit(3.0)))
        d.head()
        val t3 = System.nanoTime()
        (1 to 10).foreach(_ => d.head())
        println(f"[micro] 10 same-Dataset head() round $round: " +
          f"${(System.nanoTime() - t3) / 1e9}%.3f s")
      }
      f.unpersist()
      spark.stop()
      return
    }

    names.foreach { n =>
      val op = graft.Registry.byName(n)
      // one untimed warmup like Bench
      try op.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally graft.CacheScope.releaseAll()
      stages.clear(); jobs.clear(); jobSpans.clear(); sampleCounts.clear()
      val t0 = System.nanoTime()
      sampling = true
      try op.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[$n] FAILED: ${e.getMessage}") }
      finally { sampling = false; graft.CacheScope.releaseAll() }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      // driver-side dead time: wall minus the union of job spans
      val spans = jobSpans.sortBy(_._1)
      var covered = 0L; var cursor = 0L
      spans.foreach { case (s, e) =>
        val st = math.max(s, cursor)
        if (e > st) { covered += e - st; cursor = e } else cursor = math.max(cursor, e)
      }
      val spanTotal = if (spans.nonEmpty) spans.map(_._2).max - spans.head._1 else 0L
      println(f"\n### $n wall=$wall%.3f s jobs=${jobs.size} stages=${stages.size} " +
        f"stageWallSum=${stages.map(_.wallMs).sum / 1000.0}%.3f s " +
        f"jobCovered=${covered / 1000.0}%.3f s interJobGaps=${(spanTotal - covered) / 1000.0}%.3f s")
      import scala.jdk.CollectionConverters._
      val samples = sampleCounts.asScala.toSeq.sortBy(-_._2)
      val totSamples = samples.map(_._2.toInt).sum.max(1)
      println("  driver main-thread samples: " + samples.take(10).map { case (k, v) =>
        f"$k=${v.toInt * 100.0 / totSamples}%.0f%%"
      }.mkString(" "))
      stages.sortBy(-_.wallMs).take(12).foreach { s =>
        println(f"  stage wall=${s.wallMs}%5d ms run=${s.runMs}%6d cpu=${s.cpuMs}%6d " +
          f"tasks=${s.tasks}%3d in=${s.inputMB}%7.1fMB sr=${s.shufReadMB}%7.2fMB " +
          f"sw=${s.shufWriteMB}%7.2fMB  ${s.name}")
      }
    }
    spark.stop()
  }
}
