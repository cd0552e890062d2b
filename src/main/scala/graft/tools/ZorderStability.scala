package graft.tools

/** Stability gate for the derandomized z-order path (r11, after the
  * r10 q_sql_zorder flake): run the q_sql_zorder and q_sql_zorder3
  * registered queries N consecutive times — each run re-stages the
  * table, re-runs OPTIMIZE … ZORDER BY, and re-answers through the
  * catalog — and require every run's full result content (and the
  * produced manifest shape) to be IDENTICAL. A layout-dependent wrong
  * answer that fired 1-in-N under the old sampled layout either
  * cannot fire (deterministic layout) or fires loudly here.
  *
  * `--suite-first` (r11 verdict task 5) first runs every OTHER
  * registered query once in the SAME JVM — heap pressured, CacheScope
  * state exercised, codegen caches full — before cycling the z
  * queries: the one in-process context that matches the driver's full
  * Verify run, where (and only where) the r10/r11 reds occurred.
  * Since r12 the z queries also carry in-query content invariants, so
  * a drift here doesn't just change the hash — it throws the
  * stage-naming diagnostic.
  *
  * Usage: runMain graft.tools.ZorderStability [runs] [sfDir] [--suite-first]
  * Prints one JSON line {"runs":N,"distinct_hashes":…}; exits nonzero
  * on any drift.
  */
object ZorderStability {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val runs = pos.lift(0).map(_.toInt).getOrElse(20)
    val sfDir = pos.lift(1).getOrElse("/root/testdata/sf0.001")
    val suiteFirst = flags.contains("--suite-first")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)

    val targets = Seq("q_sql_zorder", "q_sql_zorder3")
    val byName = graft.Registry.ops.map(o => o.name -> o.fn).toMap

    if (suiteFirst) {
      var suiteErrs = 0
      graft.Registry.ops.filterNot(o => targets.contains(o.name)).foreach { op =>
        try op.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          suiteErrs += 1
          System.err.println(s"[zorder-stability] suite query ${op.name} " +
            s"failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
        } finally graft.CacheScope.releaseAll()
      }
      System.err.println(s"[zorder-stability] suite-first done " +
        s"(${graft.Registry.ops.size - targets.size} queries, $suiteErrs errors)")
    }

    var failed = false
    val report = targets.map { name =>
      val hashes = (1 to runs).map { _ =>
        // content hash: row-sorted, column-sorted, full precision — the
        // same identity the driver's oracle compare establishes
        val h = graft.Verify.contentHash(byName(name)(spark, sfDir))
        graft.CacheScope.releaseAll()
        h
      }
      val distinct = hashes.distinct
      if (distinct.size != 1) {
        failed = true
        System.err.println(s"[zorder-stability] $name DRIFTED: $hashes")
      }
      s""""$name":{"runs":$runs,"distinct_hashes":${distinct.size},"hash":"${distinct.head}"}"""
    }
    println((report :+ s""""cpus":$cpus,"suite_first":$suiteFirst""")
      .mkString("{", ",", "}"))
    spark.stop()
    if (failed) sys.exit(1)
  }
}
