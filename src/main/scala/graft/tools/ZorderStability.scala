package graft.tools

import org.apache.spark.sql.DataFrame

/** Stability gate for the derandomized z-order path (r11, after the
  * r10 q_sql_zorder flake): run the q_sql_zorder and q_sql_zorder3
  * registered queries N consecutive times — each run re-stages the
  * table, re-runs OPTIMIZE … ZORDER BY, and re-answers through the
  * catalog — and require every run's full result content (and the
  * produced manifest shape) to be IDENTICAL. A layout-dependent wrong
  * answer that fired 1-in-N under the old sampled layout either
  * cannot fire (deterministic layout) or fires loudly here.
  *
  * Usage: runMain graft.tools.ZorderStability [runs] [sfDir]
  * Prints one JSON line {"runs":N,"distinct_hashes":…}; exits nonzero
  * on any drift.
  */
object ZorderStability {
  def main(args: Array[String]): Unit = {
    val runs = args.lift(0).map(_.toInt).getOrElse(20)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // content hash: row-sorted, column-sorted, full precision — the
    // same identity the driver's oracle compare establishes
    def contentHash(df: DataFrame): String = {
      val cols = df.columns.sorted.toIndexedSeq
      val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).sorted
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(rows.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    }

    val targets = Seq("q_sql_zorder", "q_sql_zorder3")
    val byName = graft.Registry.ops.map(o => o.name -> o.fn).toMap
    var failed = false
    val report = targets.map { name =>
      val hashes = (1 to runs).map { i =>
        val h = contentHash(byName(name)(spark, sfDir))
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
    println(report.mkString("{", ",", "}"))
    spark.stop()
    if (failed) sys.exit(1)
  }
}
