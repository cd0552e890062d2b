package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.functions.StatFunctions

/** Stat aggregators vs independently-computed reference values
  * (rank/tie/continuity definitions as scipy.stats.mannwhitneyu
  * asymptotic + Welch ttest_ind(equal_var=False)). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def mwuOf(x: Seq[Double], y: Seq[Double]): (Double, Double, Double) = {
    // same pipeline as operators.Stats.mwu, on explicit groups
    val df = (x.map(("x", _)) ++ y.map(("y", _))).toDF("g", "value")
    val counts = df.groupBy("value")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("g") === "x", 1L).otherwise(0L)).as("cnt_on"))
    val w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("cum_before", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("avg_rank", col("cum_before") + (col("cnt") + 1) / 2.0)
    val agg = ranked.agg(
      sum(col("avg_rank") * col("cnt_on")).as("r_on"),
      sum("cnt_on").as("n1"), sum("cnt").as("n"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_t"))
    val n1c = col("n1"); val n2c = col("n") - col("n1"); val nc = col("n")
    val u1 = col("r_on") - n1c * (n1c + 1) / 2.0
    val mu = n1c * n2c / 2.0
    val sd = sqrt(n1c * n2c / 12.0 * ((nc + 1) - col("tie_t") / (nc * (nc - 1.0))))
    val z = (u1 - mu - signum(u1 - mu) * 0.5) / sd
    val row = agg.select(u1.as("u"), z.as("z"),
      StatFunctions.pTwoSidedNormal(z).as("p")).head()
    (row.getDouble(0), row.getDouble(1), row.getDouble(2))
  }

  test("Mann-Whitney U matches reference (no ties)") {
    val (u, z, p) = mwuOf(Seq(1.1, 2.3, 3.5, 4.1, 5.0, 6.2),
      Seq(2.0, 3.1, 4.4, 5.5, 6.6, 7.0, 8.1))
    assert(u === 12.0)
    assert(math.abs(z - -1.2142857142857142) < 1e-9)
    assert(math.abs(p - 0.2246386389237804) < 1e-6) // A&S erf ≈ 1.5e-7
  }

  test("Mann-Whitney U matches reference (ties, tie-corrected)") {
    val (u, z, p) = mwuOf(Seq(1.0, 2.0, 2.0, 3.0), Seq(2.0, 3.0, 4.0, 4.0))
    assert(u === 2.5)
    assert(math.abs(z - -1.4978617237881953) < 1e-9)
    assert(math.abs(p - 0.13416918012812581) < 1e-6)
  }

  test("Welch t-test matches reference") {
    val x = Seq(1.1, 2.3, 3.5, 4.1, 5.0, 6.2); val y = Seq(2.0, 3.1, 4.4, 5.5, 6.6, 7.0, 8.1)
    val d = DecimalType(28, 6)
    val df = (x.map(("x", _)) ++ y.map(("y", _))).toDF("g", "value")
    val m = df.agg(
      sum(when(col("g") === "x", 1L).otherwise(0L)).as("n1"),
      sum(when(col("g") === "x", col("value").cast(d))).cast(DoubleType).as("s1"),
      sum(when(col("g") === "x", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss1"),
      sum(when(col("g") === "y", 1L).otherwise(0L)).as("n2"),
      sum(when(col("g") === "y", col("value").cast(d))).cast(DoubleType).as("s2"),
      sum(when(col("g") === "y", (col("value") * col("value")).cast(d))).cast(DoubleType).as("ss2"))
    val v1 = (col("ss1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
    val v2 = (col("ss2") - col("s2") * col("s2") / col("n2")) / (col("n2") - 1)
    val se2 = v1 / col("n1") + v2 / col("n2")
    val t = (col("s1") / col("n1") - col("s2") / col("n2")) / sqrt(se2)
    val dfree = se2 * se2 / ((v1 / col("n1")) * (v1 / col("n1")) / (col("n1") - 1) +
      (v2 / col("n2")) * (v2 / col("n2")) / (col("n2") - 1))
    val row = m.select(t.as("t"), dfree.as("df")).head()
    assert(math.abs(row.getDouble(0) - -1.3789081865879802) < 1e-9)
    assert(math.abs(row.getDouble(1) - 10.99858925825451) < 1e-7)
  }

  test("Poisson bootstrap CI brackets the plain mean and is deterministic") {
    val ci = operators.Stats.bootstrapCi(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val means = operators.Stats.ciNormal(spark, sfDir)
      .groupBy("event_type").agg(avg("mean").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    means.foreach { case (et, m) =>
      val (_, lo, hi) = ci(et)
      assert(lo <= m && m <= hi, s"$et: mean $m outside bootstrap CI [$lo, $hi]")
    }
    val again = operators.Stats.bootstrapCi(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(again === ci) // hash-derived weights: no RNG, rerun identical
  }

  test("portable lgamma matches known values") {
    def lg(x: Double): Double =
      spark.sql(s"SELECT ${StatFunctions.lgammaSql(x.toString)} AS v").head().getDouble(0)
    assert(math.abs(lg(0.5) - 0.5723649429247001) < 1e-12)  // ln √π
    assert(math.abs(lg(1.0)) < 1e-12)
    assert(math.abs(lg(5.0) - math.log(24.0)) < 1e-12)      // ln 4!
    assert(math.abs(lg(1000.5) - 5908.674176) < 1e-5)       // large arg (Stirling regime)
  }

  test("Student-t two-sided p matches closed forms and the normal limit") {
    def pT(t: Double, df: Double): Double =
      spark.sql(s"SELECT ${StatFunctions.pTwoSidedTSql(t.toString, df.toString, spark = true)} AS p")
        .head().getDouble(0)
    // df=1 is Cauchy: p = 1 - 2·atan(|t|)/π. x lands exactly on the CF
    // branch boundary at t=1 (slowest convergence) — still ~1e-9, far
    // inside the 1e-6 reporting precision.
    assert(math.abs(pT(1.0, 1.0) - 0.5) < 1e-8)
    assert(math.abs(pT(2.0, 1.0) - (1 - 2 * math.atan(2.0) / math.Pi)) < 1e-8)
    // df=2 closed form: p = 1 - t/√(2+t²) for t>0
    assert(math.abs(pT(1.0, 2.0) - 0.42264973081037416) < 1e-8)
    assert(math.abs(pT(3.0, 2.0) - (1 - 3.0 / math.sqrt(11.0))) < 1e-8)
    // t = 0 → p = 1 exactly (x=1 guard)
    assert(pT(0.0, 7.3) === 1.0)
    // fractional (Welch) df interpolates sanely between integer dfs
    val pMid = pT(2.0, 5.5)
    assert(pT(2.0, 5.0) > pMid && pMid > pT(2.0, 6.0))
    // large df converges to the normal tail
    val z = 1.959963984540054
    assert(math.abs(pT(z, 100000.0) - 0.05) < 1e-4)
  }

  test("operator-level stats queries run and are sane") {
    val tt = operators.Stats.ttestWelch(spark, sfDir).collect()
    assert(tt.length === 5) // one row per event_type
    tt.foreach { r =>
      val p = r.getAs[Double]("p_normal")
      assert(p >= 0.0 && p <= 1.0)
      val pt = r.getAs[Double]("p_t")
      assert(pt >= 0.0 && pt <= 1.0)
      // large-n slices: t and normal tails agree closely
      assert(math.abs(pt - p) < 0.01)
    }
    val mw = operators.Stats.mwu(spark, sfDir).collect()
    assert(mw.length === 5)
    mw.foreach(r => assert(r.getAs[Double]("p_value") >= 0.0))
  }

  test("CRSE matches an independent OLS cluster-sandwich computation") {
    // Brute-force Liang–Zeger sandwich in plain Scala (collected rows,
    // naive float sums — none of the operator's decimal machinery).
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("ts"), col("value"))
      .withColumn("hr", expr("unix_micros(date_trunc('hour', ts)) div 3600000000"))
      .select("event_type", "hr", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = operators.Stats.crse(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, evs) =>
      val data = evs.map { case (_, hr, uid, v) =>
        val d = if ((hr + uid % 10) % 2 == 0) 1.0 else 0.0
        (hr * 10 + uid % 10, d, v)
      }
      val n = data.length.toDouble
      val n1 = data.map(_._2).sum
      val m1 = data.filter(_._2 == 1.0).map(_._3).sum / n1
      val m0 = data.filter(_._2 == 0.0).map(_._3).sum / (n - n1)
      val beta1 = m1 - m0
      val byCl = data.groupBy(_._1).values.toSeq
      val gG = byCl.size.toDouble
      var m11 = 0.0; var m12 = 0.0; var m22 = 0.0
      byCl.foreach { cl =>
        var su = 0.0; var sd = 0.0
        cl.foreach { case (_, d, v) =>
          val e = v - (if (d == 1.0) m1 else m0)
          su += e; sd += e * d
        }
        m11 += su * su; m12 += su * sd; m22 += sd * sd
      }
      val det = n1 * (n - n1)
      val varRaw = (n1 * n1 * m11 - 2.0 * n1 * n * m12 + n * n * m22) / (det * det)
      val c = (gG / (gG - 1.0)) * ((n - 1.0) / (n - 2.0))
      val se = math.sqrt(c * varRaw)
      val r = got(et)
      assert(r.getAs[Long]("g_clusters") === byCl.size)
      assert(math.abs(r.getAs[Double]("beta1") - beta1) < 1e-5, s"$et beta1")
      assert(math.abs(r.getAs[Double]("se") - se) < 1e-5, s"$et se")
      assert(math.abs(r.getAs[Double]("t_stat") - beta1 / se) < 1e-3, s"$et t")
      // CI brackets beta1 and p is a probability
      assert(r.getAs[Double]("ci_lo") < beta1 && beta1 < r.getAs[Double]("ci_hi"))
      val p = r.getAs[Double]("p_t")
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
