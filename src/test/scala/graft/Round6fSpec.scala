package graft

/** Sixth round-6 batch: classifier calibration pinned against a fully
  * independent plain-Scala replay (features → 8-iteration GD →
  * sigmoid scoring → decile binning → ECE). */
class Round6fSpec extends SparkSpec {

  private def r4d(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4
  private def r6d(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
  private def dsum(xs: Seq[Double]): Double =
    xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble

  test("calibration matches an independent GD + binning replay; ECE law holds") {
    val stop = Set("the", "a", "of", "and", "is")
    val feats = Tables.documents(spark, sfDir).select("text").collect().map { r =>
      val text = r.getString(0)
      val toks = text.split(" ", -1)
      val nTok = toks.length
      val stopHits = toks.count(stop)
      val x1 = toks.distinct.length.toDouble / nTok
      val x2 = stopHits.toDouble / nTok
      val x3 = (text.length - nTok + 1).toDouble / nTok / 10.0
      val y = if (stopHits >= 2 && x1 >= 0.3) 1.0 else 0.0
      (x1, x2, x3, y)
    }
    val n = feats.length.toDouble
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 8) {
      def sig(f: (Double, Double, Double, Double)): Double =
        1.0 / (1.0 + math.exp(-(w(0) + w(1) * f._1 + w(2) * f._2 + w(3) * f._3)))
      val xs = Seq[((Double, Double, Double, Double)) => Double](
        _ => 1.0, _._1, _._2, _._3)
      w = Array.tabulate(4)(j =>
        w(j) - dsum(feats.toSeq.map(f => r6d((sig(f) - f._4) * xs(j)(f)))) / n)
    }
    val binned = feats.map { f =>
      val p = r6d(1.0 / (1.0 + math.exp(-(w(0) + w(1) * f._1 + w(2) * f._2 + w(3) * f._3))))
      (math.min(math.floor(p * 10).toLong, 9L), p, f._4)
    }
    val per = binned.groupBy(_._1).map { case (bin, xs) =>
      val conf = dsum(xs.map(x => r6d(x._2)).toSeq) / xs.length
      val acc = dsum(xs.map(_._3).toSeq) / xs.length
      bin -> (xs.length.toLong, conf, acc)
    }
    val got = Registry.byName("q_calibration").fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    per.foreach { case (bin, (nb, conf, acc)) =>
      val (gn, gConf, gAcc, gGap) = got(bin.toString)
      assert(gn === nb, s"bin $bin n")
      assert(math.abs(gConf - r4d(conf)) < 1e-9, s"bin $bin conf")
      assert(math.abs(gAcc - r4d(acc)) < 1e-9, s"bin $bin acc")
      assert(math.abs(gGap - r4d(math.abs(acc - conf))) < 1e-9, s"bin $bin gap")
    }
    // the ALL row: totals + the ECE law Σ (n_b/N)·|acc_b − conf_b|
    val (gn, gConf, gAcc, gEce) = got("ALL")
    assert(gn === feats.length.toLong)
    val ece = dsum(per.values.map { case (nb, conf, acc) =>
      r6d(nb * math.abs(acc - conf)) }.toSeq) / n
    assert(math.abs(gEce - r4d(ece)) < 1e-9, s"ece $gEce vs $ece")
    val confAll = dsum(binned.map(b => r6d(b._2)).toSeq) / n
    val accAll = dsum(binned.map(_._3).toSeq) / n
    assert(math.abs(gConf - r4d(confAll)) < 1e-9, "ALL conf")
    assert(math.abs(gAcc - r4d(accAll)) < 1e-9, "ALL acc")
    assert(got.size === per.size + 1, "row per occupied bin + ALL")
    // ECE is a weighted mean of per-bin gaps: it can never exceed the max gap
    val maxGap = per.values.map { case (_, c, a) => math.abs(a - c) }.max
    assert(gEce <= r4d(maxGap) + 1e-9)
  }
}
