package graft

import org.apache.spark.sql.functions._

/** Round-7 batch 1: multi-bin calibration path (ADVICE r6 — the sf
  * fixtures collapse into one decile, leaving bin ordering, per-bin
  * conf/acc and the ECE weighting untested against anything). */
class Round7Spec extends SparkSpec {

  private def r4d(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4
  private def r6d(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
  private def dsum(xs: Seq[Double]): Double =
    xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble

  test("calibrationFrom exercises multiple decile bins: ordering, per-bin conf/acc, ECE weighting") {
    import spark.implicits._
    // scores sigmoid(5·x1) span 7 distinct deciles; y mixes 0/1 within bins
    val rows = Seq(
      (-0.40, 0.0), (-0.40, 1.0), (-0.20, 0.0), (-0.20, 0.0),
      (-0.10, 1.0), (-0.10, 0.0), (0.00, 1.0), (0.00, 0.0),
      (0.05, 1.0), (0.10, 1.0), (0.10, 0.0), (0.20, 1.0),
      (0.20, 1.0), (0.40, 1.0), (0.40, 0.0), (0.40, 1.0))
    val w = Array(0.0, 5.0, 0.0, 0.0)
    val features = rows.toDF("x1", "y")
      .withColumn("x2", lit(0.0)).withColumn("x3", lit(0.0))
    val got = operators.Corpus.calibrationFrom(features, w).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    // independent plain-Scala replay
    val binned = rows.map { case (x1, y) =>
      val p = r6d(1.0 / (1.0 + math.exp(-5.0 * x1)))
      (math.min(math.floor(p * 10).toLong, 9L), p, y)
    }
    val per = binned.groupBy(_._1).map { case (bin, xs) =>
      bin -> (xs.length.toLong, dsum(xs.map(_._2)) / xs.length, dsum(xs.map(_._3)) / xs.length)
    }
    assert(per.size >= 3, s"fixture must span >=3 deciles, got ${per.keySet}")
    assert(got.size === per.size + 1) // bins + ALL
    per.foreach { case (bin, (nb, conf, acc)) =>
      val (gn, gConf, gAcc, gGap) = got(bin.toString)
      assert(gn === nb, s"bin $bin n")
      assert(math.abs(gConf - r4d(conf)) < 1e-9, s"bin $bin conf")
      assert(math.abs(gAcc - r4d(acc)) < 1e-9, s"bin $bin acc")
      assert(math.abs(gGap - r4d(math.abs(acc - conf))) < 1e-9, s"bin $bin gap")
    }
    val (gn, _, _, gEce) = got("ALL")
    assert(gn === rows.length.toLong)
    val ece = dsum(per.values.map { case (nb, conf, acc) =>
      r6d(nb * math.abs(acc - conf))
    }.toSeq) / rows.length
    assert(math.abs(gEce - r4d(ece)) < 1e-9, "ECE weighting across bins")
    // string bin ordering: '0'..'9' then 'ALL' — the driver-sorted order
    val orderedBins = operators.Corpus.calibrationFrom(features, w)
      .collect().map(_.getString(0)).toSeq
    assert(orderedBins === orderedBins.sorted, "bin column sorts as emitted")
    assert(orderedBins.last === "ALL")
  }

  test("streaming replay harness: finalized tumbling windows equal the batch twin") {
    val streamed = Registry.byName("q_stream_tumbling").fn(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val batch = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        functions.Compat.sumMoney(col("value")).as("sum_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
  }

  test("streaming replay harness: double-delivered batches dedup to the unique event set") {
    val ids = Registry.byName("q_stream_dedup").fn(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size === ids.size, "no event emitted twice")
    val expected = Tables.events(spark, sfDir).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.toSet === expected)
  }
}
