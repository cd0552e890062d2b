package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the corpus-curation block (operators.Corpus)
  * and the round-4 stat additions (KS test, ACF, CUBE). */
class CorpusSpec extends SparkSpec {

  test("bm25: scores positive, sorted descending, at most 15 rows") {
    val rows = operators.Corpus.bm25(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted.reverse), "not sorted desc")
  }

  test("ngram LM: log-probs negative, sample-only docs scored") {
    val rows = operators.Corpus.ngramLm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("avg_logprob") < 0), "lp must be < 0")
    assert(rows.forall(_.getAs[Long]("doc_id") % 5 == 0), "sample is doc_id % 5")
    // a smoothed bigram prob is at least 0.5 / (c1max + 0.5V) — bounded below
    assert(rows.forall(_.getAs[Double]("avg_logprob") > -25))
  }

  test("dedup substring: shared grams imply a counterpart doc shares them") {
    val df = operators.Corpus.dedupSubstring(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "synthetic near-dups must share 12-gram spans")
    rows.foreach { r =>
      val ratio = r.getAs[Double]("shared_ratio")
      assert(ratio > 0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_grams"))
    }
    // shared spans are symmetric: can't have exactly one doc flagged
    assert(rows.length >= 2)
  }

  test("domain mix: rates in (0,1], planned within budget and supply") {
    val rows = operators.Corpus.domainMix(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("rate") > 0 && r.getAs[Double]("rate") <= 1.0)
      assert(r.getAs[Long]("planned_n") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("epochs") > 0)
    }
    val shares = rows.map(_.getAs[Double]("target_share")).sum
    assert(math.abs(shares - 1.0) < 1e-3, s"target shares sum to $shares")
  }

  test("c4 funnel: drop reasons + kept partition the corpus per source") {
    val rows = operators.Corpus.c4Filters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("drop_len") + r.getAs[Long]("drop_wordlen") +
        r.getAs[Long]("drop_stopword") + r.getAs[Long]("drop_repetition") +
        r.getAs[Long]("n_kept")
      assert(total == r.getAs[Long]("n_docs"),
        s"${r.getAs[String]("source")}: funnel stages don't partition")
    }
  }

  test("KS test: D and p in [0,1]; agrees with a brute-force ECDF scan") {
    val rows = operators.Stats.ksTest(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("ks_d") >= 0 && r.getAs[Double]("ks_d") <= 1)
      val p = r.getAs[Double]("p_value")
      assert(p >= 0 && p <= 1)
    }
    // brute-force D for one event_type computed driver-side
    val et = rows.head.getAs[String]("event_type")
    val evs = Tables.events(spark, sfDir)
      .filter(col("event_type") === et)
      .select(col("value"),
        when((expr("unix_micros(date_trunc('hour', ts)) div 3600000000") +
          col("user_id") % 10) % 2 === 0, "On").otherwise("Off").as("g"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    val on = evs.filter(_._2 == "On").map(_._1).sorted
    val off = evs.filter(_._2 == "Off").map(_._1).sorted
    val d = evs.map(_._1).distinct.map { v =>
      math.abs(on.count(_ <= v).toDouble / on.length -
        off.count(_ <= v).toDouble / off.length)
    }.max
    assert(math.abs(d - rows.head.getAs[Double]("ks_d")) < 1e-5,
      s"KS D mismatch: brute $d vs ${rows.head.getAs[Double]("ks_d")}")
  }

  test("ANOVA over block positions matches a driver-side brute force") {
    val rows = operators.Stats.anovaPosition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val et = rows.head.getAs[String]("event_type")
    val evs = Tables.events(spark, sfDir)
      .filter(col("event_type") === et)
      .select(expr("(unix_micros(date_trunc('hour', ts)) div 3600000000) % 4").as("pos"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val groups = evs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(groups.keySet === Set(0L, 1L, 2L, 3L))
    val n = evs.length.toDouble
    val grand = evs.map(_._2).sum / n
    val ssb = groups.values.map { g =>
      val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length; g.map(v => (v - m) * (v - m)).sum
    }.sum
    val f = (ssb / 3.0) / (ssw / (n - 4))
    assert(math.abs(rows.head.getAs[Double]("f_stat") - f) < 1e-2,
      s"F: brute $f vs ${rows.head.getAs[Double]("f_stat")}")
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= 0 && p <= 1)
    }
  }

  test("ACF: values in [-1,1], three lags per event_type") {
    val rows = operators.TimeSeries.acf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0001 && a <= 1.0001, s"acf out of range: $a")
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (et, rs) =>
      assert(rs.map(_.getAs[Long]("lag")).sorted.sameElements(Array(1L, 2L, 3L)), et)
    }
  }

  test("quality classifier: GD matches an independent local implementation") {
    // independent single-machine GD over the same features, plain
    // double sums (no decimal machinery) — the distributed trainer must
    // land within rounding distance of it, and beat the majority class
    val feats = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0)).map { text =>
        val toks = text.split(" ", -1)
        val nTok = toks.length.toDouble
        val x1 = toks.distinct.length / nTok
        val stop = toks.count(Set("the", "a", "of", "and", "is"))
        val x2 = stop / nTok
        val x3 = (text.length - nTok + 1) / nTok / 10.0
        val y = if (stop >= 2 && x1 >= 0.3) 1.0 else 0.0
        (x1, x2, x3, y)
      }
    val n = feats.length.toDouble
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 8) {
      val g = Array(0.0, 0.0, 0.0, 0.0)
      feats.foreach { case (x1, x2, x3, y) =>
        val z = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
        val e = 1.0 / (1.0 + math.exp(-z)) - y
        g(0) += e; g(1) += e * x1; g(2) += e * x2; g(3) += e * x3
      }
      w = Array.tabulate(4)(j => w(j) - g(j) / n)
    }
    val got = operators.Corpus.qualityClassifierWeights(spark, sfDir)
    CacheScope.releaseAll()
    (0 to 3).foreach { j =>
      assert(math.abs(got(j) - w(j)) < 1e-3, s"w$j: ${got(j)} vs ${w(j)}")
    }
    val rows = operators.Corpus.qualityClassifier(spark, sfDir).collect()
    CacheScope.releaseAll()
    val (correct, total, pos) = rows.foldLeft((0L, 0L, 0L)) { case ((c, t, p), r) =>
      (c + r.getAs[Long]("tp") + r.getAs[Long]("tn"), t + r.getAs[Long]("n_docs"),
        p + r.getAs[Long]("tp") + r.getAs[Long]("fn"))
    }
    val majority = math.max(pos, total - pos).toDouble / total
    assert(correct.toDouble / total >= majority,
      s"classifier ${correct.toDouble / total} must beat majority $majority")
  }

  test("Levene/Brown-Forsythe matches a driver-side brute force") {
    val rows = operators.Stats.levene(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val et = rows.head.getAs[String]("event_type")
    val evs = Tables.events(spark, sfDir)
      .filter(col("event_type") === et)
      .select(col("value"),
        when((expr("unix_micros(date_trunc('hour', ts)) div 3600000000") +
          col("user_id") % 10) % 2 === 0, "On").otherwise("Off").as("g"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val on = evs.filter(_._2 == "On").map(_._1)
    val off = evs.filter(_._2 == "Off").map(_._1)
    val zOn = on.map(v => math.abs(v - median(on)))
    val zOff = off.map(v => math.abs(v - median(off)))
    val (n1, n2) = (zOn.length.toDouble, zOff.length.toDouble)
    val (m1, m2) = (zOn.sum / n1, zOff.sum / n2)
    val mg = (zOn.sum + zOff.sum) / (n1 + n2)
    val ssb = n1 * (m1 - mg) * (m1 - mg) + n2 * (m2 - mg) * (m2 - mg)
    val ssw = zOn.map(z => (z - m1) * (z - m1)).sum + zOff.map(z => (z - m2) * (z - m2)).sum
    val w = ssb / (ssw / (n1 + n2 - 2))
    val got = rows.head.getAs[Double]("w_stat")
    assert(math.abs(got - w) < 1e-2, s"levene W: brute $w vs $got")
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= 0 && p <= 1)
    }
  }

  test("range-frame window: trailing-1h counts match a brute force for one user") {
    val rows = operators.TimeSeries.windowRange(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val uid = rows.head.getAs[Long]("user_id")
    val evs = Tables.events(spark, sfDir)
      .filter(col("user_id") === uid)
      .select(col("event_id"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byId = rows.filter(_.getAs[Long]("user_id") == uid)
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_1h")).toMap
    evs.foreach { case (eid, us) =>
      val expected = evs.count { case (_, u2) => u2 >= us - 3600000000L && u2 <= us }
      assert(byId(eid) == expected, s"event $eid: ${byId(eid)} vs $expected")
    }
  }

  test("MERGE upsert: counts reconcile with base minus deletes plus inserts") {
    val rows = operators.Relational.mergeUpsert(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val dels = orders.count(_ % 25 == 0)
    val ins = orders.count(_ % 50 == 0)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == orders.length - dels + ins,
      s"merged rows $total != ${orders.length} - $dels + $ins")
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses.contains("U") && statuses.contains("N"))
    val nU = rows.find(_.getAs[String]("status") == "U").get.getAs[Long]("n")
    assert(nU == orders.count(k => k % 25 != 0 && k % 10 == 0))
  }

  test("SCD2: intervals chain per user with exactly one open row") {
    val rows = operators.TimeSeries.scd2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[java.sql.Timestamp]("valid_from").getTime,
        r.getAs[Long]("event_id")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"), s"user $uid: gap in chain")
        case _ =>
      }
      assert(rs.count(_.getAs[java.sql.Timestamp]("valid_to") == null) == 1,
        s"user $uid: open rows != 1")
    }
  }

  test("retention: offset-0 cell equals cohort size; offsets non-negative") {
    val rows = operators.TimeSeries.retention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("week_offset") >= 0))
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_week"))
    byCohort.foreach { case (cw, rs) =>
      val zero = rs.filter(_.getAs[Long]("week_offset") == 0)
      assert(zero.length == 1, s"cohort $cw must have an offset-0 cell")
      // offset 0 is the cohort's own first week: the max cell of the row
      assert(rs.forall(_.getAs[Long]("n_users") <= zero.head.getAs[Long]("n_users")),
        s"cohort $cw: later week exceeds cohort size")
    }
  }

  test("funnel: step counts are monotone non-increasing") {
    val rows = operators.TimeSeries.funnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, v, p) = (r.getAs[Long]("n_click"), r.getAs[Long]("n_view_after"),
        r.getAs[Long]("n_purchase_after"))
      assert(c >= v && v >= p, s"${r.getAs[java.sql.Date]("day")}: $c/$v/$p")
      val conv = r.getAs[Double]("conversion")
      assert(conv >= 0 && conv <= 1)
    }
  }

  test("random projection: JL norm preservation on average, signs balanced") {
    val rows = operators.Similarity.randomProjection(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getAs[Double]("norm_ratio"))
    ratios.foreach(r => assert(r > 0, "projected norm must be positive"))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.6 && mean < 1.4,
      s"E[norm ratio] should be ~1 (Achlioptas), got $mean")
    // the LCG mid-bit signs must not be degenerate (the low-bit trap
    // would give strictly alternating signs and ratio exactly constant)
    assert(ratios.distinct.length > 1)
  }

  test("CUBE: the (ALL, ALL) cell equals the table total") {
    val rows = operators.Relational.cubeAgg(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    val grand = rows.filter(r =>
      r.getAs[Long]("g_status") == 1 && r.getAs[Long]("g_priority") == 1)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == total)
    // marginals over status sum back to the grand total
    val statusCells = rows.filter(r =>
      r.getAs[Long]("g_status") == 0 && r.getAs[Long]("g_priority") == 1)
    assert(statusCells.map(_.getAs[Long]("n")).sum == total)
  }
}
