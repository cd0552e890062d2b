package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling main for the connected-components loop shape (same
  * role as ProfileMinhash): times pair discovery sub-plans and CC loop
  * variants per iteration. Not part of the driver contract. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.documents(spark, sfDir).count()

    // ---- discovery sub-plans ----
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val shingles = docs.select(col("doc_id"), explode(
      expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
      .as("shingle")).distinct()
    timed("shingles distinct count")(println("  rows=" + shingles.count()))
    val pairsRaw = shingles.as("a")
      .join(shingles.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
    timed("raw shingle-match pairs count")(println("  rows=" + pairsRaw.count()))
    val inter = pairsRaw
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    timed("inter agg count")(println("  rows=" + inter.count()))
    timed("full dedupNgram count")(
      println("  rows=" + operators.Dedup.dedupNgram(spark, sfDir).count()))

    // A/B: self-join vs grouped pair generation, interleaved in ONE JVM
    // (cross-run box contention otherwise swamps the delta)
    def pairsSelfJoin() = {
      val sh = docs.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(
          expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
          .as("shingle")).distinct()
      sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
    }
    def pairsGrouped() = {
      val sh = docs.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(
          expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
          .as("shingle")).distinct()
      sh.groupBy("shingle").agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(col("ds")).as("id_a"), col("ds"))
        .select(col("id_a"), explode(col("ds")).as("id_b"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    }
    (1 to 3).foreach { i =>
      timed(s"AB self-join pairs #$i")(pairsSelfJoin().count())
      timed(s"AB grouped pairs   #$i")(pairsGrouped().count())
    }

    // does the FULL query (pairs + the two size joins) recompute the
    // shingle subplan, or does AQE stage-reuse absorb it? A/B the
    // shipped shape against a persisted-shingles variant.
    def fullShipped() = operators.Dedup.dedupNgram(spark, sfDir)
    def fullPersisted() = {
      val sh = docs.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(
          expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
          .as("shingle")).distinct().persist()
      sh.count()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pairs = sh.groupBy("shingle").agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(col("ds")).as("id_a"), col("ds"))
        .select(col("id_a"), explode(col("ds")).as("id_b"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      val out = pairs
        .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", graft.functions.Compat.r4(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))))
        .filter(col("jaccard") >= 0.06)
        .select("id_a", "id_b", "inter", "jaccard")
        .orderBy("id_a", "id_b")
      val n = out.count()
      sh.unpersist(blocking = false)
      n
    }
    (1 to 3).foreach { i =>
      timed(s"AB full shipped   #$i")(fullShipped().count())
      timed(s"AB full persisted #$i")(fullPersisted())
    }

    val pairs = operators.Dedup.dedupNgram(spark, sfDir)
      .select(col("id_a").as("src"), col("id_b").as("dst"))

    // variant C: shipped message shape, localCheckpoint EVERY iteration
    timed("variant C total") {
      val sym = CacheScope.track(
        pairs.select(col("src"), col("dst"))
          .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
          .persist())
      var labels = sym.select(col("src").as("node")).distinct()
        .withColumn("component", col("node"))
      var changed = 1L
      var i = 0
      var prevCp: Option[DataFrame] = None
      while (changed > 0 && i < 20) {
        val t0 = System.nanoTime()
        val neighborMin = sym
          .join(labels, sym("dst") === labels("node"))
          .groupBy(col("src").as("node"))
          .agg(min("component").as("nbr_min"))
        val step = labels.join(neighborMin, Seq("node"), "left")
          .select(col("node"),
            least(col("component"), coalesce(col("nbr_min"), col("component")))
              .as("component"),
            (col("nbr_min") < col("component")).as("chg"))
        val updated = step.localCheckpoint()
        changed = updated.filter(col("chg")).count()
        prevCp.foreach(df => org.apache.spark.sql.graft.Bridge
          .materializedRdd(df).foreach(_.unpersist(blocking = false)))
        prevCp = Some(updated)
        labels = updated.select("node", "component")
        i += 1
        println(f"[profile]   C iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s changed=$changed")
      }
      labels.groupBy("component").agg(count(lit(1))).collect()
    }
    CacheScope.releaseAll()

    // variant D: C + pointer jumping, union-agg form
    timed("variant D total") {
      val sym = CacheScope.track(
        pairs.select(col("src"), col("dst"))
          .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
          .persist())
      var labels = sym.select(col("src").as("node")).distinct()
        .withColumn("component", col("node")).localCheckpoint()
    var prevSum = BigDecimal(-1)
      var converged = false
      var i = 0
      var prevCp: Option[DataFrame] = Some(labels)
      while (!converged && i < 20) {
        val t0 = System.nanoTime()
        val nbr = sym.join(labels, sym("dst") === labels("node"))
          .select(sym("src").as("node"), col("component"))
        val par = labels.select(col("node").as("pn"), col("component").as("pc"))
        val jump = labels.join(par, labels("component") === par("pn"))
          .select(labels("node"), col("pc").as("component"))
        val updated = nbr.unionAll(labels).unionAll(jump).groupBy("node")
          .agg(min("component").as("component")).localCheckpoint()
        val s = BigDecimal(updated.agg(sum("component")).head.getLong(0))
        prevCp.foreach(df => org.apache.spark.sql.graft.Bridge
          .materializedRdd(df).foreach(_.unpersist(blocking = false)))
        prevCp = Some(updated)
        labels = updated
        converged = s == prevSum
        prevSum = s
        i += 1
        println(f"[profile]   D iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s sum=$s")
      }
      labels.groupBy("component").agg(count(lit(1))).collect()
    }
    CacheScope.releaseAll()

    spark.stop()
  }
}
