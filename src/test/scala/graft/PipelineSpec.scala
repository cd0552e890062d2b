package graft

import org.apache.spark.sql.functions._
import graft.functions.PointInPolygon
import graft.operators.Multimodal

/** Dedup / similarity / text / geo / multimodal blocks. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps lowest doc_id and counts copies") {
    val df = operators.Dedup.dedupExact(spark, sfDir).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getLong(2) === 2) // every injected dup appears exactly twice
      assert(r.getLong(1) % 10 === 0) // keeper is the original (low id)
    }
  }

  test("minhash LSH finds the injected exact duplicates") {
    val pairs = operators.Dedup.dedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every every-10th doc has an exact copy at id+1000000 → jaccard 1.0
    val exact = pairs.filter(_._3 == 1.0)
    assert(exact.nonEmpty)
    assert(exact.exists { case (a, b, _) => b - a == 1000000 })
  }

  test("leakage-safe split keeps near-dup pairs in one split, ~80/10/10") {
    val split = operators.Dedup.splitSafe(spark, sfDir)
    val byDoc = split.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = operators.Dedup.dedupNgram(spark, sfDir)
      .select("id_a", "id_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(byDoc(r.getLong(0)) === byDoc(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across partitions")
    }
    val frac = byDoc.values.groupBy(identity).view.mapValues(_.size.toDouble / byDoc.size).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95)
    assert(frac.getOrElse("val", 0.0) + frac.getOrElse("test", 0.0) > 0.05)
  }

  test("budget packing covers every doc once; bins near budget") {
    val bins = operators.TextAnalysis.packBudget(spark, sfDir).collect()
    val totalDocs = Tables.documents(spark, sfDir).count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    // a bin overflows the 2048 budget by at most one doc of its class
    // (class max length = 2^lc - 1)
    bins.foreach { r =>
      val lc = r.getAs[Long]("lc")
      val cap = 2048L + (1L << lc) - 1
      assert(r.getAs[Long]("bin_tokens") <= cap,
        s"bin (lc=$lc) holds ${r.getAs[Long]("bin_tokens")} > $cap")
    }
  }

  test("knn: identical vector ranks first with cosine 1") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val top = broadcast(q).join(emb)
      .withColumn("cos", expr(
        """aggregate(zip_with(q_emb, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin) /
        (sqrt(expr("aggregate(q_emb, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))")) *
          sqrt(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))"))))
      .orderBy(col("cos").desc).select("vec_id", "cos").head()
    assert(top.getLong(0) === 0L)
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-12)
  }

  test("IVF ANN: deterministic, and recalls brute-force neighbors") {
    val ivf = operators.Similarity.annIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ivf.length === 30) // 10 queries × top-3
    val again = operators.Similarity.annIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again === ivf) // Lloyd training is deterministic
    // recall@3 against exact top-5: every query should recover ≥1 true neighbor
    val exact = operators.Similarity.knnCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = ivf.groupBy(_._1).map { case (q, rs) =>
      rs.map(_._3).count(exact(q).contains)
    }
    assert(hits.sum >= 10, s"IVF recall too low: ${hits.sum}/30 hits")
  }

  test("point-in-polygon: non-convex polygon (ray casting)") {
    // U-shaped polygon: (0,0)(6,0)(6,5)(4,5)(4,2)(2,2)(2,5)(0,5)
    val xs = Seq(0.0, 6.0, 6.0, 4.0, 4.0, 2.0, 2.0, 0.0)
    val ys = Seq(0.0, 0.0, 5.0, 5.0, 2.0, 2.0, 5.0, 5.0)
    val pts = Seq(
      (1.0, 4.0, true),   // left arm
      (5.0, 4.0, true),   // right arm
      (3.0, 4.0, false),  // the notch
      (3.0, 1.0, true),   // base
      (7.0, 1.0, false),  // outside
    ).toDF("x", "y", "expected")
    val out = pts.withColumn("got",
        PointInPolygon(col("x"), col("y"),
          typedLit(xs), typedLit(ys)))
      .collect()
    out.foreach(r => assert(r.getBoolean(2) === r.getBoolean(3),
      s"point (${r.getDouble(0)}, ${r.getDouble(1)})"))
  }

  test("wkt polygon text parses and drives the ray caster (closed ring, non-convex)") {
    import graft.functions.Wkt
    // the same U-shape as the PIP spec, serialized as closed-ring WKT
    // with deliberately-irregular whitespace
    val wkt = "POLYGON(( 0 0, 6 0,6 5, 4 5, 4 2,2 2, 2 5, 0 5, 0 0 ))"
    val parsed = Seq(Tuple1(wkt)).toDF("wkt")
      .select(Wkt.xs(col("wkt")).as("xs"), Wkt.ys(col("wkt")).as("ys"))
    val row = parsed.head()
    assert(row.getSeq[Double](0) === Seq(0.0, 6.0, 6.0, 4.0, 4.0, 2.0, 2.0, 0.0, 0.0))
    assert(row.getSeq[Double](1) === Seq(0.0, 0.0, 5.0, 5.0, 2.0, 2.0, 5.0, 5.0, 0.0))
    // the duplicate closing vertex must not change even-odd membership
    val pts = Seq(
      (1.0, 4.0, true), (5.0, 4.0, true), (3.0, 4.0, false),
      (3.0, 1.0, true), (7.0, 1.0, false),
    ).toDF("x", "y", "expected")
    val out = pts.crossJoin(parsed)
      .withColumn("got", PointInPolygon(col("x"), col("y"), col("xs"), col("ys")))
      .collect()
    out.foreach(r => assert(r.getAs[Boolean]("expected") === r.getAs[Boolean]("got"),
      s"point (${r.getDouble(0)}, ${r.getDouble(1)})"))
  }

  test("space-saving topk: exact under capacity, bounded over capacity") {
    import graft.functions.TopKAgg
    val words = (1 to 100).map(i => s"common$i") ++          // 100 singles
      Seq.fill(50)("hot1") ++ Seq.fill(30)("hot2")           // 2 heavy hitters
    val df = words.map(Tuple1(_)).toDF("w")
    // capacity 1024 > distinct: exact
    val exact = df.agg(TopKAgg.topkItems(col("w"), 2).as("top"))
      .selectExpr("inline(top)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(exact.toSeq === Seq(("hot1", 50L), ("hot2", 30L)))
    // capacity 8 < distinct: still surfaces the true heavy hitters,
    // counts may overestimate (space-saving guarantee), never under
    val approx = df.agg(TopKAgg.topkItems(col("w"), 2, capacity = 8).as("top"))
      .selectExpr("inline(top)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(approx.map(_._1).contains("hot1"))
    assert(approx.collectFirst { case ("hot1", c) => c }.get >= 50L)
  }

  test("language id covers all labels and is deterministic") {
    val m = operators.TextAnalysis.langId(spark, sfDir)
      .groupBy("lang").agg(sum("n")).collect()
    assert(m.length === 5)
  }

  test("media codecs round-trip planted header fields through real bytes") {
    import graft.functions.MediaCodec._
    for ((w, h) <- Seq((1, 1), (8, 56), (71, 13), (640, 480))) {
      val png = pngEncode(w, h, Array[Byte](1, 2, 3, 4, 5))
      val info = pngDecode(png).get
      assert((info.width, info.height, info.bitDepth, info.colorType) === ((w, h, 8, 0)))
      assert(info.crcOk && info.pixelsOk, s"png $w x $h failed integrity")
    }
    val wav = wavEncode(channels = 2, sampleRate = 22050, nSamples = 100, Array[Byte](9, 8))
    val wi = wavDecode(wav).get
    assert((wi.channels, wi.sampleRate, wi.bitsPerSample, wi.nSamples) === ((2, 22050, 16, 100L)))
    val gif = gifEncode(320, 200)
    val gi = gifDecode(gif).get
    assert((gi.width, gi.height, gi.version, gi.terminated) === ((320, 200, "89a", true)))
    // corruption must be DETECTED, not silently passed through: flip a
    // byte inside the IHDR data and the stored CRC no longer verifies
    val corrupt = pngEncode(16, 16, Array[Byte](7)).clone()
    corrupt(18) = (corrupt(18) ^ 0x40).toByte // width field inside IHDR
    assert(pngDecode(corrupt).exists(i => !i.crcOk))
    // truncated IDAT → scanline count mismatch
    val png2 = pngEncode(16, 16, Array[Byte](7))
    val truncated = png2.take(png2.length - 20) :+ 0.toByte
    assert(!pngDecode(truncated).exists(i => i.pixelsOk))
    assert(wavDecode("not a wav at all".getBytes).isEmpty)
    assert(gifDecode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("multimodal decode recovers planted dimensions from payload bytes alone") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val byId = media.collect().map(r => r.doc_id -> r).toMap
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === byId.size)
    feats.foreach { f =>
      val planted = byId(f.doc_id)
      assert(f.ok === 1.0, s"doc ${f.doc_id} (${f.modality}) failed decode integrity")
      f.modality match {
        case "image" =>
          assert((f.dim0, f.dim1, f.depth) ===
            ((planted.width.toDouble, planted.height.toDouble, 8.0)))
        case "audio" =>
          assert(f.dim0 === 4000.0 + planted.width * 50) // sample rate
          assert(f.dim1 === (planted.width + planted.height).toDouble) // samples
          assert(f.depth === 16.0)
        case _ =>
          assert((f.dim0, f.dim1) === ((planted.width.toDouble, planted.height.toDouble)))
      }
    }
  }

  test("multimodal resize re-encodes real PNGs at reduced dimensions") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val resized = Multimodal.resize(media, maxDim = 16).collect()
    resized.filter(_.modality == "image").foreach { r =>
      val info = graft.functions.MediaCodec.pngDecode(r.payload).get
      assert((info.width, info.height) === ((r.width, r.height)),
        s"doc ${r.doc_id}: payload header disagrees with updated metadata")
      assert(info.crcOk && info.pixelsOk)
      assert(math.max(info.width, info.height) <= 31) // maxDim=16, floor-div scale
    }
    // non-image modalities pass through byte-identical
    val origById = media.collect().map(r => r.doc_id -> r.payload).toMap
    resized.filter(_.modality != "image").foreach { r =>
      assert(r.payload.sameElements(origById(r.doc_id)))
    }
    val frames = Multimodal.sampleFrames(media, everyN = 2)
    assert(frames.columns.toSeq === Seq("doc_id", "frame_idx", "frame_bytes"))
    val f = frames.collect()
    assert(f.nonEmpty)
    assert(f.forall(_.getInt(1) % 2 == 0)) // only every 2nd frame kept
  }
}
