package graft.operators

import graft.{Op, Tables}
import graft.functions.MediaCodec
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: media payloads travel as opaque binary columns
  * next to typed metadata. */
final case class MediaRecord(
    doc_id: Long,
    modality: String,
    payload: Array[Byte],
    width: Int,
    height: Int,
)

/** Decoded facts for one media record — every field recovered from the
  * PAYLOAD BYTES, never copied from the metadata columns:
  *  - image (PNG):  dim0=width, dim1=height, depth=bit depth,
  *    ok=1 iff IHDR CRC verifies AND the inflated IDAT scanline count
  *    matches height·(1+width)
  *  - audio (WAV):  dim0=sample rate, dim1=sample count, depth=bits
  *    per sample, ok=1 iff RIFF/WAVE + fmt parse
  *  - video (GIF):  dim0=width, dim1=height, depth=0 (no depth in the
  *    logical screen descriptor), ok=1 iff trailer byte present
  */
final case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Int,
    dim0: Double, dim1: Double, depth: Double, ok: Double,
)

/** Multimodal-column plumbing (SURVEY.md §2 block C): schema, typed
  * Dataset encoders, and per-partition batched decode. The codecs are
  * REAL public-format parsers (functions/MediaCodec.scala): PNG with
  * chunk CRCs and zlib-inflated scanline verification, RIFF/WAVE
  * header walk, GIF89a screen descriptor — pure JVM (`java.util.zip`),
  * no external media libraries. A production build swaps MediaCodec
  * for libjpeg/ffmpeg bindings; every Spark-side contract (binary
  * columns, partition batching, typed output schema) stays.
  *
  * Scale: decode is mapPartitions (per-partition codec init, no
  * per-row setup); payloads stay columnar/binary end to end; metadata
  * prunes independently of payload bytes (parquet column pruning means
  * metadata-only queries never read the blobs).
  */
object Multimodal {

  /** Build a media table from documents: each row carries a VALID
    * media container synthesized from the planted metadata — a real
    * PNG/WAV/GIF whose header fields the decode step must recover from
    * bytes alone. Content bytes derive from md5(text) (deterministic). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        unhex(md5(col("text"))).as("content"),
        (col("n_chars") % 64 + 8).cast("int").as("width"),
        (col("n_chars") % 48 + 8).cast("int").as("height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, modality, content, w, h) =>
        val payload = modality match {
          case "image" => MediaCodec.pngEncode(w, h, content)
          case "audio" => MediaCodec.wavEncode(
            channels = 1 + (h % 2), sampleRate = 4000 + w * 50,
            nSamples = w + h, content = content)
          case _ => MediaCodec.gifEncode(w, h)
        }
        MediaRecord(id, modality, payload, w, h)
      })
  }

  /** Per-partition batched decode over the binary column — parses the
    * actual container bytes (see [[MediaFeatures]] for the mapping). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec initialization would go here (once, not per row)
      it.map { r =>
        val (d0, d1, dep, ok) = r.modality match {
          case "image" => MediaCodec.pngDecode(r.payload) match {
            case Some(i) => (i.width.toDouble, i.height.toDouble, i.bitDepth.toDouble,
              if (i.crcOk && i.pixelsOk) 1.0 else 0.0)
            case None => (-1.0, -1.0, -1.0, 0.0)
          }
          case "audio" => MediaCodec.wavDecode(r.payload) match {
            case Some(i) => (i.sampleRate.toDouble, i.nSamples.toDouble,
              i.bitsPerSample.toDouble, 1.0)
            case None => (-1.0, -1.0, -1.0, 0.0)
          }
          case _ => MediaCodec.gifDecode(r.payload) match {
            case Some(i) => (i.width.toDouble, i.height.toDouble, 0.0,
              if (i.terminated) 1.0 else 0.0)
            case None => (-1.0, -1.0, -1.0, 0.0)
          }
        }
        MediaFeatures(r.doc_id, r.modality, r.payload.length, d0, d1, dep, ok)
      }
    }
  }

  /** Real nearest-neighbor resize for image rows — inflate the PNG
    * scanlines, subsample, re-encode (MediaCodec.pngResize); non-image
    * modalities pass through unchanged (a real pipeline routes them to
    * an audio/video scaler instead). */
  def resize(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.modality != "image") r
      else MediaCodec.pngResize(r.payload, maxDim) match {
        // dims come back from the codec's DECODED header — one source
        // of truth, so the record can never disagree with its payload
        case Some((p, nw, nh)) => r.copy(payload = p, width = nw, height = nh)
        case None => r // undecodable payload left untouched
      }
    })
  }

  /** Frame sampling: every n-th fixed-size byte group of a video
    * payload becomes its own row with the frame index in metadata —
    * the explode-shaped op a real frame-sampler produces. (The GIF
    * payloads carry no embedded frames, so "frame" = byte pair here;
    * a production sampler swaps the grouping for codec frame bounds.) */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video")
      .flatMap { r =>
        r.payload.grouped(2).zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (frame, idx) => (r.doc_id, idx, frame) }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }

  def multimodal(spark: SparkSession, dir: String): DataFrame = {
    // media is read twice (decode + metadata cross-check join) — cache
    // the encoded payloads so the synth/encode pass runs once
    val media = mediaTable(spark, dir).persist()
    graft.CacheScope.track(media.toDF())
    val feats = extractFeatures(media).toDF()
    val meta = media.toDF().select(col("doc_id"), col("width"), col("height"))
    // driver-visible self-certification: every decoded dimension must
    // equal the value planted in the metadata columns — recovered from
    // PAYLOAD BYTES alone, so an encoder or decoder regression flips
    // meta_match to 0.0 and the rows-only gate sees it (crc_ok already
    // covers checksum/scanline verification via the codecs' `ok`)
    val dimsOk = when(col("modality") === "audio",
        col("dim0") === lit(4000) + col("width") * 50 &&
          col("dim1") === col("width") + col("height"))
      .otherwise(col("dim0") === col("width") && col("dim1") === col("height"))
    feats.join(meta, "doc_id")
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        round(avg("dim0"), 4).as("avg_dim0"),
        round(avg("dim1"), 4).as("avg_dim1"),
        min("ok").as("crc_ok"), // 1.0 ⇔ every payload parsed + CRC/structure verified
        min(when(dimsOk, 1.0).otherwise(0.0)).as("meta_match"),
        sum("n_bytes").as("total_bytes"))
      .orderBy("modality")
  }

  /** Resize as a driver-visible ORACLE-BACKED query: encode → resize
    * (inflate, nearest-neighbor subsample, re-encode) → decode the
    * RESIZED payload bytes, and emit each row's output dimensions. The
    * resize dimension rule is pure integer arithmetic
    * (scale = max(1, max(w,h) div maxDim); out = max(1, dim div
    * scale)), so DuckDB replays it from the planted metadata — but the
    * Spark side recovers the dims by DECODING the re-encoded PNG, so a
    * regression anywhere in the inflate/subsample/encode/decode chain
    * hash-fails, not just the arithmetic. Non-image modalities pass
    * through with their payloads untouched. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resize(mediaTable(spark, dir), maxDim = 16)
      .mapPartitions(_.map { r =>
        if (r.modality == "image") {
          val d = MediaCodec.pngDecode(r.payload)
          (r.doc_id, r.modality,
            d.map(_.width.toLong).getOrElse(-1L),
            d.map(_.height.toLong).getOrElse(-1L),
            if (d.exists(i => i.crcOk && i.pixelsOk)) 1L else 0L)
        } else (r.doc_id, r.modality, r.width.toLong, r.height.toLong, 1L)
      })
      .toDF("doc_id", "modality", "out_w", "out_h", "ok")
      .orderBy("doc_id")
  }

  private val mediaResizeOracle =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |      WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |    n_chars % 64 + 8 AS w, n_chars % 48 + 8 AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, modality, w, h,
      |    greatest(1, greatest(w, h) // 16) AS scale
      |  FROM m)
      |SELECT doc_id, modality,
      |  CAST(CASE WHEN modality = 'image' THEN greatest(1, w // scale)
      |       ELSE w END AS BIGINT) AS out_w,
      |  CAST(CASE WHEN modality = 'image' THEN greatest(1, h // scale)
      |       ELSE h END AS BIGINT) AS out_h,
      |  CAST(1 AS BIGINT) AS ok
      |FROM r ORDER BY doc_id""".stripMargin

  /** Frame sampling as a driver-visible ORACLE-BACKED query: every 3rd
    * fixed-size frame of each video payload, with the frame BYTES
    * surfaced as hex. The GIF containers are deterministic (14 bytes:
    * magic, LE dims, flags, trailer), so the oracle derives the exact
    * bytes of every sampled frame from the planted metadata — frame 0
    * is the magic ("GI"), frame 3 spans the little-endian width byte,
    * frame 6 ends at the 0x3B trailer. Any drift in the encoder, the
    * grouping, or the sampling stride hash-fails at the byte level. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), everyN = 3)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        hex(col("frame_bytes")).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  private val frameSampleOracle =
    """WITH v AS (
      |  SELECT doc_id, n_chars % 64 + 8 AS w
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT doc_id, w, unnest([0, 3, 6]) AS frame_idx FROM v)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CASE frame_idx WHEN 0 THEN '4749'
      |    WHEN 3 THEN lpad(hex(w), 2, '0') || '00'
      |    ELSE '003B' END AS frame_hex
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_multimodal", multimodal, None),
    Op("q_media_resize", mediaResize, Some(mediaResizeOracle)),
    Op("q_frame_sample", frameSample, Some(frameSampleOracle)),
  )
}
