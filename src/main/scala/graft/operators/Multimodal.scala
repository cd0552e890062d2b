package graft.operators

import graft.{Op, Tables}
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

/** Extracted features for one media record. */
final case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Int,
    f0: Double, f1: Double, f2: Double, f3: Double,
)

/** Multimodal-column plumbing (SURVEY.md §2 block C): schema, typed
  * Dataset encoders, and per-partition batched "decode" — the shape a
  * real image/audio pipeline takes on Spark. The actual codec is
  * STUBBED (no media libs in this environment) with a deterministic
  * fake; everything around it — binary column handling, partition
  * batching, typed output schema — is real and tested.
  *
  * Scale: decode is mapPartitions (per-partition codec init, no
  * per-row setup); payloads stay columnar/binary end to end; metadata
  * prunes independently of payload bytes (parquet column pruning means
  * metadata-only queries never read the blobs).
  */
object Multimodal {

  /** STUB decoder — stands in for libjpeg/ffmpeg/etc. Deterministic:
    * derives "features" from payload bytes so tests can assert values.
    * A production build swaps ONLY this function. */
  def decodeStub(payload: Array[Byte], width: Int, height: Int): (Double, Double, Double, Double) = {
    var s0 = 0L; var s1 = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      s0 += b
      s1 += b.toLong * b
      i += 1
    }
    val n = math.max(payload.length, 1)
    val mean = s0.toDouble / n
    val varr = s1.toDouble / n - mean * mean
    (mean, varr, width.toDouble * height, payload.length.toDouble)
  }

  /** Build a media table from documents: payload = md5(text) bytes
    * (deterministic fake image), modality from doc_id. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        unhex(md5(col("text"))).as("payload"),
        (col("n_chars") % 64 + 8).cast("int").as("width"),
        (col("n_chars") % 48 + 8).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Per-partition batched feature extraction over the binary column. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec initialization would go here (once, not per row)
      it.map { r =>
        val (f0, f1, f2, f3) = decodeStub(r.payload, r.width, r.height)
        MediaFeatures(r.doc_id, r.modality, r.payload.length, f0, f1, f2, f3)
      }
    }
  }

  /** STUB resize — stands in for an image scaler. Deterministic: keeps
    * every k-th byte so output size tracks the requested scale; updates
    * the typed metadata alongside the payload (the real contract). */
  def resizeStub(r: MediaRecord, maxDim: Int): MediaRecord = {
    val scale = math.max(1, math.max(r.width, r.height) / math.max(1, maxDim))
    val out = r.payload.indices.collect { case i if i % scale == 0 => r.payload(i) }
    r.copy(payload = out.toArray, width = r.width / scale, height = r.height / scale)
  }

  /** Batched resize over the binary column. */
  def resize(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(resizeStub(_, maxDim)))
  }

  /** STUB frame sampling — a "video" payload yields every n-th "frame"
    * (byte pair) as its own row: the explode-shaped op a real
    * frame-sampler produces, with frame index carried in metadata. */
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
    val feats = extractFeatures(mediaTable(spark, dir))
    feats.toDF()
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        round(avg("f0"), 4).as("avg_mean_byte"),
        round(avg("f2"), 2).as("avg_pixels"),
        sum("n_bytes").as("total_bytes"))
      .orderBy("modality")
  }

  val ops: Seq[Op] = Seq(
    Op("q_multimodal", multimodal, None),
  )
}
