package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.B D5): media payloads ride as
  * opaque `binary` columns beside typed metadata structs and embedding
  * vectors; per-item decode/feature-extraction runs at a typed
  * mapPartitions boundary — the one place imperative per-item work is
  * the right Spark tool, because a real decoder (image/audio codec) is
  * a library call, not a column expression.
  *
  * Every decode here is [[MediaCodec]]'s REAL pure-JVM parsing (24-bpp
  * BMP, PCM-16 WAV, uncompressed-DIB AVI — plus zlib PNG): the binary
  * column holds genuinely decodable bytes, the decoders walk headers
  * and byte layout for real, and the gated statistics are
  * position-weighted so a misread of row padding, the bottom-up flip,
  * or a RIFF chunk size fails the arithmetic-replay oracles
  * (d5_multimodal / d5_frames / d5_decode_* / d5_frames_avi). The
  * round-6 decode stub is retired.
  */
object Multimodal {

  case class MediaMeta(lang: String, source: String)
  case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta,
                      label: Int)
  case class MediaFeature(doc_id: Long, lang: String, label: Int, feat: Long)

  /** Assemble the multimodal dataset: a REAL 24-bpp BMP (8×4, pixel
    * field from the SQL-replayable rule seeded by doc_id) as the
    * binary media column, metadata struct, embedding label. One narrow
    * join (equi-join, shuffle-partitionable); the encode runs at the
    * typed boundary, so the column carries bytes any stock viewer
    * opens. */
  def assemble(spark: SparkSession, docs: DataFrame, embs: DataFrame)
      : Dataset[MediaRow] = {
    import spark.implicits._
    docs.join(embs, docs("doc_id") === embs("vec_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("label"))
      .as[(Long, String, String, Int)]
      .mapPartitions(_.map { case (id, lang, source, label) =>
        MediaRow(id, MediaCodec.encodeBmp(8, 4, bmpPixels(id, 8, 4)),
          MediaMeta(lang, source), label)
      })
  }

  /** REAL nearest-neighbor resize on decoded top-down BGR pixels —
    * output pixel (x,y) samples source pixel (x·sw/dw, y·sh/dh), the
    * standard integer nearest-neighbor map. */
  def resizeNearest(img: MediaCodec.BmpImage, dw: Int, dh: Int)
      : MediaCodec.BmpImage = {
    require(dw > 0 && dh > 0, s"resizeNearest: bad target ${dw}x$dh")
    val out = new Array[Byte](dw * dh * 3)
    var y = 0
    while (y < dh) {
      val sy = y * img.height / dh
      var x = 0
      while (x < dw) {
        val sx = x * img.width / dw
        System.arraycopy(img.bgr, (sy * img.width + sx) * 3,
          out, (y * dw + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    MediaCodec.BmpImage(dw, dh, out)
  }

  /** REAL decode + featurize: parse the media column's BMP bytes,
    * nearest-neighbor resize 8×4 → 4×2 (the fixed-resolution
    * normalization every image pipeline runs), and emit the
    * position-weighted channel sum Σ (1+j)·chsum(pixel j) over the
    * RESIZED image — weighting by output position gates both the
    * decode layout and the resize sampling map. */
  def decodeFeature(m: MediaRow): MediaFeature = {
    val img = resizeNearest(MediaCodec.decodeBmp(m.media), 4, 2)
    var feat = 0L
    var j = 0
    while (j < img.width * img.height) {
      val v = (img.bgr(3 * j) & 0xff) + (img.bgr(3 * j + 1) & 0xff) +
              (img.bgr(3 * j + 2) & 0xff)
      feat += (1L + j) * v
      j += 1
    }
    MediaFeature(m.doc_id, m.meta.lang, m.label, feat)
  }

  case class Frame(doc_id: Long, frame_idx: Int, sum_ch: Long, wsum_ch: Long)

  /** Assemble video rows: a REAL 5-frame uncompressed-DIB AVI (6×2 —
    * width 6 forces 2 pad bytes per DIB row) as the binary column. */
  def assembleVideo(spark: SparkSession, docs: DataFrame, embs: DataFrame)
      : Dataset[MediaRow] = {
    import spark.implicits._
    docs.join(embs, docs("doc_id") === embs("vec_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("label"))
      .as[(Long, String, String, Int)]
      .mapPartitions(_.map { case (id, lang, source, label) =>
        MediaRow(id, MediaCodec.encodeAviDib(6, 2, 25,
          (0 until 5).map(f => aviFramePixels(id, f, 6, 2))),
          MediaMeta(lang, source), label)
      })
  }

  /** REAL frame sampling: decode the media column's AVI container
    * (RIFF tree walk), keep every `stride`-th decoded frame, and emit
    * one row per sampled frame with position-weighted channel stats —
    * frame_idx is the ORIGINAL frame number, so the sampling pattern
    * itself is oracle-visible. flatMap at the typed boundary (narrow —
    * no shuffle; downstream ops see ordinary typed rows). */
  def sampleFrames(spark: SparkSession, rows: Dataset[MediaRow],
                   stride: Int): Dataset[Frame] = {
    import spark.implicits._
    require(stride >= 1, s"sampleFrames: stride $stride")
    rows.flatMap { m =>
      val (w, h, frames) = MediaCodec.decodeAviFrames(m.media)
      frames.zipWithIndex.collect {
        case (bgr, f) if f % stride == 0 =>
          var sum = 0L; var wsum = 0L; var i = 0
          val n = w * h
          while (i < n) {
            val v = (bgr(3 * i) & 0xff) + (bgr(3 * i + 1) & 0xff) +
                    (bgr(3 * i + 2) & 0xff)
            sum += v; wsum += i.toLong * v; i += 1
          }
          Frame(m.doc_id, f, sum, wsum)
      }
    }
  }

  /** REAL decode + aggregate features per (lang, label). The
    * mapPartitions call preserves partitioning; the aggregation after it
    * is an ordinary hash group-by. */
  def featuresByLangLabel(spark: SparkSession, docs: DataFrame,
                          embs: DataFrame): DataFrame = {
    import spark.implicits._
    assemble(spark, docs, embs)
      .mapPartitions(_.map(decodeFeature))
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("n"), sum("feat").as("sum_feat"))
  }

  // ---- REAL decode (round 7): MediaCodec at the same boundary -------
  //
  // The stub above stands in for codecs the container lacks; the
  // functions below run [[MediaCodec]]'s ACTUAL parsers (24-bpp BMP,
  // PCM-16 WAV, uncompressed-DIB AVI). Media bytes are synthesized
  // per document from SQL-replayable integer pixel/sample rules, so
  // the oracle recomputes the decoded statistics independently — and
  // the statistics are POSITION-weighted, so a decoder that misreads
  // row padding, the bottom-up flip, or a RIFF chunk size is caught,
  // not just byte length.

  final case class ImageStat(doc_id: Long, n_px: Int, sum_ch: Long,
                             wsum_ch: Long)
  final case class AudioStat(doc_id: Long, n_samples: Int, sum_amp: Long,
                             wsum_amp: Long)
  final case class FrameStat(doc_id: Long, frame_idx: Int, sum_ch: Long,
                             wsum_ch: Long)

  /** The SQL-replayable pixel rule: pixel i of doc d is
    * B=(d·31+i·7)%256, G=(d·17+i·11)%256, R=(d·13+i·3)%256. */
  def bmpPixels(docId: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { j =>
      val i = j / 3
      (j % 3 match {
        case 0 => (docId * 31 + i * 7)  % 256
        case 1 => (docId * 17 + i * 11) % 256
        case _ => (docId * 13 + i * 3)  % 256
      }).toByte
    }

  /** The SQL-replayable sample rule: s_i = ((d·13+i·5) % 65536) − 32768
    * — full signed 16-bit range, so sign handling is exercised. */
  def wavSamples(docId: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (((docId * 13 + i * 5) % 65536) - 32768).toShort)

  /** Frame f of doc d reuses the pixel rule shifted by the frame index,
    * so every frame of every doc is distinct. */
  def aviFramePixels(docId: Long, f: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { j =>
      val i = j / 3
      (j % 3 match {
        case 0 => (docId * 31 + f * 19 + i * 7)  % 256
        case 1 => (docId * 17 + f * 23 + i * 11) % 256
        case _ => (docId * 13 + f * 29 + i * 3)  % 256
      }).toByte
    }

  private def sumChannels(bgr: Array[Byte]): (Long, Long) = {
    var sum = 0L; var wsum = 0L; var i = 0
    val n = bgr.length / 3
    while (i < n) {
      val v = (bgr(3 * i) & 0xff) + (bgr(3 * i + 1) & 0xff) +
              (bgr(3 * i + 2) & 0xff)
      sum += v; wsum += i.toLong * v; i += 1
    }
    (sum, wsum)
  }

  /** encode→REAL BMP bytes→decode→per-pixel stats, all partition-local
    * (one narrow pass over doc ids, no shuffle). */
  def bmpRoundtripStats(spark: SparkSession, ids: DataFrame,
                        w: Int = 8, h: Int = 4): Dataset[ImageStat] = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val img = MediaCodec.decodeBmp(
        MediaCodec.encodeBmp(w, h, bmpPixels(id, w, h)))
      val (sum, wsum) = sumChannels(img.bgr)
      ImageStat(id, img.width * img.height, sum, wsum)
    })
  }

  /** The PNG pixel rule — distinct multipliers from [[bmpPixels]] so
    * the png row's gated values differ from the bmp row's:
    * R=(d·37+i·5)%256, G=(d·23+i·13)%256, B=(d·11+i·17)%256. */
  def pngPixels(docId: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { j =>
      val i = j / 3
      (j % 3 match {
        case 0 => (docId * 37 + i * 5)  % 256
        case 1 => (docId * 23 + i * 13) % 256
        case _ => (docId * 11 + i * 17) % 256
      }).toByte
    }

  /** encode→REAL PNG bytes (zlib DEFLATE, Sub/Paeth-filtered
    * scanlines)→decode→per-pixel stats. 9×3: a width that is no
    * multiple of 4, so any BMP-padding assumption leaking into the
    * PNG path would shear the rows and fail the weighted sum. */
  def pngRoundtripStats(spark: SparkSession, ids: DataFrame,
                        w: Int = 9, h: Int = 3): Dataset[ImageStat] = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val img = MediaCodec.decodePng(
        MediaCodec.encodePng(w, h, pngPixels(id, w, h)))
      var sum = 0L; var wsum = 0L; var i = 0
      val n = img.width * img.height
      while (i < n) {
        val v = (img.rgb(3 * i) & 0xff) + (img.rgb(3 * i + 1) & 0xff) +
                (img.rgb(3 * i + 2) & 0xff)
        sum += v; wsum += i.toLong * v; i += 1
      }
      ImageStat(id, n, sum, wsum)
    })
  }

  /** encode→REAL WAV bytes→RIFF-walk decode→sample stats. */
  def wavRoundtripStats(spark: SparkSession, ids: DataFrame,
                        n: Int = 100): Dataset[AudioStat] = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val audio = MediaCodec.decodeWav(
        MediaCodec.encodeWavPcm16(8000, wavSamples(id, n)))
      var sum = 0L; var wsum = 0L; var i = 0
      while (i < audio.samples.length) {
        sum += audio.samples(i); wsum += i.toLong * audio.samples(i); i += 1
      }
      AudioStat(id, audio.samples.length, sum, wsum)
    })
  }

  /** encode→REAL AVI container→frame-walk decode→per-frame stats:
    * one media row becomes one row per decoded frame,
    * partition-local (the stride-sampled fan-out the retired round-7
    * stub only simulated). */
  def aviFrameStats(spark: SparkSession, ids: DataFrame, frames: Int = 4,
                    w: Int = 4, h: Int = 2): Dataset[FrameStat] = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions(_.flatMap { id =>
      val avi = MediaCodec.encodeAviDib(w, h, 25,
        (0 until frames).map(f => aviFramePixels(id, f, w, h)))
      val (dw, dh, decoded) = MediaCodec.decodeAviFrames(avi)
      require(dw == w && dh == h, s"AVI decode returned ${dw}x$dh")
      decoded.zipWithIndex.map { case (bgr, f) =>
        val (sum, wsum) = sumChannels(bgr)
        FrameStat(id, f, sum, wsum)
      }
    })
  }
}
