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
  * Two decode tiers share that boundary: [[MediaCodec]]'s REAL
  * pure-JVM parsers (24-bpp BMP, PCM-16 WAV, uncompressed-DIB AVI —
  * gated by d5_decode_bmp / d5_decode_wav / d5_frames_avi against
  * arithmetic-replay oracles), and a residual STUB standing in only
  * for entropy-coded formats (JPEG/PNG/MP3) the container has no
  * libraries for — deterministic, so the plumbing stays
  * oracle-checkable end to end.
  */
object Multimodal {

  case class MediaMeta(lang: String, source: String)
  case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta,
                      label: Int)
  case class MediaFeature(doc_id: Long, lang: String, label: Int, feat: Long)

  /** STUB decoder: stands in for image/audio decode + featurize. Real
    * implementations replace only this function; the pipeline shape
    * (typed rows in, typed features out, partition-local batches) is
    * what the engine guarantees. Deterministic: byte length + first
    * code point of the UTF-8 payload (matches the oracle's
    * octet_length(encode(text)) + ascii(text) for any input, not just
    * ASCII — a raw first-byte read diverges on multibyte leads). */
  def decodeStub(m: MediaRow): MediaFeature = {
    val s = new String(m.media, java.nio.charset.StandardCharsets.UTF_8)
    MediaFeature(m.doc_id, m.meta.lang, m.label,
      m.media.length.toLong + (if (s.isEmpty) 0L else s.codePointAt(0).toLong))
  }

  /** Assemble the multimodal dataset: text payload as binary media,
    * metadata struct, embedding label. One narrow join (embeddings side
    * grouped by key — equi-join, shuffle-partitionable). */
  def assemble(spark: SparkSession, docs: DataFrame, embs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.join(embs, docs("doc_id") === embs("vec_id"))
      .select(col("doc_id"),
              col("text").cast("binary").as("media"),
              struct(col("lang"), col("source")).as("meta"),
              col("label"))
      .as[MediaRow]
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame-sampler: stands in for video frame extraction. Emits up
    * to `n` fixed-stride byte windows of the payload as one row per
    * frame — the real thing swaps the slicing for a codec call; the
    * engine-side shape (one media row fans out to n frame rows, typed,
    * partition-local) is what matters at scale. */
  def frameSampleStub(m: MediaRow, n: Int, frameBytes: Int = 8): Seq[Frame] = {
    if (n <= 0 || m.media.isEmpty) Seq.empty
    else {
      val stride = math.max(1, m.media.length / n)
      (0 until math.min(n, m.media.length)).map { i =>
        val start = i * stride
        Frame(m.doc_id, i,
          m.media.slice(start, math.min(start + frameBytes, m.media.length)))
      }.filter(_.frame.nonEmpty)
    }
  }

  /** STUB resize: truncate/pad the payload to `bytes` — stands in for
    * image resize; byte-length normalization is the deterministic
    * equivalent of fixing the output resolution. */
  def resizeStub(media: Array[Byte], bytes: Int): Array[Byte] =
    if (media.length >= bytes) media.take(bytes)
    else media ++ Array.fill[Byte](bytes - media.length)(0)

  /** Fan media rows out to sampled frames: flatMap at the typed boundary
    * (narrow — no shuffle; downstream ops see ordinary typed rows). */
  def sampleFrames(spark: SparkSession, rows: Dataset[MediaRow],
                   n: Int): Dataset[Frame] = {
    import spark.implicits._
    rows.flatMap(frameSampleStub(_, n))
  }

  /** Decode (stub) + aggregate features per (lang, label). The
    * mapPartitions call preserves partitioning; the aggregation after it
    * is an ordinary hash group-by. */
  def featuresByLangLabel(spark: SparkSession, docs: DataFrame,
                          embs: DataFrame): DataFrame = {
    import spark.implicits._
    assemble(spark, docs, embs)
      .mapPartitions(_.map(decodeStub))
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

  /** encode→REAL AVI container→frame-walk decode→per-frame stats: the
    * honest version of [[frameSampleStub]]'s fan-out — one media row
    * becomes one row per decoded frame, partition-local. */
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
