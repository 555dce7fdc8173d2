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
  * The decode step itself is a STUB (this container has no media
  * codecs): a deterministic function of the bytes, so the Spark-side
  * plumbing — schema, encoders, partition-preserving batch shape — is
  * real and oracle-checkable end to end.
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
}
