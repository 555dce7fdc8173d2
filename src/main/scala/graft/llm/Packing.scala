package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: lay documents end-to-end
  * in a deterministic stream and chunk the stream into fixed-size context
  * windows (GPT-style concat-and-chunk). Each document is tagged with the
  * window (`pack_id`) its first token lands in and its token offset
  * (`pos`) inside that window — everything a loader needs to materialize
  * packed sequences without re-scanning the corpus.
  *
  * Scale posture: one window per stratum (shuffle keyed on the stratum),
  * running-sum only — no global order. A stratum is a source/shard key,
  * so parallelism is the stratum count; for a skewed giant source, pack
  * per (source, shard) with shard-local window ids — the plan shape is
  * unchanged. Deterministic by construction (stream order is the id
  * sort), so re-runs and retries produce identical packs.
  */
object Packing {

  /** Assign each document its context-window id and in-window offset.
    * Token count is the whitespace tokenizer used across the D4/D6
    * operators. Documents may straddle a boundary (standard
    * concat-and-chunk semantics): `pos + n_tokens > ctx` means the tail
    * spills into `pack_id + 1`. `carry` names extra columns of `docs` to
    * pass through unchanged (manifest metadata — fingerprints, redaction
    * counts), riding the same single window pass. */
  def sequencePack(docs: DataFrame, id: Column, text: Column,
                   stratum: Column, ctx: Int,
                   carry: Seq[String] = Nil): DataFrame =
    packByCount(docs, id, size(split(text, " ")), stratum, ctx, carry)

  /** [[sequencePack]] over a PRE-COUNTED token column — the tokenized
    * composition uses this with the REAL BPE token counts from
    * [[Bpe.encodeIds]] instead of the whitespace proxy; the window pass
    * is identical. */
  def packByCount(docs: DataFrame, id: Column, nTokens: Column,
                  stratum: Column, ctx: Int,
                  carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(stratum.as("source") +: id.as("doc_id") +:
              nTokens.as("n_tokens") +: carry.map(col): _*)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("source") +: col("doc_id") +: col("n_tokens") +:
        floor((col("cum") - col("n_tokens")) / lit(ctx.toDouble))
          .cast("int").as("pack_id") +:
        ((col("cum") - col("n_tokens")) % ctx).cast("int").as("pos") +:
        carry.map(col): _*)
  }

  /** Per-document sliding-window chunking (the RAG/embedding-indexing
    * shape, complementing [[sequencePack]]'s cross-document concat):
    * window of `window` tokens advancing by `stride`, final partial
    * window kept. Pure per-row fan-out — `sequence` + explode over the
    * row's own chunk count, NO shuffle (each chunk row carries its
    * doc_id, 1-based start token, length, and the md5 of the re-joined
    * chunk text — the id an embedding/dedup stage keys on).
    *
    * Chunk count is exact integer ceil (`1 + (n - w + s - 1) div s`),
    * so the fan-out is engine-reproducible. Empty-text docs produce no
    * chunks — guarded on text length, because the whitespace tokenizer
    * never yields zero tokens (`split("", " ")` is `[""]`, which would
    * otherwise fabricate an identical md5('')-keyed junk chunk per
    * empty doc).
    *
    * Downstream note: the pipe_rag_index ORACLE encodes (doc_id,
    * chunk_id) as doc_id·2^20 + chunk_id, so its replay is valid while
    * chunk_id < 2^20 (~50M tokens per doc at the default window/stride);
    * the Spark-side struct min carries no such bound. */
  def chunkOverlap(docs: DataFrame, id: Column, text: Column,
                   window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .filter(length(text) >= 1)
      .select(id.as("doc_id"), split(text, " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .withColumn("nc", when(col("n") <= window, lit(1L))
        .otherwise(lit(1L) +
          expr(s"(n - $window + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("toks"), col("n"),
              explode(sequence(lit(0L), col("nc") - 1)).as("c"))
      .select(col("doc_id"),
        col("c").cast("int").as("chunk_id"),
        (col("c") * stride + 1).cast("int").as("start_tok"),
        least(lit(window), col("n") - col("c") * stride).cast("int")
          .as("n_tok"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("c") * stride + 1).cast("int"),
            least(lit(window), col("n") - col("c") * stride).cast("int"))))
          .as("chunk_md5"))
  }
}
