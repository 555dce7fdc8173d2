package graft.stream

import org.apache.spark.sql.DataFrame
import graft.catalog.SnapshotTable

/** EXACTLY-ONCE micro-batch ingest into a [[SnapshotTable]] — the
  * `foreachBatch` sink that makes the snapshot protocol a streaming
  * target (S21). Structured Streaming guarantees at-least-once
  * delivery of each (batchId, data) pair to `foreachBatch` with
  * DETERMINISTIC replay after a restart; exactly-once therefore
  * reduces to making the commit IDEMPOTENT PER BATCH ID, which the
  * manifest's `tag` field already supports: each batch commits with
  * tag `ingest-<batchId>`, and a replayed batch whose tag is already
  * in [[SnapshotTable.committedTags]] is a no-op. A CRASH between the
  * data write and the manifest create leaves an invisible orphan dir
  * (vacuum reclaims it) and NO tag — the replay then commits normally,
  * so the window that breaks file-append sinks is exactly the window
  * the manifest protocol already closes.
  *
  * Two racing attempts of the SAME batch (speculative restart) funnel
  * through the commit arbiter: the loser's conflict error is re-checked
  * against the tag — if the winning commit carries this batch's tag,
  * the loser treats it as success (its work was done by its twin);
  * any OTHER conflicting tag is a genuine concurrent writer and stays
  * loud.
  *
  * Scale shape: each micro-batch pays [[SnapshotTable.appendInto]] —
  * cost proportional to the partitions the batch touches, untouched
  * partitions re-referenced verbatim — and the steady-state small-file
  * tax is retired by periodic [[SnapshotTable.compact]] commits, which
  * interleave with ingest as ordinary versions (a reader never sees
  * either in-flight). */
object SnapshotSink {

  private[stream] def batchTag(batchId: Long): String = s"ingest-$batchId"

  /** The `foreachBatch` function: append `batch` into the partitioned
    * snapshot at `root` exactly once per `batchId`.
    * {{{ ds.writeStream.foreachBatch(SnapshotSink.exactlyOnce(root, "p") _) }}} */
  def exactlyOnce(root: String, pcol: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val tag = batchTag(batchId)
    // pin the base FIRST, then decide idempotence: a twin of this same
    // batch that commits after the tag check makes our pinned commit
    // CONFLICT (resolved below via the tag) — an unpinned append could
    // instead re-read the twin's version as its parent and land the
    // batch twice
    val base = SnapshotTable.currentVersion(spark, root)
    // replay fast path: this batch already committed before a restart
    if (SnapshotTable.committedTags(spark, root).contains(tag)) return
    try SnapshotTable.appendInto(batch, root, pcol, Some(tag),
      expectedBase = base)
    catch {
      case e: java.util.ConcurrentModificationException =>
        // conflict: if this batch's tag is committed, the twin attempt
        // won — exactly-once is preserved by doing nothing. Otherwise a
        // FOREIGN writer interleaved: stay loud, let the streaming
        // engine fail and replay the batch (the replay is idempotent).
        if (!SnapshotTable.committedTags(spark, root).contains(tag)) throw e
    }
  }
}
