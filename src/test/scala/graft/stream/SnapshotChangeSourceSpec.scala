package graft.stream

import graft.SparkSpec
import graft.catalog.SnapshotTable
import org.apache.spark.sql.functions._

/** The streaming CHANGE FEED source (`spark.readStream
  * .format("graft-snapshot")`): offsets are committed versions, each
  * micro-batch the Delta-CDF rows of the commits it covers — the
  * incremental-consumer story (snk11's MV maintenance) end-to-end
  * streaming, with the version cursor in the engine's checkpoint
  * instead of hand-rolled polling code. */
class SnapshotChangeSourceSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snapcdc").toString + "/t"

  private def df(vals: (Long, Long, Long)*) = {
    import spark.implicits._
    vals.toSeq.toDF("id", "p", "v")
  }

  test("three commits (upsert, append, row-level delete) stream as " +
       "CDF batches; replaying the feed rebuilds EXACTLY the latest " +
       "snapshot (the snk11 equality, end-to-end streaming)") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      df((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L)), root, 0L, "p")
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("keys", "id")
      .option("startingVersion", "0")
      .load()
      .writeStream.format("memory").queryName("cdc1").start()
    try {
      q.processAllAvailable()
      // v1 feeds as all-inserts
      val b1 = spark.table("cdc1").collect()
      assert(b1.length == 3 &&
        b1.forall(r => r.getString(1) == "insert" &&
          r.getLong(4) == 1L), s"v1 feed wrong: ${b1.toSeq}")
      // v2: replace partition 0 — id 1 updated, id 2 dropped, id 4 new
      SnapshotTable.commitReplace(
        df((1L, 0L, 11L), (4L, 0L, 40L)), root, v1, "p")
      // v3: row-level delete of id 3 (the delete must surface in the
      // DIFF even though no data file changed)
      import spark.implicits._
      SnapshotTable.commitDelete(Seq(3L).toDF("id"), root, 2L, Seq("id"))
      q.processAllAvailable()
      val all = spark.table("cdc1").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
      val byCommit = all.groupBy(_._4)
      assert(byCommit(2L).toSet == Set((1L, "update", 11L, 2L),
        (2L, "delete", 20L, 2L), (4L, "insert", 40L, 2L)),
        s"v2 CDF wrong: ${byCommit(2L).toSeq}")
      assert(byCommit(3L).toSet == Set((3L, "delete", 30L, 3L)),
        s"v3 CDF wrong: ${byCommit(3L).toSeq}")
      // MV equality: fold the feed in commit order → latest snapshot
      val folded = all.sortBy(_._4).foldLeft(Map.empty[Long, Long]) {
        case (m, (id, "delete", _, _)) => m - id
        case (m, (id, _, v, _)) => m + (id -> v)
      }
      val latest = SnapshotTable.readLatest(spark, root).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(folded == latest,
        s"replayed feed $folded != snapshot $latest")
    } finally q.stop()
  }

  test("default start position is the CURRENT version: history is not " +
       "replayed, only commits after stream start feed batches") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      df((1L, 0L, 10L)), root, 0L, "p")
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("keys", "id")
      .load()
      .writeStream.format("memory").queryName("cdc2").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc2").isEmpty, "history was replayed")
      SnapshotTable.appendInto(df((2L, 0L, 20L)), root, "p")
      q.processAllAvailable()
      val rows = spark.table("cdc2").collect()
      assert(rows.length == 1 && rows.head.getLong(0) == 2L &&
        rows.head.getString(1) == "insert" &&
        rows.head.getLong(4) == v1 + 1)
    } finally q.stop()
  }

  test("restart from the engine checkpoint resumes at the persisted " +
       "version cursor: no re-delivery, no gap (SerializedOffset path)") {
    val root = freshRoot()
    val ckpt = java.nio.file.Files
      .createTempDirectory("snapcdc_ckpt").toString
    SnapshotTable.commitPartitioned(df((1L, 0L, 10L)), root, 0L, "p")
    // foreachBatch, not the memory sink: only fault-tolerant sinks may
    // recover from a checkpoint, and recovery is exactly what this
    // test exercises
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = spark.readStream.format("graft-snapshot")
      .option("path", root).option("keys", "id")
      .option("startingVersion", "0")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add((r.getLong(0), r.getLong(4))))
        ()
      }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(got.size == 1)
    // two commits while the stream is DOWN
    SnapshotTable.appendInto(df((2L, 0L, 20L)), root, "p")
    SnapshotTable.appendInto(df((3L, 1L, 30L)), root, "p")
    got.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toSeq.sorted
      // only the two missed commits, version-stamped 2 and 3 — the
      // v1 insert must NOT re-deliver
      assert(rows == Seq((2L, 2L), (3L, 3L)),
        s"restart re-delivered or gapped: $rows")
    } finally q2.stop()
  }

  test("restart WITHOUT startingVersion delivers commits made while " +
       "the stream was down: the engine's cursor wins over the " +
       "re-evaluated start-at-current default") {
    val root = freshRoot()
    val ckpt = java.nio.file.Files
      .createTempDirectory("snapcdc_ckpt2").toString
    SnapshotTable.commitPartitioned(df((1L, 0L, 10L)), root, 0L, "p")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = spark.readStream.format("graft-snapshot")
      .option("path", root).option("keys", "id")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add((r.getLong(0), r.getLong(4))))
        ()
      }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(got.isEmpty, "default start replayed history")
    // a commit lands while the stream is DOWN; on restart the default
    // re-evaluates to the NEW current version — the engine cursor must
    // still deliver it (the start-at-current default governs only a
    // fresh stream with no checkpoint)
    SnapshotTable.appendInto(df((2L, 0L, 20L)), root, "p")
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSeq == Seq((2L, 2L)),
        s"down-time commit withheld or duplicated: ${got.asScala.toSeq}")
    } finally q2.stop()
  }

  test("batch-0 crash recovery: the start-at-current default resolves " +
       "ONCE per stream (persisted under the engine's metadataPath) — " +
       "a replayed first batch delivers versions after the ORIGINAL " +
       "start, not after the restart-time current version") {
    val root = freshRoot()
    val meta = java.nio.file.Files
      .createTempDirectory("snapcdc_meta").toString
    SnapshotTable.commitPartitioned(df((1L, 0L, 10L)), root, 0L, "p")
    val provider = new graft.catalog.SnapshotSource()
    val params = Map("path" -> root, "keys" -> "id")
    // stream creation at current version 1 — resolves AND persists the
    // start-at-current default under metadataPath
    provider.createSource(spark.sqlContext, meta, None,
      "graft-snapshot", params)
    // two commits land; the engine WALs offset 3 and crashes BEFORE
    // committing batch 0. On restart the source is re-created; a
    // per-restart re-evaluation of the default (current = 3) would
    // make the replayed batch 0 compute an empty range and lose v2/v3
    // forever — the exactly-once violation this marker closes.
    SnapshotTable.appendInto(df((2L, 0L, 20L)), root, "p")
    SnapshotTable.appendInto(df((3L, 1L, 30L)), root, "p")
    val s2 = provider.createSource(spark.sqlContext, meta, None,
      "graft-snapshot", params)
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val replayed = s2.getBatch(None, LongOffset(3L))
    // getBatch hands back a STREAMING-flagged frame (the engine
    // contract); collecting it outside the engine needs the batch-
    // execution check off, exactly as Spark's own Source test suites do
    val checkKey = "spark.sql.streaming.unsupportedOperationCheck"
    val saved = spark.conf.getOption(checkKey)
    val got =
      try {
        spark.conf.set(checkKey, "false")
        replayed.collect().map(r => (r.getLong(0), r.getLong(4))).toSet
      } finally saved match {
        case Some(v) => spark.conf.set(checkKey, v)
        case None    => spark.conf.unset(checkKey)
      }
    assert(got == Set((2L, 2L), (3L, 3L)),
      s"replayed batch 0 lost or re-delivered versions: $got")
  }

  test("preimages=true emits the update_preimage/update_postimage " +
       "pair (retraction-based MV maintenance shape)") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      df((1L, 0L, 10L)), root, 0L, "p")
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("keys", "id")
      .option("preimages", "true")
      .load()
      .writeStream.format("memory").queryName("cdc4").start()
    try {
      SnapshotTable.commitReplace(df((1L, 0L, 11L)), root, v1, "p")
      q.processAllAvailable()
      val rows = spark.table("cdc4").collect()
        .map(r => (r.getString(1), r.getLong(3))).toSet
      assert(rows == Set(("update_preimage", 10L),
        ("update_postimage", 11L)), s"preimage pair wrong: $rows")
    } finally q.stop()
  }

  test("maxVersionsPerTrigger bounds catch-up: commits accumulated " +
       "between triggers deliver as one-version micro-batches, in " +
       "order, none lost") {
    val root = freshRoot()
    SnapshotTable.commitPartitioned(df((1L, 0L, 10L)), root, 0L, "p")
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("keys", "id")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = b.collect().map(_.getLong(4)).toSeq
        if (vs.nonEmpty) batches.add(vs.distinct.sorted): Unit
      }.start()
    try {
      q.processAllAvailable() // v1 (first batch is unthrottled, = v1)
      // three commits land between triggers
      SnapshotTable.appendInto(df((2L, 0L, 20L)), root, "p")
      SnapshotTable.appendInto(df((3L, 1L, 30L)), root, "p")
      SnapshotTable.appendInto(df((4L, 1L, 40L)), root, "p")
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = batches.asScala.toSeq
      assert(got == Seq(Seq(1L), Seq(2L), Seq(3L), Seq(4L)),
        s"throttle delivered $got — want one version per batch, " +
        "in order, none lost")
    } finally q.stop()
  }

  test("refusals: missing keys option; a non-table key column; a " +
       "non-positive rate limit (which would silently wedge the stream)") {
    val root = freshRoot()
    SnapshotTable.commitPartitioned(df((1L, 0L, 10L)), root, 0L, "p")
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snapshot")
        .option("path", root).load()
    }
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snapshot")
        .option("path", root).option("keys", "nope").load()
    }
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-snapshot")
        .option("path", root).option("keys", "id")
        .option("maxVersionsPerTrigger", "0").load()
    }
  }
}
