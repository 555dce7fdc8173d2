package graft.catalog

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** [[SnapshotGroup]]: multi-table commits are atomic — every table
  * advances together, conflicts are loud, pinned versions are
  * mutually consistent across tables. */
class SnapshotGroupSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snapgrp").toString + "/g"

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def df(vals: (String, Long)*) = {
    import spark.implicits._
    vals.toSeq.toDF("k", "v")
  }

  test("a pinned group version is mutually consistent across tables — " +
       "no corpus-new/index-old window exists at any version") {
    val root = freshRoot()
    val v1 = SnapshotGroup.commit(Map(
      "corpus" -> df("doc1" -> 10L),
      "index" -> df("doc1" -> 1L)), root, 0L)
    val v2 = SnapshotGroup.commit(Map(
      "corpus" -> df("doc1" -> 10L, "doc2" -> 20L),
      "index" -> df("doc1" -> 1L, "doc2" -> 2L)), root, v1)
    def pair(v: Long): (Long, Long) = (
      SnapshotGroup.read(spark, root, "corpus", v).count(),
      SnapshotGroup.read(spark, root, "index", v).count())
    // at every committed version the two tables have matching row
    // counts — the consistency invariant a per-table protocol cannot
    // give (between two single-table commits the counts diverge)
    assert(pair(v1) == (1L, 1L))
    assert(pair(v2) == (2L, 2L))
    assert(SnapshotGroup.readLatest(spark, root, "index").count() == 2L)
  }

  test("two-table conflict: concurrent committers of the same base — " +
       "exactly one wins, both tables stay at the winner's state") {
    val root = freshRoot()
    SnapshotGroup.commit(Map("a" -> df("x" -> 1L), "b" -> df("x" -> 1L)),
      root, 0L)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[Throwable, Long]]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        val r = try Right(SnapshotGroup.commit(Map(
          "a" -> df(s"w$i" -> i.toLong), "b" -> df(s"w$i" -> -i.toLong)),
          root, expectedBase = 1L))
        catch { case e: Throwable => Left(e) }
        results.add(r): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (losers, winners) =
      results.toArray(Array.empty[Either[Throwable, Long]])
        .partition(_.isLeft)
    assert(winners.length == 1, s"expected one winner, got ${winners.length}")
    assert(losers.length == 3)
    losers.foreach(l => assert(l.swap.toOption.get
      .isInstanceOf[java.util.ConcurrentModificationException]))
    // winner's a and b are the SAME writer's rows (atomicity across
    // tables — a torn commit would mix writers)
    val a = SnapshotGroup.read(spark, root, "a", 2L).collect().head
    val b = SnapshotGroup.read(spark, root, "b", 2L).collect().head
    assert(a.getString(0) == b.getString(0),
      s"torn multi-table commit: a=${a.getString(0)} b=${b.getString(0)}")
    assert(a.getLong(1) == -b.getLong(1))
  }

  test("crashed writer's dir is invisible; vacuum reclaims it and old " +
       "versions; a missing table in a version is loud") {
    val root = freshRoot()
    SnapshotGroup.commit(Map("t" -> df("a" -> 1L)), root, 0L)
    SnapshotGroup.commit(Map("t" -> df("a" -> 2L), "u" -> df("b" -> 9L)),
      root, 1L)
    df("ghost" -> 0L).write.parquet(s"$root/data-ghost/t")
    assert(SnapshotGroup.currentVersion(spark, root) == 2L)
    // v1 never had table u
    val e = intercept[RuntimeException] {
      SnapshotGroup.read(spark, root, "u", 1L)
    }
    assert(e.getMessage.contains("no table 'u'"))
    val dropped = SnapshotGroup.vacuum(spark, root, keepLast = 1,
      minAgeMs = 0L)
    assert(dropped == Seq(1L))
    assert(!fs(root).exists(new Path(s"$root/data-ghost")),
      "vacuum left the crashed writer's dir")
    val dirs = fs(root).listStatus(new Path(root))
      .map(_.getPath.getName).filter(_.startsWith("data-"))
    assert(dirs.length == 1, s"unexpected dirs: ${dirs.toSeq}")
    assert(SnapshotGroup.read(spark, root, "u", 2L)
      .collect().head.getLong(1) == 9L)
    intercept[IllegalArgumentException] {
      SnapshotGroup.read(spark, root, "t", 1L)
    }
  }

  test("changes(): per-table feeds at a pinned group version pair are " +
       "mutually consistent — every change class lands, and a key " +
       "deleted from both tables appears in BOTH feeds") {
    import spark.implicits._
    val root = freshRoot()
    def pair(rows: Seq[(Long, String, Long)]) = Map(
      "corpus" -> rows.map(r => (r._1, r._2)).toDF("id", "s"),
      "index" -> rows.map(r => (r._1, r._3)).toDF("id", "n"))
    // v1: keys 1..4; v2: 1 unchanged, 2 updated (both tables),
    // 3 deleted (both), 4 updated in corpus only, 5 inserted (both)
    SnapshotGroup.commit(pair(Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "c", 30L), (4L, "d", 40L))), root, 0L)
    SnapshotGroup.commit(pair(Seq((1L, "a", 10L), (2L, "B", 99L),
      (4L, "D", 40L), (5L, "e", 50L))), root, 1L)
    def feed(t: String): Map[Long, String] =
      SnapshotGroup.changes(spark, root, t, 1L, 2L, Seq("id"))
        .select("id", "change_type").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feed("corpus") == Map(2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "insert"))
    assert(feed("index") == Map(2L -> "update", 3L -> "delete",
      5L -> "insert"))
    // preimages: the update splits into the retract/add pair
    val pre = SnapshotGroup.changes(spark, root, "index", 1L, 2L,
        Seq("id"), preimages = true)
      .filter($"id" === 2L).select("change_type", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pre == Map("update_preimage" -> 20L, "update_postimage" -> 99L))
  }

  test("group timestamp time travel: injected commit timestamps resolve " +
       "with the Delta-style skew adjustment, every table at the " +
       "resolved version is consistent as of that instant, and " +
       "pre-history refuses") {
    val root = freshRoot()
    SnapshotGroup.commit(Map("c" -> df("a" -> 1L), "i" -> df("a" -> 10L)),
      root, 0L, commitTs = 1000L)
    SnapshotGroup.commit(Map("c" -> df("a" -> 2L), "i" -> df("a" -> 20L)),
      root, 1L, commitTs = 2000L)
    // skewed clock: recorded 1500 AFTER 2000 — effective 2001
    SnapshotGroup.commit(Map("c" -> df("a" -> 3L), "i" -> df("a" -> 30L)),
      root, 2L, commitTs = 1500L)
    assert(SnapshotGroup.versionAsOf(spark, root, 1500L) == 1L)
    assert(SnapshotGroup.versionAsOf(spark, root, 2000L) == 2L)
    assert(SnapshotGroup.versionAsOf(spark, root, 2001L) == 3L)
    // both tables resolve through ONE version — consistent as-of
    assert(SnapshotGroup.readAsOf(spark, root, "c", 2000L)
      .collect().head.getLong(1) == 2L)
    assert(SnapshotGroup.readAsOf(spark, root, "i", 2000L)
      .collect().head.getLong(1) == 20L)
    intercept[IllegalArgumentException] {
      SnapshotGroup.versionAsOf(spark, root, 999L)
    }
    // default commit records the wall clock
    val before = System.currentTimeMillis()
    SnapshotGroup.commit(Map("c" -> df("a" -> 4L)), root, 3L)
    val fsys = fs(root)
    val m = SnapshotTable.readManifestBody(fsys, root, 4L)
    assert("\"ts\":(\\d+)".r.findFirstMatchIn(m)
      .exists(_.group(1).toLong >= before), s"wall-clock ts missing: $m")
  }

  test("schema and column order round-trip through the group manifest") {
    import spark.implicits._
    val root = freshRoot()
    val src = Seq((1L, "x", 2.5)).toDF("k", "s", "d")
    SnapshotGroup.commit(Map("t" -> src), root, 0L)
    val back = SnapshotGroup.read(spark, root, "t", 1L)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().head.getDouble(2) == 2.5)
  }
}
