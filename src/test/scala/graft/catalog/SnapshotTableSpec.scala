package graft.catalog

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** [[SnapshotTable]] commit protocol: optimistic-concurrency conflicts
  * fail loudly, crashed writers are reclaimed, old versions stay
  * readable and immutable, the pointer is only a cache. */
class SnapshotTableSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snaptbl").toString + "/t"

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def df(vals: (String, Long)*) = {
    import spark.implicits._
    vals.toSeq.toDF("k", "v")
  }

  test("commit/read round trip and version accounting") {
    val root = freshRoot()
    assert(SnapshotTable.currentVersion(spark, root) == 0L)
    val v1 = SnapshotTable.commit(df("a" -> 1L), root, 0L)
    val v2 = SnapshotTable.commit(df("a" -> 2L, "b" -> 9L), root, v1)
    assert((v1, v2) == (1L, 2L))
    assert(SnapshotTable.committedVersions(spark, root) == Seq(1L, 2L))
    assert(SnapshotTable.read(spark, root, 1L).collect().map(_.getLong(1))
      .toSeq == Seq(1L))
    assert(SnapshotTable.readLatest(spark, root).count() == 2L)
  }

  test("second committer of the same base version fails loudly and " +
       "leaves the table untouched") {
    val root = freshRoot()
    SnapshotTable.commit(df("a" -> 1L), root, 0L)
    // writers A and B both observed version 1
    SnapshotTable.commit(df("a" -> 2L), root, 1L) // A wins
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.commit(df("a" -> 99L), root, 1L) // B must lose
    }
    assert(e.getMessage.contains("conflict"))
    assert(SnapshotTable.currentVersion(spark, root) == 2L)
    assert(SnapshotTable.readLatest(spark, root)
      .collect().head.getLong(1) == 2L, "loser's data leaked into the table")
  }

  test("true manifest race: a committed version appearing underneath a " +
       "staged writer is a loud conflict, not an overwrite") {
    val root = freshRoot()
    SnapshotTable.commit(df("a" -> 1L), root, 0L)
    // simulate the interleaving AFTER B's base pre-check passed: A's
    // version-2 data dir AND manifest both land before B's rename
    SnapshotTable.commit(df("a" -> 2L), root, 1L)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.commit(df("a" -> 3L), root, 1L)
    }
    assert(e.getMessage.contains("conflict"))
  }

  test("crashed writer's orphan data dir is invisible to readers and " +
       "does not block the next committer") {
    val root = freshRoot()
    SnapshotTable.commit(df("a" -> 1L), root, 0L)
    // a writer that died after its data write but before the manifest
    df("ghost" -> 0L).write.parquet(s"$root/data-ghost-crashed")
    assert(SnapshotTable.currentVersion(spark, root) == 1L,
      "uncommitted data dir must not count as a version")
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, root, 2L) // manifest absent: not readable
    }
    val v2 = SnapshotTable.commit(df("a" -> 2L), root, 1L)
    assert(v2 == 2L)
    assert(SnapshotTable.read(spark, root, 2L)
      .collect().head.getString(0) == "a", "ghost data leaked into v2")
  }

  test("old version is byte-immutable under later commits, and the " +
       "_latest pointer is only a cache") {
    val root = freshRoot()
    SnapshotTable.commit(df("a" -> 1L), root, 0L)
    def v1Files = {
      val dir = new Path(SnapshotTable.read(spark, root, 1L)
        .inputFiles.head).getParent
      fs(root).listStatus(dir)
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
        .toSet
    }
    val before = v1Files
    SnapshotTable.commit(df("a" -> 2L), root, 1L)
    SnapshotTable.commit(df("a" -> 3L), root, 2L)
    assert(v1Files == before, "a later commit disturbed version 1's files")
    // pointer loss: readers recover from the _commits listing
    fs(root).delete(new Path(s"$root/_latest"), false)
    assert(SnapshotTable.currentVersion(spark, root) == 3L)
    assert(SnapshotTable.readLatest(spark, root)
      .collect().head.getLong(1) == 3L)
  }

  test("vacuum drops only versions outside the keep window plus " +
       "orphan data dirs") {
    val root = freshRoot()
    (1 to 4).foldLeft(0L) { (base, i) =>
      SnapshotTable.commit(df("a" -> i.toLong), root, base)
    }
    df("ghost" -> 0L).write.parquet(s"$root/data-ghost-orphan")
    val dropped = SnapshotTable.vacuum(spark, root, keepLast = 2)
    assert(dropped == Seq(1L, 2L))
    assert(SnapshotTable.committedVersions(spark, root) == Seq(3L, 4L))
    assert(!fs(root).exists(new Path(s"$root/data-ghost-orphan")),
      "vacuum left an orphan data dir behind")
    // exactly the two kept versions' dirs survive
    val dataDirs = fs(root).listStatus(new Path(root))
      .map(_.getPath.getName).filter(_.startsWith("data-"))
    assert(dataDirs.length == 2, s"unexpected dirs: ${dataDirs.toSeq}")
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, root, 1L)
    }
    assert(SnapshotTable.read(spark, root, 3L).count() == 1L)
  }

  test("REAL concurrency: 8 threads racing a commit from the same base — " +
       "exactly one wins, the rest fail loudly, the table stays sane") {
    val root = freshRoot()
    SnapshotTable.commit(df("base" -> 0L), root, 0L)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[Throwable, Long]]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        val r = try Right(SnapshotTable.commit(
          df(s"writer$i" -> i.toLong), root, expectedBase = 1L))
        catch { case e: Throwable => Left(e) }
        results.add(r): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (losers, winners) = results.toArray(Array.empty[Either[Throwable, Long]])
      .partition(_.isLeft)
    assert(winners.length == 1,
      s"expected exactly one winning committer, got ${winners.length}")
    assert(losers.length == 7)
    losers.foreach { l =>
      assert(l.swap.toOption.get
        .isInstanceOf[java.util.ConcurrentModificationException] ||
        l.swap.toOption.get.getMessage.contains("conflict"),
        s"loser failed with the wrong error: ${l.swap.toOption.get}")
    }
    // the table is at exactly version 2, holding the winner's row
    assert(SnapshotTable.committedVersions(spark, root) == Seq(1L, 2L))
    val row = SnapshotTable.read(spark, root, 2L).collect().head
    assert(row.getString(0).startsWith("writer"))
  }

  test("changes(): insert/delete/update classes, unchanged rows absent, " +
       "preimage mode emits both update images") {
    val root = freshRoot()
    SnapshotTable.commit(
      df("keep" -> 1L, "upd" -> 2L, "gone" -> 3L), root, 0L)
    SnapshotTable.commit(
      df("keep" -> 1L, "upd" -> 20L, "new" -> 4L), root, 1L)
    val feed = SnapshotTable.changes(spark, root, 1L, 2L, Seq("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(feed == Seq(("gone", "delete", 3L), ("new", "insert", 4L),
      ("upd", "update", 20L)), s"unexpected feed: $feed")
    val pre = SnapshotTable.changes(spark, root, 1L, 2L, Seq("k"),
        preimages = true)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(pre == Seq(
      ("gone", "delete", 3L), ("new", "insert", 4L),
      ("upd", "update_postimage", 20L), ("upd", "update_preimage", 2L)),
      s"unexpected preimage feed: $pre")
  }

  test("snk7 gate query: version 1 read after the merge equals the " +
       "pre-merge aggregate") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.ops.RelQueries.snk7TimeTravel(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val want = graft.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
             .as("sum_value_cents"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }
}
