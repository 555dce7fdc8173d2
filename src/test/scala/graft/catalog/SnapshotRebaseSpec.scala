package graft.catalog

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-10 concurrency surface: DISJOINT-PARTITION optimistic rebase
  * in [[SnapshotTable.commitReplace]] (two writers touching different
  * partitions both land; overlap stays loud) and the vacuum
  * writer-safety age horizon (a live writer's pre-manifest data dir
  * survives a concurrent vacuum). */
class SnapshotRebaseSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snapreb").toString + "/t"

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pdf(vals: (String, Long, Long)*) = {
    import spark.implicits._
    vals.toSeq.toDF("region", "id", "v")
  }

  private def state(root: String, v: Long): Seq[(String, Long, Long)] =
    SnapshotTable.read(spark, root, v).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2)).toSeq

  test("rebase: a commitReplace on a STALE base whose partitions are " +
       "disjoint from the winner's lands automatically, inheriting the " +
       "winner's entries and stats") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 3L, 30L), ("na", 4L, 40L)),
      root, 0L, "region")
    // writer A wins on asia; writer B still believes base = v1 and
    // replaces ONLY eu — disjoint, so B must land without manual rebase
    val v2 = SnapshotTable.commitReplace(
      pdf(("asia", 1L, 11L)), root, v1, "region")
    val v3 = SnapshotTable.commitReplace(
      pdf(("eu", 300L, 33L)), root, v1, "region")
    assert((v2, v3) == (2L, 3L))
    assert(state(root, 3L) == Seq(("asia", 1L, 11L), ("eu", 300L, 33L),
      ("na", 4L, 40L)), "rebase lost a writer's partition")
    // the rebased commit's manifest carries the WINNER's asia entry —
    // files and stats verbatim — not the stale v1 one
    val m2 = SnapshotTable.manifestAt(spark, root, 2L)
    val m3 = SnapshotTable.manifestAt(spark, root, 3L)
    val asia2 = m2.entries.filter(_.contains("region=asia"))
    val asia3 = m3.entries.filter(_.contains("region=asia"))
    assert(asia2 == asia3, "rebase must re-reference the winner's entry")
    val statsOf = (m: SnapshotTable.Manifest, part: String) =>
      m.entries.zip(m.stats).find(_._1.contains(part)).get._2
    assert(statsOf(m3, "region=asia") == statsOf(m2, "region=asia"),
      "rebase must inherit the winner's stats verbatim")
    // and the winner's bounds still prune after the rebase
    assert(SnapshotTable.readWhere(spark, root, 3L,
      Seq(SnapshotTable.Pred("id", ">=", 300L)))
      .collect().map(_.getLong(1)).toSeq == Seq(300L))
  }

  test("rebase under a TRUE race: concurrent commitReplace threads on " +
       "pairwise-disjoint partitions ALL land; content and version " +
       "count are exact") {
    val root = freshRoot()
    val parts = Seq("p0", "p1", "p2", "p3")
    val v1 = SnapshotTable.commitPartitioned(
      pdf(parts.map(p => (p, 1L, 0L)): _*), root, 0L, "region")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[Throwable, Long]]()
    val threads = parts.zipWithIndex.map { case (p, i) =>
      new Thread(() => {
        val r = try Right(SnapshotTable.commitReplace(
          pdf((p, 100L + i, 7L)), root, expectedBase = v1, "region"))
        catch { case e: Throwable => Left(e) }
        results.add(r): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val rs = results.toArray(Array.empty[Either[Throwable, Long]])
    assert(rs.forall(_.isRight),
      s"a disjoint writer failed: ${rs.collect { case Left(e) => e }.toSeq}")
    assert(rs.collect { case Right(v) => v }.sorted.toSeq ==
      Seq(2L, 3L, 4L, 5L), "versions must be the four successors of v1")
    assert(state(root, 5L) == Seq(("p0", 100L, 7L), ("p1", 101L, 7L),
      ("p2", 102L, 7L), ("p3", 103L, 7L)))
  }

  test("overlap stays LOUD: a second writer replacing (or dropping) a " +
       "partition the winner touched conflicts with the partition named, " +
       "and its data dir is cleaned up") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 3L, 30L)), root, 0L, "region")
    SnapshotTable.commitReplace(pdf(("asia", 1L, 11L)), root, v1, "region")
    val dirsBefore = fs(root).listStatus(new Path(root))
      .count(_.getPath.getName.startsWith("data-"))
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.commitReplace(pdf(("asia", 9L, 99L)), root, v1, "region")
    }
    assert(e.getMessage.contains("asia"),
      s"conflict must name the overlapping partition: ${e.getMessage}")
    assert(fs(root).listStatus(new Path(root))
      .count(_.getPath.getName.startsWith("data-")) == dirsBefore,
      "the losing writer must remove its own data dir")
    // dropParts overlap is the same conflict
    val d = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.commitReplace(pdf(("eu", 3L, 31L)), root, v1, "region",
        dropParts = Seq("asia"))
    }
    assert(d.getMessage.contains("asia"))
    // the winner's result is untouched by either loser
    assert(state(root, 2L) == Seq(("asia", 1L, 11L), ("eu", 3L, 30L)))
  }

  test("rebase refuses concurrent SCHEMA EVOLUTION and rebaseRetries=0 " +
       "restores the plain whole-table CAS") {
    import spark.implicits._
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 3L, 30L)), root, 0L, "region")
    SnapshotTable.commitReplace(
      Seq(("asia", 1L, 11L, "gold")).toDF("region", "id", "v", "tier"),
      root, v1, "region", evolveSchema = true)
    // disjoint partitions, but the winner changed the schema: loud
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.commitReplace(pdf(("eu", 3L, 31L)), root, v1, "region")
    }
    assert(e.getMessage.contains("evolved"), e.getMessage)
    // opt-out: with rebaseRetries = 0 even a disjoint stale base is loud
    val root2 = freshRoot()
    val w1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 3L, 30L)), root2, 0L, "region")
    SnapshotTable.commitReplace(pdf(("asia", 1L, 11L)), root2, w1, "region")
    intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.commitReplace(pdf(("eu", 3L, 31L)), root2, w1,
        "region", rebaseRetries = 0)
    }
  }

  test("vacuum writer-safety horizon: a LIVE writer blocked between its " +
       "data write and its manifest create survives a concurrent vacuum; " +
       "an AGED orphan still reclaims") {
    val root = freshRoot()
    SnapshotTable.commitPartitioned(pdf(("asia", 1L, 10L)), root, 0L,
      "region")
    SnapshotTable.commitPartitioned(pdf(("asia", 1L, 11L)), root, 1L,
      "region")
    // a writer paused at the commit point: data dir written, manifest
    // not yet — the window the horizon exists to protect. The arbiter
    // seam gives a deterministic interleave.
    val reached = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val prev = SnapshotTable.installArbiter(new SnapshotTable.CommitArbiter {
      def createExclusive(f: org.apache.hadoop.fs.FileSystem, path: Path,
                          body: Array[Byte]): Unit = {
        reached.countDown()
        release.await()
        SnapshotTable.perSchemeArbiter.createExclusive(f, path, body)
      }
    })
    try {
      val writer = new Thread(() => {
        SnapshotTable.commitPartitioned(pdf(("eu", 9L, 90L)), root, 2L,
          "region"): Unit
      })
      writer.start()
      assert(reached.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "writer never reached the commit point")
      // concurrent vacuum at the DEFAULT horizon: the writer's fresh
      // dir is an apparent orphan but must survive
      SnapshotTable.vacuum(spark, root, keepLast = 1)
      release.countDown()
      writer.join()
      assert(SnapshotTable.currentVersion(spark, root) == 3L,
        "the racing writer's commit must land")
      assert(state(root, 3L).exists(_._1 == "eu"),
        "vacuum reclaimed a live writer's data — the commit lost its files")
      // the commit's data actually reads back (files intact on disk);
      // v3 is a FULL snapshot of the one eu row
      assert(SnapshotTable.read(spark, root, 3L).count() == 1L)
    } finally {
      release.countDown()
      SnapshotTable.installArbiter(prev)
    }
    // an orphan OLDER than the horizon reclaims even at the default:
    // age it by rewinding its modification time past 20 minutes
    pdf(("ghost", 0L, 0L)).write.parquet(s"$root/data-ghost-aged")
    val ghost = new Path(s"$root/data-ghost-aged")
    val old = System.currentTimeMillis() - 31L * 60L * 1000L
    fs(root).setTimes(ghost, old, old)
    fs(root).listStatus(ghost).foreach(s =>
      fs(root).setTimes(s.getPath, old, old))
    SnapshotTable.vacuum(spark, root, keepLast = 1)
    assert(!fs(root).exists(ghost),
      "an aged orphan must reclaim under the default horizon")
  }
}
