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
    // minAgeMs = 0 opts out of the writer-safety horizon so freshly
    // created fixture dirs reclaim deterministically
    val dropped = SnapshotTable.vacuum(spark, root, keepLast = 2,
      minAgeMs = 0L)
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

  private def pdf(vals: (String, Long, Long)*) = {
    import spark.implicits._
    vals.toSeq.toDF("region", "id", "v")
  }

  test("commit-by-reference: commitReplace writes only the touched " +
       "partitions and REFERENCES the parent's untouched files — same " +
       "paths, same bytes — across versions") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("asia", 2L, 20L), ("eu", 3L, 30L),
          ("na", 4L, 40L)), root, 0L, "region")
    def inventory(part: String): Set[(String, Long, Long)] = {
      val sample = SnapshotTable.read(spark, root, v1).inputFiles
        .find(_.contains(s"region=$part")).get
      fs(root).listStatus(new Path(sample).getParent)
        .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
        .toSet
    }
    val (euBefore, naBefore) = (inventory("eu"), inventory("na"))
    val v2 = SnapshotTable.commitReplace(
      pdf(("asia", 1L, 11L), ("asia", 9L, 90L)), root, v1, "region")
    def state(v: Long) = SnapshotTable.read(spark, root, v).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
      .toSeq
    // asia replaced wholesale (row 2 gone, 1 updated, 9 inserted);
    // eu/na ride through; v1 time-travels unchanged
    assert(state(v2) == Seq(("asia", 1L, 11L), ("eu", 3L, 30L),
      ("na", 4L, 40L), ("asia", 9L, 90L)))
    assert(state(v1) == Seq(("asia", 1L, 10L), ("asia", 2L, 20L),
      ("eu", 3L, 30L), ("na", 4L, 40L)))
    // the untouched partitions are the SAME FILES in both versions
    val v1Files = SnapshotTable.read(spark, root, v1).inputFiles.toSet
    val v2Files = SnapshotTable.read(spark, root, v2).inputFiles.toSet
    val untouched = v1Files.filter(f =>
      f.contains("region=eu") || f.contains("region=na"))
    assert(untouched.nonEmpty && untouched.subsetOf(v2Files),
      "v2 must reference v1's untouched partition files verbatim")
    assert((inventory("eu"), inventory("na")) == (euBefore, naBefore),
      "commitReplace disturbed an untouched partition's bytes")
    // and the replaced partition's files are NEW files in a NEW dir
    assert(v2Files.filter(_.contains("region=asia"))
      .forall(f => !v1Files.contains(f)))
    // dropParts deletes a partition outright without writing it
    val v3 = SnapshotTable.commitReplace(
      pdf(), root, v2, "region", dropParts = Seq("eu"))
    assert(state(v3) == Seq(("asia", 1L, 11L), ("na", 4L, 40L),
      ("asia", 9L, 90L)))
    assert(state(v2).exists(_._1 == "eu"), "v2 must still see eu")
  }

  test("commitReplace refuses a wrong partition column, a schema " +
       "drift, and an empty batch with nothing to drop") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L)), root, 0L, "region")
    intercept[IllegalArgumentException] {
      SnapshotTable.commitReplace(pdf(("asia", 1L, 1L)), root, v1, "id")
    }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      SnapshotTable.commitReplace(
        Seq(("asia", 1, 1L)).toDF("region", "id", "v"), // id int, not long
        root, v1, "region")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.commitReplace(pdf(), root, v1, "region")
    }
  }

  test("ADD-only schema evolution: an evolveSchema commitReplace appends " +
       "the new column nullable, inherited files read NULL there, v1 " +
       "time-travels without the column, and old entries never prune " +
       "on the new column") {
    import spark.implicits._
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 3L, 30L), ("na", 4L, 40L)),
      root, 0L, "region")
    // without the opt-in, an extra column is still a loud schema drift
    val evolved = Seq(("asia", 1L, 11L, "gold"))
      .toDF("region", "id", "v", "tier")
    val drift = intercept[IllegalArgumentException] {
      SnapshotTable.commitReplace(evolved, root, v1, "region")
    }
    assert(drift.getMessage.contains("evolveSchema"))
    val v2 = SnapshotTable.commitReplace(evolved, root, v1, "region",
      evolveSchema = true)
    val back = SnapshotTable.read(spark, root, v2)
    assert(back.schema.fieldNames.toSeq == Seq("region", "id", "v", "tier"),
      "the evolved column must append AFTER the parent's columns")
    assert(back.schema.fields.last.nullable)
    val rows = back.collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(3))))
      .sortBy(_._2).toSeq
    assert(rows == Seq(("asia", 1L, Some("gold")), ("eu", 3L, None),
      ("na", 4L, None)),
      "inherited files must read NULL in the evolved column")
    // v1 is untouched by the evolution — no column, same rows
    assert(SnapshotTable.read(spark, root, v1).schema.fieldNames.toSeq ==
      Seq("region", "id", "v"))
    // the untouched partitions are still the SAME files (no backfill)
    val v1Files = SnapshotTable.read(spark, root, v1).inputFiles.toSet
    val shared = SnapshotTable.read(spark, root, v2).inputFiles.toSet
      .filter(f => f.contains("region=eu") || f.contains("region=na"))
    assert(shared.nonEmpty && shared.subsetOf(v1Files),
      "evolution must not rewrite untouched partitions")
    // pruning on the new column: old entries carry no tier stats, so a
    // tier predicate may only drop the REWRITTEN entry, never the old
    // ones (missing stats = must scan)
    val m = SnapshotTable.manifestAt(spark, root, v2)
    val kept = SnapshotTable.pruneEntries(m,
      Seq(SnapshotTable.Pred("tier", "=", "zzz")))
    assert(kept.count(e => e.contains("region=eu") ||
      e.contains("region=na")) == 2,
      "a stats-less inherited entry was pruned on the evolved column")
    assert(!kept.exists(_.contains("region=asia")),
      "the rewritten entry records tier bounds [gold,gold] and must " +
      "prune under tier='zzz'")
    // differential read: readWhere == read().filter() over the new col
    val preds = Seq(SnapshotTable.Pred("tier", "=", "gold"))
    val a = SnapshotTable.readWhere(spark, root, v2, preds)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(a == Seq(1L))
    // evolution stays ADD-only: dropping/retyping a parent column is
    // refused even with the opt-in
    intercept[Exception] {
      SnapshotTable.commitReplace(
        Seq(("asia", 1, 1L, "x")).toDF("region", "id", "v", "tier"),
        root, v2, "region", evolveSchema = true) // id int, not long
    }
  }

  test("compact: rewrites fragmented partitions to one file each with " +
       "data identical, partial compaction re-references the rest " +
       "verbatim, and prune bounds survive the rewrite") {
    val root = freshRoot()
    // 6-way upstream repartition fragments every partition's file set
    val rows = (1L to 60L).map(i => (s"p${i % 3}", i, i * 10))
    val v1 = SnapshotTable.commitPartitioned(
      pdf(rows: _*).repartition(6), root, 0L, "region")
    def files(v: Long): Map[String, Int] = {
      val m = SnapshotTable.manifestAt(spark, root, v)
      m.entries.map(e => e -> fs(root).listStatus(new Path(s"$root/$e"))
        .count(_.getPath.getName.endsWith(".parquet"))).toMap
    }
    assert(files(v1).values.forall(_ > 1), "fixture failed to fragment")
    val v2 = SnapshotTable.compact(spark, root, v1, "region")
    assert(files(v2).values.forall(_ == 1),
      "full compaction must leave exactly one file per partition")
    assert(SnapshotTable.read(spark, root, v2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      == rows.sorted, "compaction changed the data")
    // v1 still time-travels to the fragmented files
    assert(SnapshotTable.read(spark, root, v1).count() == 60)
    // partial compaction: only p0 rewritten, p1/p2 entries verbatim
    val v3 = SnapshotTable.commitPartitioned(
      pdf(rows: _*).repartition(6), root + "p", 0L, "region")
    val v4 = SnapshotTable.compact(spark, root + "p", v3, "region",
      parts = Seq("p0"))
    val m3 = SnapshotTable.manifestAt(spark, root + "p", v3)
    val m4 = SnapshotTable.manifestAt(spark, root + "p", v4)
    val untouched3 = m3.entries.filterNot(_.contains("region=p0"))
    val untouched4 = m4.entries.filterNot(_.contains("region=p0"))
    assert(untouched3 == untouched4,
      "partial compaction must re-reference untouched entries verbatim")
    assert(!m4.entries.filter(_.contains("region=p0"))
      .exists(m3.entries.contains(_)),
      "the compacted partition must live in a fresh data dir")
    // stats survive: the same predicate prunes identically pre/post
    // (compare the partition-value component — the data dir differs
    // for the rewritten partition by design)
    val preds = Seq(SnapshotTable.Pred("id", ">=", 55L))
    val pruned3 = SnapshotTable.pruneEntries(m3, preds)
      .map(e => e.substring(e.indexOf('/'))).sorted
    val pruned4 = SnapshotTable.pruneEntries(m4, preds)
      .map(e => e.substring(e.indexOf('/'))).sorted
    assert(pruned3 == pruned4,
      "prune decisions must be identical across a compaction")
    val a = SnapshotTable.readWhere(spark, root + "p", v4, preds)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(a == (55L to 60L).toSeq)
  }

  test("compact filesPerPart > 1: the deterministic row-hash salt " +
       "splits each partition into at most that many files, data intact") {
    val root = freshRoot()
    val rows = (1L to 90L).map(i => (s"p${i % 2}", i, i * 7))
    val v1 = SnapshotTable.commitPartitioned(
      pdf(rows: _*).repartition(9), root, 0L, "region")
    val v2 = SnapshotTable.compact(spark, root, v1, "region",
      filesPerPart = 3)
    val m = SnapshotTable.manifestAt(spark, root, v2)
    m.entries.foreach { e =>
      val n = fs(root).listStatus(new Path(s"$root/$e"))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= 3,
        s"$e has $n files — expected 1..3 after filesPerPart=3")
    }
    assert(SnapshotTable.read(spark, root, v2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      == rows.sorted)
    intercept[IllegalArgumentException] {
      SnapshotTable.compact(spark, root, v2, "region", filesPerPart = 0)
    }
    // the daemon form: expectedBase < 0 compacts whatever is current
    val v3 = SnapshotTable.compact(spark, root, expectedBase = -1L,
      "region")
    assert(v3 == v2 + 1)
    assert(SnapshotTable.readLatest(spark, root).count() == 90)
  }

  test("appendInto: touched partitions gain the batch's rows, untouched " +
       "keep their files verbatim, bootstrap works, NULL partition " +
       "values are refused") {
    import spark.implicits._
    val root = freshRoot()
    // bootstrap through appendInto = commitPartitioned
    val v1 = SnapshotTable.appendInto(
      pdf(("asia", 1L, 10L), ("eu", 2L, 20L)), root, "region")
    assert(v1 == 1L)
    val v1Files = SnapshotTable.read(spark, root, v1).inputFiles.toSet
    // append touching only asia
    val v2 = SnapshotTable.appendInto(
      pdf(("asia", 3L, 30L)), root, "region")
    val got = SnapshotTable.read(spark, root, v2).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("asia", 1L), ("asia", 3L), ("eu", 2L)))
    val euFiles2 = SnapshotTable.read(spark, root, v2).inputFiles.toSet
      .filter(_.contains("region=eu"))
    assert(euFiles2.nonEmpty && euFiles2.subsetOf(v1Files),
      "append must not rewrite untouched partitions")
    intercept[IllegalArgumentException] {
      SnapshotTable.appendInto(
        Seq((null.asInstanceOf[String], 9L, 9L)).toDF("region", "id", "v"),
        root, "region")
    }
  }

  test("partition column round-trips its ORIGINAL type and column " +
       "order through the hive layout (recorded schema, not inference)") {
    import spark.implicits._
    val root = freshRoot()
    val src = Seq((7L, "x", 1L), (8L, "y", 2L)).toDF("k", "s", "v")
    SnapshotTable.commitPartitioned(src, root, 0L, "k")
    val back = SnapshotTable.read(spark, root, 1L)
    // parquet relaxes nullability — names, ORDER, and types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema drifted through the partition layout: ${back.schema}")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq == Seq((7L, "x"), (8L, "y")))
  }

  test("vacuum is reference-counted: dropping the version that CREATED " +
       "a data dir keeps exactly the subdirs later versions still " +
       "reference") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 3L, 30L), ("na", 4L, 40L)),
      root, 0L, "region")
    val v1Dir = new Path(SnapshotTable.read(spark, root, v1)
      .inputFiles.head).getParent.getParent
    val v2 = SnapshotTable.commitReplace(
      pdf(("asia", 1L, 11L)), root, v1, "region")
    val dropped = SnapshotTable.vacuum(spark, root, keepLast = 1,
      minAgeMs = 0L)
    assert(dropped == Seq(v1))
    // v1's dir SURVIVES (eu/na still referenced) minus its asia subdir
    assert(fs(root).exists(v1Dir), "vacuum deleted a still-referenced dir")
    val subdirs = fs(root).listStatus(v1Dir).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq
    assert(subdirs == Seq("region=eu", "region=na"),
      s"wrong surviving subdirs: $subdirs")
    assert(SnapshotTable.read(spark, root, v2).collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq ==
      Seq(("asia", 11L), ("eu", 30L), ("na", 40L)))
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, root, v1)
    }
  }

  test("version discovery is O(1) manifest body reads on the commit " +
       "path over a 100+-version history (the _last_checkpoint-style " +
       "pointer hint, spec-counted)") {
    val root = freshRoot()
    val base = (1 to 101).foldLeft(0L) { (b, i) =>
      SnapshotTable.commit(df("k" -> i.toLong), root, b,
        tag = Some(s"t$i"))
    }
    assert(base == 101L)
    def reads[T](body: => T): (T, Long) = {
      val before = SnapshotTable.manifestBodyReads.get()
      val r = body
      (r, SnapshotTable.manifestBodyReads.get() - before)
    }
    val (cur, curReads) = reads(SnapshotTable.currentVersion(spark, root))
    assert(cur == 101L)
    assert(curReads <= 3, s"currentVersion read $curReads bodies")
    val (_, commitReads) = reads(
      SnapshotTable.commit(df("k" -> -1L), root, 101L))
    assert(commitReads <= 3, s"commit path read $commitReads bodies")
    val (lt, tagReads) = reads(SnapshotTable.latestTag(spark, root))
    assert(lt.contains(("t101", 101L)), s"wrong latest tag: $lt")
    assert(tagReads <= 3, s"latestTag read $tagReads bodies")
    // pointer loss: the listing fallback still reads bodies lazily
    // from the top, not the whole history
    fs(root).delete(new Path(s"$root/_latest"), false)
    val (cur2, fallbackReads) = reads(
      SnapshotTable.currentVersion(spark, root))
    assert(cur2 == 102L)
    assert(fallbackReads <= 3,
      s"pointer-loss fallback read $fallbackReads bodies")
  }

  test("changes(): a payload field UPDATED TO NULL reports a NULL " +
       "post-image, not the resurrected old value") {
    import spark.implicits._
    val root = freshRoot()
    val v1 = Seq(("a", Option(5L)), ("b", Option(6L)))
      .toDF("k", "v")
    val v2 = Seq(("a", Option.empty[Long]), ("b", Option(6L)),
      ("c", Option.empty[Long])).toDF("k", "v")
    SnapshotTable.commit(v1, root, 0L)
    SnapshotTable.commit(v2, root, 1L)
    val feed = SnapshotTable.changes(spark, root, 1L, 2L, Seq("k"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
    assert(feed == Seq(("a", "update", None), ("c", "insert", None)),
      s"unexpected feed: $feed")
    val pre = SnapshotTable.changes(spark, root, 1L, 2L, Seq("k"),
        preimages = true)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(pre == Seq(("a", "update_postimage", None),
      ("a", "update_preimage", Some(5L)), ("c", "insert", None)),
      s"unexpected preimage feed: $pre")
  }

  test("pluggable commit arbiter: a fake conditional-PUT (object-store) " +
       "arbiter carries the same one-winner guarantee through an " +
       "8-thread race, and every commit actually funnels through it") {
    // simulates an S3 If-None-Match PUT: the putIfAbsent map IS the
    // store's conditional-create primitive; the filesystem write
    // happens only after winning it (overwrite=true — atomicity comes
    // from the arbiter, not the scheme)
    val puts =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val fake = new SnapshotTable.CommitArbiter {
      def createExclusive(fs: org.apache.hadoop.fs.FileSystem, path: Path,
                          body: Array[Byte]): Unit = {
        calls.incrementAndGet()
        if (puts.putIfAbsent(path.toString, true) != null)
          throw new java.nio.file.FileAlreadyExistsException(
            s"conditional PUT failed: $path exists")
        val out = fs.create(path, true)
        try out.write(body) finally out.close()
      }
    }
    val prev = SnapshotTable.installArbiter(fake)
    try {
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
      val (losers, winners) = results
        .toArray(Array.empty[Either[Throwable, Long]]).partition(_.isLeft)
      assert(winners.length == 1 && losers.length == 7)
      losers.foreach(l => assert(l.swap.toOption.get
        .isInstanceOf[java.util.ConcurrentModificationException]))
      assert(SnapshotTable.committedVersions(spark, root) == Seq(1L, 2L))
      assert(calls.get >= 2, "commits bypassed the installed arbiter")
      // losers cleaned their own data dirs: only the two live ones stay
      assert(fs(root).listStatus(new Path(root))
        .count(_.getPath.getName.startsWith("data-")) == 2)
    } finally SnapshotTable.installArbiter(prev)
  }

  // ----------------------------------------------------------------
  // data skipping: per-entry stats + pruneEntries/readWhere
  // ----------------------------------------------------------------

  import SnapshotTable.Pred

  test("commitPartitioned records per-entry min/max stats and " +
       "pruneEntries skips exactly the provably-empty entries") {
    val root = freshRoot()
    // id ranges: asia [1,2], eu [30,40], na [100,100]
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("asia", 2L, 20L), ("eu", 30L, 30L),
          ("eu", 40L, 40L), ("na", 100L, 7L)), root, 0L, "region")
    val m = SnapshotTable.manifestAt(spark, root, v1)
    assert(m.stats.length == m.entries.length, "stats must align")
    val idBounds = m.entries.zip(m.stats).map { case (e, s) =>
      e.substring(e.lastIndexOf('=') + 1) ->
        (s("id").min.toLong, s("id").max.toLong) }.toMap
    assert(idBounds == Map("asia" -> (1L, 2L), "eu" -> (30L, 40L),
      "na" -> (100L, 100L)))
    def part(e: String) = e.substring(e.lastIndexOf('=') + 1)
    def kept(preds: Pred*): Set[String] =
      SnapshotTable.pruneEntries(m, preds).map(part).toSet
    assert(kept(Pred("id", ">=", 30L)) == Set("eu", "na"))
    assert(kept(Pred("id", ">", 40L)) == Set("na"))
    assert(kept(Pred("id", "<", 30L)) == Set("asia"))
    assert(kept(Pred("id", "<=", 30L)) == Set("asia", "eu"))
    assert(kept(Pred("id", "=", 35L)) == Set("eu"))
    assert(kept(Pred("id", "=", 3L)) == Set.empty[String],
      "a value in no entry's bounds prunes everything")
    // conjunction: each pred prunes independently
    assert(kept(Pred("id", ">=", 30L), Pred("v", ">=", 35L)) == Set("eu"))
    // the PARTITION COLUMN prunes from the directory value itself
    assert(kept(Pred("region", "=", "eu")) == Set("eu"))
    assert(kept(Pred("region", ">", "eu")) == Set("na"))
    // unknown column / non-numeric value for a numeric bound: keep all
    assert(kept(Pred("nope", "=", 1L)) == Set("asia", "eu", "na"))
    assert(kept(Pred("id", "=", "x")) == Set("asia", "eu", "na"))
  }

  test("readWhere equals read().filter() differentially across ops " +
       "and probe values, while scanning only surviving entries") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("asia", 2L, 20L), ("eu", 30L, 30L),
          ("eu", 40L, 40L), ("na", 100L, 7L)), root, 0L, "region")
    val m = SnapshotTable.manifestAt(spark, root, v1)
    val full = SnapshotTable.read(spark, root, v1)
    for (op <- Seq("=", "<", "<=", ">", ">="); v <- Seq(0L, 2L, 35L, 100L,
         200L)) {
      val preds = Seq(Pred("id", op, v))
      val got = SnapshotTable.readWhere(spark, root, v1, preds)
        .collect().map(_.toString).sorted.toSeq
      val want = full.filter(SnapshotTable.predColumn(preds))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"readWhere drift for id $op $v")
    }
    // and the pruning is load-bearing: a selective pred scans 1 of 3
    assert(SnapshotTable.pruneEntries(m, Seq(Pred("id", ">", 40L)))
      .length == 1)
    assert(SnapshotTable.pruneEntries(m, Nil).length == 3,
      "no preds = no pruning")
  }

  test("an empty-string bound round-trips through the stats codec " +
       "(trailing-empty-token split) and a corrupt or misaligned " +
       "stats field degrades to no-stats instead of crashing readers") {
    import spark.implicits._
    val root = freshRoot()
    // s's min in partition a is "" — encodes to a line ENDING in tabs
    val v1 = SnapshotTable.commitPartitioned(
      Seq(("a", ""), ("a", "zz"), ("b", "mm")).toDF("region", "s"),
      root, 0L, "region")
    val m = SnapshotTable.manifestAt(spark, root, v1)
    val sA = m.entries.zip(m.stats)
      .find(_._1.endsWith("region=a")).get._2("s")
    assert((sA.min, sA.max) == ("", "zz"),
      s"empty-string bound broke the codec round trip: $sA")
    assert(SnapshotTable.pruneEntries(m, Seq(Pred("s", ">", "zz")))
      .isEmpty)
    assert(SnapshotTable.pruneEntries(m, Seq(Pred("s", "<", "a")))
      .map(e => e.substring(e.lastIndexOf('=') + 1)) == Seq("a"))
    // corrupt the stats blob in place: readers must survive, stats gone
    val mf = new Path(s"$root/_commits/v00000001.json")
    val body = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs(root).open(mf)), "UTF-8")
    val statsRe = """"stats":\[[^\]]*\]""".r
    def rewrite(newBody: String): Unit = {
      val out = fs(root).create(mf, true)
      try out.write(newBody.getBytes("UTF-8")) finally out.close()
    }
    rewrite(statsRe.replaceFirstIn(body, """"stats":["!!!not-base64!!!"]"""))
    assert(SnapshotTable.currentVersion(spark, root) == v1,
      "corrupt stats must not make the version unreadable")
    assert(SnapshotTable.manifestAt(spark, root, v1).stats.isEmpty)
    assert(SnapshotTable.readWhere(spark, root, v1,
      Seq(Pred("s", "<", "a"))).count() == 1L, "no-stats read stays exact")
    // misaligned (1 blob for 2 entries): silently discarded, never
    // attributed to the wrong entry
    val oneBlob = statsRe.findFirstIn(body).get
      .stripPrefix(""""stats":[""").stripSuffix("]").split(',').head
    rewrite(statsRe.replaceFirstIn(body,
      java.util.regex.Matcher.quoteReplacement(s""""stats":[$oneBlob]""")))
    assert(SnapshotTable.manifestAt(spark, root, v1).stats.isEmpty,
      "misaligned stats must be dropped wholesale")
  }

  test("commitReplace: kept entries INHERIT the parent's stats " +
       "verbatim, new entries get fresh bounds, and pruning works " +
       "across the mixed manifest") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 30L, 30L), ("na", 100L, 7L)),
      root, 0L, "region")
    val m1 = SnapshotTable.manifestAt(spark, root, v1)
    val v2 = SnapshotTable.commitReplace(
      pdf(("asia", 500L, 1L)), root, v1, "region")
    val m2 = SnapshotTable.manifestAt(spark, root, v2)
    assert(m2.stats.length == m2.entries.length)
    val byPart = (man: SnapshotTable.Manifest) =>
      man.entries.zip(man.stats).map { case (e, s) =>
        e.substring(e.lastIndexOf('=') + 1) -> s }.toMap
    val (s1, s2) = (byPart(m1), byPart(m2))
    assert(s2("eu") == s1("eu") && s2("na") == s1("na"),
      "untouched entries must carry the parent's stats verbatim")
    assert(s2("asia")("id") == SnapshotTable.ColStats("l", "500", "500"))
    assert(SnapshotTable.pruneEntries(m2, Seq(Pred("id", ">=", 400L)))
      .map(e => e.substring(e.lastIndexOf('=') + 1)) == Seq("asia"))
    assert(SnapshotTable.readWhere(spark, root, v2,
        Seq(Pred("id", ">=", 400L))).collect().map(_.getLong(1)).toSeq ==
      Seq(500L))
  }

  test("stats soundness edges: NaN extremes and all-NULL slices omit " +
       "the column, non-ASCII strings never prune, a NULL partition " +
       "prunes under any null-rejecting pred") {
    import spark.implicits._
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      Seq(("a", Some(1.0), Some("é")), ("a", Some(Double.NaN), Some("b")),
          ("b", None: Option[Double], Some("mm")),
          (null.asInstanceOf[String], Some(9.0), Some("q")))
        .toDF("region", "d", "s"), root, 0L, "region")
    val m = SnapshotTable.manifestAt(spark, root, v1)
    val byPart = m.entries.zip(m.stats).map { case (e, s) =>
      e.substring(e.lastIndexOf('=') + 1) -> s }.toMap
    assert(!byPart("a").contains("d"),
      "a NaN extreme must omit the column, not record an unsound bound")
    assert(!byPart("b").contains("d"), "all-NULL slice records no bound")
    // non-ASCII bound: recorded, but never used to prune
    assert(SnapshotTable.pruneEntries(m, Seq(Pred("s", ">", "zz")))
      .exists(_.endsWith("region=a")),
      "UTF8-vs-UTF16 order divergence: non-ASCII bounds must not prune")
    // NULL partition: excluded by ANY pred on the partition column
    val keptParts = SnapshotTable.pruneEntries(m,
        Seq(Pred("region", ">=", "a")))
      .map(e => e.substring(e.lastIndexOf('=') + 1)).toSet
    assert(!keptParts.contains("__HIVE_DEFAULT_PARTITION__"))
    // and the pruned read still equals the filtered full read
    val preds = Seq(Pred("region", ">=", "a"), Pred("d", ">=", 0.5))
    assert(SnapshotTable.readWhere(spark, root, v1, preds)
        .collect().map(_.toString).sorted.toSeq ==
      SnapshotTable.read(spark, root, v1)
        .filter(SnapshotTable.predColumn(preds))
        .collect().map(_.toString).sorted.toSeq)
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
