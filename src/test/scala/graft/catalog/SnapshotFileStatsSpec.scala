package graft.catalog

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import SnapshotTable.Pred

/** Round-10 read-side refinements: per-FILE skipping stats (the
  * Iceberg grain — skip inside a fragmented partition entry before
  * compaction runs) and timestamp time travel with Delta-style
  * monotonic adjustment. */
class SnapshotFileStatsSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snapfst").toString + "/t"

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A deliberately fragmented two-partition snapshot with EXACTLY
    * controlled per-file ranges: leg j (one upstream task, hence one
    * file per touched partition dir) carries ids in a range far from
    * every other leg's, so each region dir holds `legs.length` files
    * whose id intervals are disjoint WITH GAPS — the shape entry-level
    * bounds cannot skip inside. Legs are `parallelize`d RDD scans:
    * repartition(1) legs would share an identical partitioner and
    * sc.union would zip them into ONE task (PartitionerAwareUnionRDD),
    * and local-relation legs fold at optimization — both collapse the
    * fragmentation the fixture exists to plant. */
  private def fragmented(root: String, legs: Seq[Long]): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("region", StringType),
      StructField("id", LongType), StructField("v", LongType)))
    val df = legs.map { base =>
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("p0", base, base * 2), Row("p0", base + 5L, base * 2 + 1),
        Row("p1", base + 1L, base * 3)), 1), schema)
    }.reduce(_ union _)
    SnapshotTable.commitPartitioned(df, root, 0L, "region")
  }

  test("per-file stats are recorded per entry, entry bounds are their " +
       "exact merge, and pruneFiles skips files inside a kept entry — " +
       "including the every-file-excluded GAP case entry bounds miss") {
    val root = freshRoot()
    val legs = Seq(100L, 300L, 500L)
    val v1 = fragmented(root, legs)
    val m = SnapshotTable.manifestAt(spark, root, v1)
    assert(m.fileStats.length == m.entries.length)
    val byPart = m.entries.zip(m.stats.zip(m.fileStats)).map {
      case (e, s) => e.substring(e.lastIndexOf('=') + 1) -> s }.toMap
    // p0: 3 files, id ranges [100,105] [300,305] [500,505]
    val (p0Entry, p0Files) = byPart("p0")
    assert(p0Files.size == 3, s"expected 3 files, got ${p0Files.keys}")
    val ranges = p0Files.values
      .map(f => (f("id").min.toLong, f("id").max.toLong)).toSeq.sorted
    assert(ranges == Seq((100L, 105L), (300L, 305L), (500L, 505L)),
      s"per-file id bounds wrong: $ranges")
    assert((p0Entry("id").min.toLong, p0Entry("id").max.toLong) ==
      (100L, 505L), "entry bounds must merge the file bounds exactly")
    // a pred INSIDE one leg keeps one file of each surviving entry
    def keptFiles(preds: Pred*): Map[String, Option[Int]] =
      SnapshotTable.pruneFiles(m, preds).map { case (e, fns) =>
        e.substring(e.lastIndexOf('=') + 1) -> fns.map(_.length) }.toMap
    assert(keptFiles(Pred("id", ">=", 300L), Pred("id", "<=", 305L)) ==
      Map("p0" -> Some(1), "p1" -> Some(1)))
    // a pred in the GAP between legs: entry bounds keep the entry, but
    // every file excludes — the entry must drop entirely
    assert(keptFiles(Pred("id", "=", 200L)).isEmpty,
      "gap probe must drop the entry once every file is excluded")
    assert(SnapshotTable.readWhere(spark, root, v1,
      Seq(Pred("id", "=", 200L))).count() == 0L)
  }

  test("readWhere at file grain equals read().filter() differentially " +
       "across ops and probe values on the fragmented snapshot") {
    val root = freshRoot()
    val v1 = fragmented(root, Seq(100L, 300L, 500L))
    val full = SnapshotTable.read(spark, root, v1)
    for (op <- Seq("=", "<", "<=", ">", ">=");
         probe <- Seq(99L, 100L, 200L, 303L, 505L, 999L)) {
      val preds = Seq(Pred("id", op, probe))
      val got = SnapshotTable.readWhere(spark, root, v1, preds)
        .collect().map(_.toString).sorted.toSeq
      val want = full.filter(SnapshotTable.predColumn(preds))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"file-grain readWhere drift for id $op $probe")
    }
  }

  test("commitReplace: kept entries inherit the parent's FILE stats " +
       "verbatim; fileStatsCap overflow degrades that entry to " +
       "entry-level-only (pruneFiles answers None)") {
    import spark.implicits._
    val root = freshRoot()
    val v1 = fragmented(root, Seq(100L, 300L))
    val m1 = SnapshotTable.manifestAt(spark, root, v1)
    val v2 = SnapshotTable.commitReplace(
      Seq(("p0", 900L, 9L)).toDF("region", "id", "v"), root, v1, "region")
    val m2 = SnapshotTable.manifestAt(spark, root, v2)
    def fstat(m: SnapshotTable.Manifest, part: String) =
      m.entries.zip(m.fileStats).find(_._1.contains(part)).get._2
    assert(fstat(m2, "region=p1") == fstat(m1, "region=p1"),
      "kept entry must inherit the parent's file stats verbatim")
    assert(fstat(m2, "region=p0").nonEmpty &&
      fstat(m2, "region=p0") != fstat(m1, "region=p0"),
      "replaced entry must carry fresh file stats")
    // cap overflow: with the cap below the file count, only file-level
    // stats are dropped — entry-level bounds and pruning remain
    val prev = SnapshotTable.fileStatsCap
    SnapshotTable.fileStatsCap = 1
    try {
      val root2 = freshRoot()
      val w1 = fragmented(root2, Seq(100L, 300L))
      val mw = SnapshotTable.manifestAt(spark, root2, w1)
      assert(mw.fileStats.forall(_.isEmpty),
        "over-cap entries must record no file stats")
      assert(mw.stats.forall(_.nonEmpty),
        "entry-level stats must survive a cap overflow")
      assert(SnapshotTable.pruneFiles(mw, Seq(Pred("id", ">=", 300L)))
        .forall(_._2.isEmpty), "over-cap entries scan whole dirs (None)")
      // and reads stay exact
      assert(SnapshotTable.readWhere(spark, root2, w1,
          Seq(Pred("id", ">=", 300L))).count() ==
        SnapshotTable.read(spark, root2, w1)
          .filter(col("id") >= 300L).count())
    } finally SnapshotTable.fileStatsCap = prev
  }

  test("a column any file omits (NaN extreme / all-NULL slice) is " +
       "omitted at entry level too — the merge never manufactures an " +
       "unsound bound") {
    import spark.implicits._
    val root = freshRoot()
    // two files in partition a: one clean [1.0, 2.0], one with a NaN
    // extreme (records no bound) — the merged entry bound must be
    // OMITTED: Spark orders NaN greatest, so [1,2] would wrongly prune
    // a `d > 5` probe that the NaN row satisfies
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("region", StringType),
      StructField("d", DoubleType)))
    def leg(rows: Row*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    val df = leg(Row("a", 1.0), Row("a", 2.0))
      .union(leg(Row("a", Double.NaN), Row("a", 1.5)))
    val v1 = SnapshotTable.commitPartitioned(df, root, 0L, "region")
    val m = SnapshotTable.manifestAt(spark, root, v1)
    assert(!m.stats.head.contains("d"),
      "entry bound must be omitted when any file hides a NaN extreme")
    val clean = m.fileStats.head.values.filter(_.contains("d"))
    assert(clean.size == 1 && clean.head("d") ==
      SnapshotTable.ColStats("d", "1", "2"))
    // the NaN row still reads back under a > probe (kept via the
    // stats-less file, never pruned away)
    assert(SnapshotTable.readWhere(spark, root, v1,
      Seq(Pred("d", ">", 5.0))).count() == 1L)
  }

  test("history() is DESCRIBE HISTORY: one row per version with " +
       "commit/effective timestamps, tags, entry counts; " +
       "vacuumOlderThan retires by effective time, keeps the latest, " +
       "and stops at a ts-less version") {
    import spark.implicits._
    val root = freshRoot()
    def df(v: Long) = Seq(("a", v)).toDF("k", "v")
    SnapshotTable.commit(df(1L), root, 0L, commitTs = 1000L)
    SnapshotTable.commit(df(2L), root, 1L, tag = Some("t2"),
      commitTs = 2000L)
    SnapshotTable.commit(df(3L), root, 2L, commitTs = 1500L) // skewed
    val h = SnapshotTable.history(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(h == Seq(
      (1L, 1000L, 1000L, None, 1L),
      (2L, 2000L, 2000L, Some("t2"), 1L),
      (3L, 1500L, 2001L, None, 1L)), // effective adjusts the skew
      s"unexpected history: $h")
    // retention by time: cutoff 2001 ages out v1 and v2, keeps v3
    val dropped = SnapshotTable.vacuumOlderThan(spark, root, 2001L,
      minAgeMs = 0L)
    assert(dropped == Seq(1L, 2L))
    assert(SnapshotTable.committedVersions(spark, root) == Seq(3L))
    // the latest version NEVER ages out, even past its timestamp
    assert(SnapshotTable.vacuumOlderThan(spark, root, Long.MaxValue,
      minAgeMs = 0L).isEmpty)
    assert(SnapshotTable.readLatest(spark, root).count() == 1L)
    // a ts-less version stops time-based aging conservatively
    val root2 = freshRoot()
    SnapshotTable.commit(df(1L), root2, 0L, commitTs = 1000L)
    val mf = new Path(s"$root2/_commits/v00000001.json")
    val body = new String(org.apache.commons.io.IOUtils
      .toByteArray(fs(root2).open(mf)), "UTF-8")
    val out = fs(root2).create(mf, true)
    try out.write(body.replaceFirst(""","ts":\d+""", "").getBytes("UTF-8"))
    finally out.close()
    SnapshotTable.commit(df(2L), root2, 1L, commitTs = 2000L)
    SnapshotTable.commit(df(3L), root2, 2L, commitTs = 3000L)
    assert(SnapshotTable.vacuumOlderThan(spark, root2, Long.MaxValue,
      minAgeMs = 0L).isEmpty,
      "a ts-less version must stop time-based aging")
  }

  test("timestamp time travel: injected commit timestamps resolve by " +
       "version arithmetic, clock skew adjusts Delta-style, and " +
       "pre-history or ts-less manifests refuse loudly") {
    import spark.implicits._
    val root = freshRoot()
    def df(v: Long) = Seq(("a", v)).toDF("k", "v")
    SnapshotTable.commit(df(1L), root, 0L, commitTs = 1000L)
    SnapshotTable.commit(df(2L), root, 1L, commitTs = 2000L)
    // a skewed clock records 1500 AFTER 2000: effective = 2001
    SnapshotTable.commit(df(3L), root, 2L, commitTs = 1500L)
    def asOf(ts: Long) = SnapshotTable.versionAsOf(spark, root, ts)
    assert(asOf(1000L) == 1L)
    assert(asOf(1999L) == 1L, "v2 committed at 2000 — not visible at 1999")
    assert(asOf(2000L) == 2L, "the skewed commit must adjust past 2000")
    assert(asOf(2001L) == 3L)
    assert(asOf(Long.MaxValue) == 3L)
    assert(SnapshotTable.readAsOf(spark, root, 2000L)
      .collect().head.getLong(1) == 2L)
    intercept[IllegalArgumentException] { asOf(999L) }
    // default (no commitTs): wall clock is recorded
    val before = System.currentTimeMillis()
    SnapshotTable.commit(df(4L), root, 3L)
    val ts4 = SnapshotTable.manifestAt(spark, root, 4L).ts
    assert(ts4.exists(_ >= before), s"wall-clock ts missing: $ts4")
    // history predating timestamps: strip the ts field in place
    val mf = new Path(s"$root/_commits/v00000002.json")
    val body = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs(root).open(mf)), "UTF-8")
    val out = fs(root).create(mf, true)
    try out.write(body.replaceFirst(""","ts":\d+""", "").getBytes("UTF-8"))
    finally out.close()
    val e = intercept[RuntimeException] { asOf(2000L) }
    assert(e.getMessage.contains("timestamp"), e.getMessage)
  }
}
