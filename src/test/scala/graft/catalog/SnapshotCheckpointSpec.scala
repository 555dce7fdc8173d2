package graft.catalog

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Metadata checkpointing ([[SnapshotTable.writeCheckpoint]] and the
  * checkpoint-aware audit readers): the O(versions) manifest walks the
  * r10 verdict named — versionAsOf, history, committedTags/Versions,
  * the latestTag fallback — must become O(checkpoint + suffix) on a
  * long history, with RESOLUTION UNCHANGED (the monotonic effective-ts
  * adjustment folds through the checkpoint seam), and vacuum must
  * extend coverage through its drop boundary before deleting manifests
  * so the fold prefix survives retention. */
class SnapshotCheckpointSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snapckpt").toString + "/t"

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def df(vals: (String, Long)*) = {
    import spark.implicits._
    vals.toSeq.toDF("k", "v")
  }

  /** A committed version WITHOUT a data write: manifests are the only
    * thing the audit surfaces read, so a 200-version history builds in
    * milliseconds. The body is the exact writer format (hand-rolled
    * here, which doubles as a parser fixture). */
  private def fakeManifest(root: String, v: Long, ts: Long,
      tag: Option[String] = None): Unit = {
    val schemaB64 = java.util.Base64.getEncoder
      .encodeToString("k BIGINT".getBytes("UTF-8"))
    val tagField = tag.map(t => s""","tag":"$t"""").getOrElse("")
    val body = (s"""{"version":$v,"base":${v - 1},"ts":$ts,""" +
      s""""entries":["data-fake-$v"],"schema":"$schemaB64"$tagField}""")
      .getBytes("UTF-8")
    SnapshotTable.createManifestExclusive(fs(root), root, v, body, None)
  }

  private def bodyReads[T](body: => T): (T, Long) = {
    val before = SnapshotTable.manifestBodyReads.get()
    val r = body
    (r, SnapshotTable.manifestBodyReads.get() - before)
  }

  test("200-version history: versionAsOf/history/committedTags/" +
       "committedVersions read O(suffix) manifest bodies once a " +
       "checkpoint covers the prefix, with resolution UNCHANGED") {
    val root = freshRoot()
    (1L to 200L).foreach(v =>
      fakeManifest(root, v, ts = 1000L + v, tag = Some(s"t$v")))
    // pre-checkpoint ground truth (pays the O(versions) walk)
    val (asOf150Before, walkReads) =
      bodyReads(SnapshotTable.versionAsOf(spark, root, 1150L))
    assert(asOf150Before == 150L)
    assert(walkReads >= 150L, s"walk read only $walkReads bodies?")
    val tagsBefore = SnapshotTable.committedTags(spark, root)
    assert(SnapshotTable.writeCheckpoint(fs(root), root, 200L))
    // post-checkpoint: same answers, suffix-only body reads
    val (asOf150, r1) =
      bodyReads(SnapshotTable.versionAsOf(spark, root, 1150L))
    assert(asOf150 == 150L)
    assert(r1 <= 2L, s"versionAsOf read $r1 bodies past the checkpoint")
    val (hist, r2) = bodyReads(
      SnapshotTable.history(spark, root).collect())
    assert(hist.length == 200 && r2 <= 2L,
      s"history read $r2 bodies for ${hist.length} rows")
    assert(hist.map(_.getLong(0)).toSeq == (1L to 200L))
    val (tags, r3) = bodyReads(SnapshotTable.committedTags(spark, root))
    assert(tags == tagsBefore && tags.size == 200 && r3 <= 2L,
      s"committedTags read $r3 bodies / drifted from the body walk")
    val (vs, r4) = bodyReads(SnapshotTable.committedVersions(spark, root))
    assert(vs == (1L to 200L) && r4 <= 2L,
      s"committedVersions read $r4 bodies")
    // the steady-state latestTag path must NOT pay the checkpoint
    // file read (its bytes grow with history): newest version tagged
    // => one body read, zero checkpoint reads
    val ckptBefore = SnapshotTable.checkpointReads.get()
    val (lt, r5) = bodyReads(SnapshotTable.latestTag(spark, root))
    assert(lt.contains(("t200", 200L)) && r5 <= 2L)
    assert(SnapshotTable.checkpointReads.get() == ckptBefore,
      "steady-state latestTag touched the checkpoint file")
  }

  test("latestTag: a deep run of untagged commits on top falls back " +
       "to the checkpoint after one interval of body reads instead " +
       "of walking every body") {
    val root = freshRoot()
    (1L to 40L).foreach(v =>
      fakeManifest(root, v, ts = 1000L + v,
        tag = if (v <= 5L) Some(s"t$v") else None))
    assert(SnapshotTable.writeCheckpoint(fs(root), root, 40L))
    val (lt, reads) = bodyReads(SnapshotTable.latestTag(spark, root))
    assert(lt.contains(("t5", 5L)))
    assert(reads <= SnapshotTable.checkpointInterval + 1L,
      s"latestTag read $reads bodies — no checkpoint cutoff")
  }

  test("the commit paths roll a checkpoint every interval commits " +
       "(real commits, real data)") {
    val root = freshRoot()
    val base = (1 to 12).foldLeft(0L) { (b, i) =>
      SnapshotTable.commit(df("a" -> i.toLong), root, b)
    }
    assert(base == 12L)
    val ck = SnapshotTable.latestCheckpoint(fs(root), root)
    assert(ck.map(_.k).contains(10L),
      s"expected auto-rollup through v10, got ${ck.map(_.k)}")
    assert(ck.exists(_.recs.map(_.version) == (1L to 10L)))
    // and the records carry what the manifests say
    assert(ck.exists(_.recs.forall(r => r.nEntries == 1L && r.ts.isDefined)))
  }

  test("vacuum extends the checkpoint through its drop boundary, so " +
       "the effective-clock fold (incl. the skew adjustment) survives " +
       "retention; resolution into the dropped span refuses loudly") {
    val root = freshRoot()
    // the snk23 skew shape: v3's clock runs BEHIND v2's
    Seq(1000L, 2000L, 1500L, 2500L, 3000L).zipWithIndex.foreach {
      case (ts, i) => fakeManifest(root, i + 1L, ts)
    }
    // pre-vacuum: eff = 1000, 2000, 2001(adjusted), 2500, 3000
    assert(SnapshotTable.versionAsOf(spark, root, 2001L) == 3L)
    assert(SnapshotTable.versionAsOf(spark, root, 2000L) == 2L)
    val dropped = SnapshotTable.vacuum(spark, root, keepLast = 3,
      minAgeMs = 0L)
    assert(dropped == Seq(1L, 2L))
    // the vacuum-written checkpoint covers the dropped versions
    val ck = SnapshotTable.latestCheckpoint(fs(root), root)
    assert(ck.exists(_.k >= 2L), s"no checkpoint through the drop: $ck")
    // fold continuity: v3 still resolves at its ADJUSTED effective ts
    // (2001), not its raw skewed 1500 — without the checkpoint the
    // fold would restart at the first survivor and as-of 1600 would
    // wrongly resolve to v3
    assert(SnapshotTable.versionAsOf(spark, root, 2001L) == 3L)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.versionAsOf(spark, root, 1600L)
    }
    assert(e.getMessage.contains("retention") ||
           e.getMessage.contains("precedes"))
    // history reports survivors only, with the adjusted clock
    val hist = SnapshotTable.history(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(hist.keySet == Set(3L, 4L, 5L))
    assert(hist(3L) == 2001L && hist(4L) == 2500L && hist(5L) == 3000L)
  }

  test("tags outlive retention through the checkpoint (idempotence " +
       "evidence for vacuumed ingest commits), and vacuum retires " +
       "superseded checkpoint files keeping the newest") {
    val root = freshRoot()
    (1L to 25L).foreach(v =>
      fakeManifest(root, v, ts = 1000L + v,
        tag = if (v <= 20L) Some(s"ingest-$v") else None))
    assert(SnapshotTable.writeCheckpoint(fs(root), root, 10L))
    assert(SnapshotTable.writeCheckpoint(fs(root), root, 20L))
    SnapshotTable.vacuum(spark, root, keepLast = 3, minAgeMs = 0L)
    // dropped v1..v22; tags of vacuumed versions still answer
    val tags = SnapshotTable.committedTags(spark, root)
    assert((1L to 20L).forall(v => tags.get(s"ingest-$v").contains(v)),
      s"vacuum lost committed-tag evidence: ${tags.size} tags")
    // latestTag over an all-untagged listing falls to the checkpoint
    assert(SnapshotTable.latestTag(spark, root)
      .contains(("ingest-20", 20L)))
    // exactly one checkpoint file remains (the newest)
    val left = fs(root).listStatus(new Path(s"$root/_commits")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("_ckpt-"))
    assert(left.length == 1 && left.head >= "_ckpt-v00000022",
      s"superseded checkpoints not retired: $left")
  }

  test("the record cap folds the oldest VACUUMED records into the " +
       "scalar summary: the file stays bounded and the effective-clock " +
       "fold base (incl. a skew adjustment inside the folded prefix) " +
       "is preserved exactly") {
    val root = freshRoot()
    val prevCap = SnapshotTable.checkpointRecordCap
    try {
      SnapshotTable.checkpointRecordCap = 4
      // v10's clock is wildly ahead: eff(10)=50000, eff(11..30)=50001..,
      // so every later version's EFFECTIVE ts diverges from its raw ts
      // — exactly what the summary must carry through the fold
      (1L to 30L).foreach(v =>
        fakeManifest(root, v, ts = if (v == 10L) 50000L else 1000L * v))
      assert(SnapshotTable.versionAsOf(spark, root, 50013L) == 23L)
      SnapshotTable.vacuum(spark, root, keepLast = 8, minAgeMs = 0L)
      // the vacuum-written checkpoint still lists the dropped versions
      // at write time (coverage precedes deletion), so folding happens
      // at the NEXT rollup, when they are gone from the listing
      fakeManifest(root, 31L, ts = 31000L)
      assert(SnapshotTable.writeCheckpoint(fs(root), root, 31L))
      val ck = SnapshotTable.latestCheckpoint(fs(root), root).get
      assert(ck.summV == 22L && ck.summN == 22L,
        s"expected versions 1..22 folded, got $ck")
      assert(ck.recs.map(_.version) == (23L to 31L),
        "live/suffix records must never fold")
      // eff(22) = 50012 via the folded skew; eff(23) = 50013 — a fold
      // restart at the first record would give eff(23) = raw = 23000
      // and resolve as-of 50013 to v30 instead
      assert(ck.summEff.contains(50012L), s"fold base wrong: $ck")
      assert(SnapshotTable.versionAsOf(spark, root, 50013L) == 23L,
        "summary folding changed as-of resolution")
      // forward compat: a FOLDED checkpoint stores its records under
      // "recsv2", which a pre-cap reader's `"recs":"` regex cannot
      // match — that binary degrades to an older checkpoint / bodies
      // instead of silently reading the records without the fold base
      val body = {
        val in = fs(root).open(new Path(
          s"$root/_commits/_ckpt-v00000031.json"))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      assert(body.contains("\"recsv2\":\"") && !body.contains("\"recs\":\""),
        s"folded checkpoint must rename the records field: $body")
    } finally SnapshotTable.checkpointRecordCap = prevCap
  }

  test("vacuum REFUSES to drop manifests it cannot checkpoint first " +
       "(a torn manifest in the roll range): committed history whose " +
       "clock/tag records would be lost is never deleted silently") {
    val root = freshRoot()
    (1L to 9L).foreach(v =>
      fakeManifest(root, v, ts = 1000L + v, tag = Some(s"t$v")))
    // corrupt v5 in place: file exists, body torn (no closing brace)
    val f = fs(root)
    val p = new Path(s"$root/_commits/v00000005.json")
    f.delete(p, false)
    val out = f.create(p, true)
    try out.write("""{"version":5,"base":4,"entries":["x""".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException] {
      SnapshotTable.vacuum(spark, root, keepLast = 3, minAgeMs = 0L)
    }
    assert(e.getMessage.contains("refusing to delete"))
    // nothing was dropped — the refusal precedes any deletion
    assert(SnapshotTable.committedVersions(spark, root) ==
      Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L))
  }

  test("pre-checkpointing vacuumed history (a PERMANENT head gap) " +
       "does not block rollups: one re-read, then proceed with the " +
       "surviving records") {
    val root = freshRoot()
    // versions 1..5 were vacuumed before any checkpoint existed
    (6L to 10L).foreach(v => fakeManifest(root, v, ts = 1000L * v))
    assert(SnapshotTable.writeCheckpoint(fs(root), root, 10L))
    val ck = SnapshotTable.latestCheckpoint(fs(root), root).get
    assert(ck.recs.map(_.version) == (6L to 10L) && ck.summV == 0L)
    assert(SnapshotTable.versionAsOf(spark, root, 7500L) == 7L)
  }

  test("a torn checkpoint degrades to the older one (or to bodies), " +
       "never to a wrong answer") {
    val root = freshRoot()
    (1L to 30L).foreach(v => fakeManifest(root, v, ts = 1000L + v))
    assert(SnapshotTable.writeCheckpoint(fs(root), root, 20L))
    // plant a GARBAGE newer checkpoint
    val f = fs(root)
    val p = new Path(s"$root/_commits/_ckpt-v00000029.json")
    val out = f.create(p, true)
    try out.write("{\"ckpt\":29,\"recs\":\"!!!not-base64!!!".getBytes("UTF-8"))
    finally out.close()
    assert(SnapshotTable.versionAsOf(spark, root, 1025L) == 25L)
    assert(SnapshotTable.history(spark, root).count() == 30L)
    assert(SnapshotTable.committedVersions(spark, root) == (1L to 30L))
  }

  test("checkpoint retirement keeps the newest PARSEABLE rollup: a " +
       "torn newer checkpoint file (a crashed concurrent rollup) must " +
       "not cause vacuum to delete the good one it depends on") {
    val root = freshRoot()
    (1L to 12L).foreach(v => fakeManifest(root, v, ts = 1000L + v,
      tag = Some(s"t$v")))
    assert(SnapshotTable.writeCheckpoint(fs(root), root, 12L))
    // a torn checkpoint NEWER than the good one, at a version no drop
    // boundary will reach — exists-only retirement would keep just it
    // and delete the good v12 rollup under it
    val f = fs(root)
    val torn = new Path(s"$root/_commits/_ckpt-v00000099.json")
    val out = f.create(torn, true)
    try out.write("{\"ckpt\":99,\"recsv2\":\"!!torn".getBytes("UTF-8"))
    finally out.close()
    SnapshotTable.vacuum(spark, root, keepLast = 3, minAgeMs = 0L)
    // the newest PARSEABLE checkpoint survived retirement, so the
    // vacuumed versions' clock and tag records still answer
    assert(SnapshotTable.latestCheckpoint(f, root).exists(_.k >= 9L),
      "vacuum retired the good rollup under a torn newer file")
    val tags = SnapshotTable.committedTags(spark, root)
    assert((1L to 9L).forall(v => tags.get(s"t$v").contains(v)),
      s"vacuumed tag records lost: ${tags.size}")
    assert(SnapshotTable.versionAsOf(spark, root, 1011L) == 11L)
  }

  test("a torn checkpoint AT the drop boundary (crashed twin in the " +
       "create→write window) is cleared and re-written, not counted " +
       "as coverage by its mere existence") {
    val root = freshRoot()
    (1L to 9L).foreach(v => fakeManifest(root, v, ts = 1000L + v,
      tag = Some(s"t$v")))
    // the torn file sits exactly where vacuum's coverage extension
    // wants to write (drop boundary = v6 for keepLast 3): exists-only
    // success would report coverage through v6 with no parseable
    // records anywhere, then delete v1..v6's manifests
    val f = fs(root)
    val p = new Path(s"$root/_commits/_ckpt-v00000006.json")
    val out = f.create(p, true)
    try out.write("{\"ckpt\":6,\"recs\":\"!!torn".getBytes("UTF-8"))
    finally out.close()
    val dropped = SnapshotTable.vacuum(spark, root, keepLast = 3,
      minAgeMs = 0L)
    assert(dropped == (1L to 6L))
    val ck = SnapshotTable.latestCheckpoint(f, root)
    assert(ck.exists(c => c.k == 6L && c.recs.nonEmpty),
      s"torn boundary checkpoint not replaced by a real rollup: $ck")
    val tags = SnapshotTable.committedTags(spark, root)
    assert((1L to 6L).forall(v => tags.get(s"t$v").contains(v)),
      "dropped versions' tag records exist nowhere parseable")
    assert(SnapshotTable.versionAsOf(spark, root, 1008L) == 8L)
  }

  test("writeCheckpoint refuses to record a gap: an unparseable " +
       "manifest in the roll range aborts the rollup (retried at the " +
       "next interval), it never writes a checkpoint missing a version") {
    val root = freshRoot()
    (1L to 9L).foreach(v => fakeManifest(root, v, ts = 1000L + v))
    // a torn manifest mid-range: file exists, body incomplete
    val f = fs(root)
    val p = new Path(s"$root/_commits/v00000005.json")
    f.delete(p, false)
    val out = f.create(p, true)
    try out.write("""{"version":5,"base":4,"entries":["x""".getBytes("UTF-8"))
    finally out.close()
    assert(!SnapshotTable.writeCheckpoint(f, root, 9L))
    assert(SnapshotTable.latestCheckpoint(f, root).isEmpty)
  }
}
