package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned table commits — the manifest-based protocol that
  * generalizes [[graft.stream.Streams]]' stage→swap and
  * [[PartitionMerge]]'s rename discipline into SNAPSHOT ISOLATION with
  * TIME TRAVEL and loud OPTIMISTIC-CONCURRENCY conflicts, retiring the
  * "a Delta/Iceberg sink is needed for real multi-writer commits"
  * caveat for the single-table case.
  *
  * Layout under the table root:
  * {{{
  *   data-<uuid>/ ...            immutable snapshot dirs (parquet),
  *                               UNIQUELY named per commit attempt
  *   _commits/v00000001.json     manifest — EXISTENCE = committed;
  *                               body records which data dir is vN
  *   _latest                     pointer cache (advisory, see below)
  * }}}
  *
  * The COMMIT ARBITER is the manifest file, exclusively created —
  * atomic on HDFS (`create(overwrite=false)`) and on local disks (NIO
  * O_EXCL for the file:// scheme; Hadoop's local create is
  * check-then-act, caught by the race spec). Plain S3A has no atomic
  * create — a deployment there needs S3 conditional PUTs or an
  * external lock, the caveat every manifest-based format documents.
  * Readers treat a manifest as committed only once its BODY parses, so
  * the create→write visibility window reads as "not committed yet".
  * Everything else is ordered around the arbiter:
  *  1. data writes COMPLETELY into a fresh uniquely-named dir — no two
  *     writers ever touch the same path, so there is NO shared rename
  *     target (an earlier design renamed staging onto a shared `vN/`;
  *     an 8-thread race test caught both of that design's holes —
  *     Hadoop's local rename NESTS into an existing destination dir
  *     instead of failing, and the rename→manifest window let a
  *     concurrent committer reclaim a LIVE writer's data);
  *  2. the manifest — naming the data dir in its body — is exclusively
  *     created: the second committer of the same base loses this race,
  *     FAILS LOUDLY with the conflict error, and deletes only its OWN
  *     data dir. A crash before the manifest leaves an orphan data dir
  *     no reader can see ([[vacuum]] reclaims it);
  *  3. the `_latest` pointer is refreshed LAST and is only a cache:
  *     readers that find it missing or stale fall back to listing
  *     `_commits/`, which is authoritative, so a crash between 2 and 3
  *     loses nothing.
  *
  * Readers never lock: `read(version)` requires the version's manifest
  * and scans its immutable dir — a concurrent commit cannot change
  * bytes under a running query (the Delta/Iceberg property the
  * rename-swap protocol lacked). Old versions stay readable until
  * [[vacuum]] drops them.
  *
  * 100 TB posture: the manifest is O(1) metadata, never data; a commit
  * writes only its own snapshot. For tables too big to rewrite
  * wholesale the snapshot dir holds the OUTPUT of a partition-scoped
  * plan ([[PartitionMerge.mergeInto]] against the previous version's
  * dir) — the protocol versions direcories, not diffs, and composes
  * with any layout inside the dir. Reference grounding: the
  * geodatabase's transactional update cursors (`pyt:318-324`,
  * `pyt:879-885`) assume exactly this commit-or-nothing property.
  */
object SnapshotTable {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vdir(version: Long): String = f"v$version%08d"
  private def manifest(root: String, version: Long): Path =
    new Path(s"$root/_commits/${vdir(version)}.json")

  /** Committed versions, ascending — from the `_commits/` listing, the
    * authoritative record (the pointer is only a cache). A manifest
    * counts only once its BODY parses (names a data dir): on
    * filesystems where create() makes the file visible before the
    * body lands, a reader hitting the create→write window must see
    * "not committed yet", not a half-committed version. */
  def committedVersions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val dir = new Path(s"$root/_commits")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .filter(v => DirRe.findFirstIn(readManifest(fs, root, v)).isDefined)
      .sorted
  }

  /** Latest committed version; 0 = empty table (no commits yet). */
  def currentVersion(spark: SparkSession, root: String): Long =
    committedVersions(spark, root).lastOption.getOrElse(0L)

  private def readManifest(fs: FileSystem, root: String, v: Long): String = {
    val in = fs.open(manifest(root, v))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  private val DirRe = """"dir":"([^"]*)"""".r
  private val TagRe = """"tag":"([^"]*)"""".r

  /** The data directory committed as `version` — recorded in the
    * manifest body (dirs are uniquely named; nothing shares a path). */
  private def dataDirOf(fs: FileSystem, root: String, v: Long): String =
    DirRe.findFirstMatchIn(readManifest(fs, root, v))
      .map(m => m.group(1))
      .getOrElse(sys.error(
        s"snapshot: version $v manifest at $root carries no data dir"))

  /** Read each committed version's manifest `tag` (absent → no entry).
    * Tags are the replay-idempotence hook: a streaming sink stamps
    * each commit with its micro-batch id and skips batches whose tag
    * is already committed. O(versions) small reads — vacuum bounds it;
    * the per-batch streaming path uses [[latestTag]] instead. */
  def committedTags(spark: SparkSession, root: String): Map[String, Long] = {
    val fs = fsOf(spark, root)
    committedVersions(spark, root).flatMap { v =>
      TagRe.findFirstMatchIn(readManifest(fs, root, v))
        .map(m => m.group(1) -> v)
    }.toMap
  }

  /** The most recent committed version that carries a tag, with its
    * tag — scanning versions DESCENDING and stopping at the first hit,
    * so a streaming sink's per-batch idempotence check is O(1)
    * manifest reads instead of O(stream length) (untagged foreign
    * commits in between are skipped over). */
  def latestTag(spark: SparkSession, root: String): Option[(String, Long)] = {
    val fs = fsOf(spark, root)
    committedVersions(spark, root).reverseIterator
      .flatMap(v => TagRe.findFirstMatchIn(readManifest(fs, root, v))
        .map(m => m.group(1) -> v))
      .nextOption()
  }

  /** Commit `df` as the next snapshot, REQUIRING the table to still be
    * at `expectedBase` — optimistic concurrency. Returns the new
    * version. The second committer of the same base fails loudly at
    * either the pre-check or (under a true race) the exclusive manifest
    * create; it removes ONLY its own uniquely-named data dir, so the
    * winner's commit is untouchable (8-thread race spec-pinned).
    * `tag`, if given, is recorded in the manifest for
    * [[committedTags]]-based replay idempotence. */
  def commit(df: DataFrame, root: String, expectedBase: Long,
             tag: Option[String] = None): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    // the tag is interpolated into the manifest JSON and re-parsed by a
    // regex — a quote/backslash/control char would corrupt both, and a
    // corrupted tag silently breaks replay idempotence. Refuse loudly.
    tag.foreach(t => require(
      t.nonEmpty && t.forall(ch => ch >= ' ' && ch != '"' && ch != '\\'),
      s"snapshot commit: tag '$t' must be non-empty printable text " +
      "without quotes or backslashes"))
    val cur = currentVersion(spark, root)
    if (cur != expectedBase)
      throw new java.util.ConcurrentModificationException(
        s"snapshot commit conflict at $root: expected base version " +
        s"$expectedBase but the table is at $cur — rebase on the " +
        "current snapshot and retry")
    val next = cur + 1
    // uniquely-named data dir: no writer ever touches another's path,
    // and a crash before the manifest leaves an invisible orphan
    val dirName = s"data-${java.util.UUID.randomUUID()}"
    val dataDir = new Path(s"$root/$dirName")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val m = manifest(root, next)
    fs.mkdirs(m.getParent)
    val tagField = tag.map(t => s""","tag":"$t"""").getOrElse("")
    val body =
      s"""{"version":$next,"base":$expectedBase,"dir":"$dirName"$tagField}"""
        .getBytes("UTF-8")
    // THE commit point: exclusive create — exactly one writer per
    // version. Atomicity honesty: HDFS create(overwrite=false) is
    // atomic; the LOCAL filesystem's is check-then-act, so for the
    // file:// scheme we use NIO's O_EXCL createFile (genuinely atomic —
    // what makes the 8-thread race spec sound rather than
    // probabilistic). Plain S3A has no atomic create at all — a
    // deployment there needs S3 conditional PUTs or an external lock,
    // the same caveat Delta documents.
    try {
      if (fs.getScheme == "file") {
        val local = java.nio.file.Paths.get(m.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local) // throws if it exists
        java.nio.file.Files.write(local, body)
      } else {
        val out = fs.create(m, false)
        try out.write(body) finally out.close()
      }
    } catch {
      case e @ (_: java.io.IOException |
                _: java.nio.file.FileAlreadyExistsException) =>
        fs.delete(dataDir, true) // own dir only — the winner keeps its data
        throw new java.util.ConcurrentModificationException(
          s"snapshot commit conflict at $root: lost the version-$next " +
          s"manifest race (${e.getMessage})")
    }
    // pointer refresh — advisory cache only, losers of this race are
    // corrected by the _commits listing fallback
    val tmp = new Path(s"$root/._latest-${java.util.UUID.randomUUID()}")
    val pout = fs.create(tmp, true)
    try pout.write(next.toString.getBytes("UTF-8")) finally pout.close()
    val ptr = new Path(s"$root/_latest")
    fs.delete(ptr, false)
    if (!fs.rename(tmp, ptr)) fs.delete(tmp, false)
    next
  }

  /** Time-travel read: the immutable snapshot of `version`. Fails
    * loudly on an uncommitted version (data-dir presence alone is a
    * crashed writer, not a commit). */
  def read(spark: SparkSession, root: String, version: Long): DataFrame = {
    val fs = fsOf(spark, root)
    require(fs.exists(manifest(root, version)),
      s"snapshot read: version $version of $root was never committed " +
      s"(committed: ${committedVersions(spark, root).mkString(",")})")
    spark.read.parquet(
      s"$root/${dataDirOf(fsOf(spark, root), root, version)}")
  }

  /** Read the latest committed snapshot (pointer fast path, listing
    * fallback). */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root)
    require(v > 0, s"snapshot read: $root has no committed version")
    read(spark, root, v)
  }

  /** CHANGE FEED between two committed versions — the Delta/Iceberg
    * CDF shape, derivable here because versions are immutable
    * snapshots: one keyed full-outer join of the two version dirs
    * emits `insert` (key only in `toV`, post-image), `delete` (key
    * only in `fromV`, pre-image), and `update` (payload struct
    * differs, post-image); unchanged rows are filtered in-plan, so
    * the feed is diff-sized downstream of the join. This is what an
    * incremental consumer (MV maintenance via [[Mv.deletePartials]] +
    * [[Mv.partials]], cache invalidation, downstream sync) reads
    * instead of re-scanning history — on a partition-keyed table the
    * join prunes to partitions either side touched. Keys must be
    * unique per version (the upsert contract).
    *
    * With `preimages = true` an update emits TWO rows —
    * `update_preimage` (old payload) and `update_postimage` (new) —
    * the Delta-CDF shape an incremental MV needs: retract every
    * preimage/delete row, add every postimage/insert row (composition
    * proven in MvSpec). */
  def changes(spark: SparkSession, root: String, fromV: Long, toV: Long,
              keys: Seq[String], preimages: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromV < toV, s"changes: fromV $fromV must precede toV $toV")
    val a = read(spark, root, fromV)
    val b = read(spark, root, toV)
    val payload = b.columns.filterNot(keys.contains).toSeq
    val pa = a.select(keys.map(col) :+
      struct(payload.map(col): _*).as("_pre"): _*)
    val pb = b.select(keys.map(col) :+
      struct(payload.map(col): _*).as("_post"): _*)
    val joined = pa.join(pb, keys, "full_outer")
    if (!preimages)
      joined
        .withColumn("change_type",
          when(col("_pre").isNull, lit("insert"))
            .when(col("_post").isNull, lit("delete"))
            .when(!(col("_pre") <=> col("_post")), lit("update")))
        .filter(col("change_type").isNotNull)
        .select(keys.map(col) ++ Seq(col("change_type")) ++
          payload.map(p =>
            coalesce(col(s"_post.$p"), col(s"_pre.$p")).as(p)): _*)
    else {
      // unchanged rows yield a NULL event array — explode drops them
      def ev(tpe: String, img: org.apache.spark.sql.Column) =
        struct(lit(tpe).as("change_type"), img.as("img"))
      val events =
        when(col("_pre").isNull, array(ev("insert", col("_post"))))
          .when(col("_post").isNull, array(ev("delete", col("_pre"))))
          .when(!(col("_pre") <=> col("_post")),
            array(ev("update_preimage", col("_pre")),
                  ev("update_postimage", col("_post"))))
      joined
        .select(keys.map(col) :+ explode(events).as("_c"): _*)
        .select(keys.map(col) ++ Seq(col("_c.change_type")) ++
          payload.map(p => col(s"_c.img.$p").as(p)): _*)
    }
  }

  /** Drop snapshots older than `keepLast` versions plus any orphan data
    * dirs no surviving manifest references (crashed or race-losing
    * writers). Never touches committed versions in the keep window.
    * MAINTENANCE-EXCLUSIVE: like Delta's VACUUM, this must not run
    * concurrently with an in-flight commit — a live writer's data dir
    * is an orphan until its manifest lands. Returns the removed
    * version numbers. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 2)
      : Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the live snapshot")
    val fs = fsOf(spark, root)
    val versions = committedVersions(spark, root)
    val drop = versions.dropRight(keepLast)
    drop.foreach { v =>
      fs.delete(new Path(s"$root/${dataDirOf(fs, root, v)}"), true)
      fs.delete(manifest(root, v), false)
    }
    // orphans: data dirs not referenced by any SURVIVING manifest
    val referenced = committedVersions(spark, root)
      .map(v => dataDirOf(fs, root, v)).toSet
    fs.listStatus(new Path(root)).toSeq.map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("data-") && !referenced.contains(n))
        fs.delete(p, true)
    }
    drop
  }
}
