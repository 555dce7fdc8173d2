package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import SnapshotTable.Pred

/** The `graft-snapshot` data source: DataFrameReader + SQL access with
  * Catalyst filter pushdown driving manifest entry/file pruning. */
class SnapshotSourceSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snapsrc").toString + "/t"

  private def pdf(vals: (String, Long, Long)*) = {
    import spark.implicits._
    vals.toSeq.toDF("region", "id", "v")
  }

  private def load(root: String, opts: (String, String)*) = {
    val r = spark.read.format("graft-snapshot").option("path", root)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("format('graft-snapshot') resolves by short name, reads the " +
       "latest version with the recorded schema, and pins versions / " +
       "as-of timestamps through options") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 3L, 30L)), root, 0L, "region",
      commitTs = 1000L)
    SnapshotTable.commitReplace(pdf(("asia", 1L, 11L)), root, v1,
      "region", commitTs = 2000L)
    val latest = load(root)
    assert(latest.schema.fieldNames.toSeq == Seq("region", "id", "v"))
    assert(latest.collect().map(r => (r.getString(0), r.getLong(2)))
      .sorted.toSeq == Seq(("asia", 11L), ("eu", 30L)))
    assert(load(root, "version" -> "1")
      .filter(col("region") === "asia").collect().head.getLong(2) == 10L)
    assert(load(root, "asOfTimestamp" -> "1500")
      .filter(col("region") === "asia").collect().head.getLong(2) == 10L)
    intercept[IllegalArgumentException] {
      load(root, "version" -> "1", "asOfTimestamp" -> "1500").collect()
    }
    intercept[Exception] { load(root + "missing").collect() }
  }

  test("pushed filters drive manifest pruning (spec-counted via " +
       "lastPlanned) and the result equals readWhere and a plain " +
       "filtered read, differentially across ops — unsupported " +
       "filters are ignored for skipping, never for semantics") {
    val root = freshRoot()
    val v1 = SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("asia", 2L, 20L), ("eu", 30L, 30L),
          ("eu", 40L, 40L), ("na", 100L, 7L)), root, 0L, "region")
    val m = SnapshotTable.manifestAt(spark, root, v1)
    val full = SnapshotTable.read(spark, root, v1)
    for (op <- Seq("=", "<", "<=", ">", ">="); probe <- Seq(2L, 35L, 100L)) {
      val preds = Seq(Pred("id", op, probe))
      val pc = SnapshotTable.predColumn(preds)
      val dsv = load(root).filter(pc)
      SnapshotSource.lastPlanned.set((-9L, -9L))
      val got = dsv.collect().map(_.toString).sorted.toSeq
      val (pe, _) = SnapshotSource.lastPlanned.get()
      val expectSel = SnapshotTable.pruneFiles(m, preds)
      assert(pe == expectSel.length.toLong,
        s"id $op $probe: pushdown planned $pe entries, " +
        s"pruneFiles says ${expectSel.length}")
      val want = full.filter(pc).collect().map(_.toString).sorted.toSeq
      assert(got == want, s"source read drift for id $op $probe")
    }
    // a filter shape the translator skips (OR) still evaluates exactly
    // (Spark re-applies every filter; pruning just keeps everything)
    val or = load(root).filter(col("id") === 1L || col("id") === 100L)
    SnapshotSource.lastPlanned.set((-9L, -9L))
    assert(or.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 100L))
    assert(SnapshotSource.lastPlanned.get()._1 == m.entries.length.toLong,
      "an untranslatable filter must not prune anything")
    // column pruning path: a two-column projection still answers
    assert(load(root).select("id").filter(col("id") > 50L)
      .collect().map(_.getLong(0)).toSeq == Seq(100L))
    // count(*): zero required columns
    assert(load(root).count() == 5L)
  }

  test("the 'table' option reads one table of a SnapshotGroup — latest, " +
       "pinned version, and as-of forms — with column pruning and no " +
       "skipping (the recorded group scope decision)") {
    import spark.implicits._
    val root = freshRoot()
    def t(vals: (String, Long)*) = vals.toSeq.toDF("k", "v")
    val g1 = SnapshotGroup.commit(Map(
      "corpus" -> t("a" -> 1L, "b" -> 2L), "idx" -> t("a" -> 10L)),
      root, 0L, commitTs = 1000L)
    SnapshotGroup.commit(Map(
      "corpus" -> t("a" -> 1L, "b" -> 2L, "c" -> 3L),
      "idx" -> t("a" -> 11L)), root, g1, commitTs = 2000L)
    def loadT(opts: (String, String)*) = {
      val r = spark.read.format("graft-snapshot").option("path", root)
        .option("table", "corpus")
      opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
    }
    assert(loadT().count() == 3L)
    assert(loadT("version" -> "1").count() == 2L)
    assert(loadT("asOfTimestamp" -> "1500").count() == 2L)
    // filters still evaluate exactly (re-applied above the scan)
    assert(loadT().filter(col("v") >= 2L).collect()
      .map(_.getString(0)).sorted.toSeq == Seq("b", "c"))
    // column pruning path + missing table stays loud
    assert(loadT().select("k").columns.toSeq == Seq("k"))
    intercept[Exception] {
      spark.read.format("graft-snapshot").option("path", root)
        .option("table", "nope").load().collect()
    }
  }

  test("SQL surface: CREATE TEMPORARY VIEW ... USING `graft-snapshot` " +
       "answers through plain SQL with the same pruning") {
    val root = freshRoot()
    SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 30L, 30L), ("na", 100L, 7L)),
      root, 0L, "region")
    spark.sql("DROP VIEW IF EXISTS snap_v")
    spark.sql(s"""CREATE TEMPORARY VIEW snap_v
      USING `graft-snapshot` OPTIONS (path '$root')""")
    try {
      SnapshotSource.lastPlanned.set((-9L, -9L))
      val rows = spark.sql(
        "SELECT region, v FROM snap_v WHERE id >= 30 ORDER BY id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("eu", 30L), ("na", 7L)))
      assert(SnapshotSource.lastPlanned.get()._1 == 2L,
        "SQL predicate must reach the relation and prune the asia entry")
    } finally spark.sql("DROP VIEW IF EXISTS snap_v"): Unit
  }

  test("IN, null-safe equality, and StartsWith push down to manifest " +
       "pruning (IN = excluded only when every member is; StartsWith " +
       "= the half-open ASCII prefix range), results identical to the " +
       "unpruned filter") {
    val root = freshRoot()
    SnapshotTable.commitPartitioned(
      pdf(("asia", 1L, 10L), ("eu", 30L, 30L), ("na", 100L, 7L)),
      root, 0L, "region")
    def planned[T](body: => T): (T, Long) = {
      SnapshotSource.lastPlanned.set((-9L, -9L))
      val r = body
      (r, SnapshotSource.lastPlanned.get()._1)
    }
    // IN over the partition column: two of three entries survive
    val (inRows, inPlanned) = planned(
      load(root).filter(col("region").isin("asia", "na"))
        .collect().map(_.getString(0)).sorted.toSeq)
    assert(inRows == Seq("asia", "na") && inPlanned == 2L,
      s"IN planned $inPlanned entries")
    // IN over a stats column: ids 1/30/100 in distinct entries
    val (inIds, inIdPlanned) = planned(
      load(root).filter(col("id").isin(30L, 100L))
        .collect().map(_.getLong(1)).sorted.toSeq)
    assert(inIds == Seq(30L, 100L) && inIdPlanned == 2L)
    // null-safe equality prunes like '='
    val (nsRows, nsPlanned) = planned(
      load(root).filter(col("region") <=> "eu")
        .collect().map(_.getString(0)).toSeq)
    assert(nsRows == Seq("eu") && nsPlanned == 1L)
    // StartsWith on the partition column: 'a' range keeps only asia
    val (swRows, swPlanned) = planned(
      load(root).filter(col("region").startsWith("a"))
        .collect().map(_.getString(0)).toSeq)
    assert(swRows == Seq("asia") && swPlanned == 1L,
      s"StartsWith planned $swPlanned entries")
  }

  test("writes are refused WITH GUIDANCE: save() names the commit API " +
       "and the safety inputs a blind write cannot carry, instead of " +
       "Spark's generic unsupported-write error") {
    val root = freshRoot()
    SnapshotTable.commitPartitioned(pdf(("asia", 1L, 10L)), root, 0L,
      "region")
    val e = intercept[Exception] {
      pdf(("eu", 2L, 20L)).write.format("graft-snapshot")
        .option("path", root).mode("append").save()
    }
    // Spark may wrap the provider's error; the GUIDANCE must survive
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("SnapshotTable") &&
      (msg.contains("expected base") ||
       msg.contains("optimistic concurrency")),
      s"refusal lost its guidance: $msg")
  }
}
