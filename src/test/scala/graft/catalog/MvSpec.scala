package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** [[Mv]] incremental view maintenance: the merge algebra and the
  * only-batch-and-view read pattern that makes it O(batch) at scale. */
class MvSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"
  private val keys = Seq("l_returnflag", "l_linestatus")
  private def cents = round(col("l_extendedprice") * 100).cast("long")
  private def li = graft.table(spark, dir, "lineitem")

  test("merge(partials(A), partials(B)) == partials(A ∪ B) on random splits") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val full = canon(Mv.partials(li, keys, cents))
    // three different split predicates, including one that leaves a
    // group entirely on one side (returnflag split) so batch-new and
    // batch-absent groups both occur
    val splits = Seq[org.apache.spark.sql.Column](
      col("l_orderkey") % 10 === 0,
      col("l_orderkey") % 3 === 1,
      col("l_returnflag") === "R")
    splits.foreach { p =>
      val merged = Mv.merge(
        Mv.partials(li.filter(!p), keys, cents),
        Mv.partials(li.filter(p), keys, cents), keys)
      assert(canon(merged) == full,
        s"incremental != recompute for split $p")
    }
  }

  test("refresh from landed files reads ONLY the view and the batch — " +
       "never the history table") {
    val base = java.nio.file.Files.createTempDirectory("mv").toString
    val histView = s"$base/mv"
    val batchPath = s"$base/batch"
    Mv.partials(li.filter(col("l_orderkey") % 10 =!= 0), keys, cents)
      .write.parquet(histView)
    li.filter(col("l_orderkey") % 10 === 0).write.parquet(batchPath)
    val refreshed = Mv.merge(
      spark.read.parquet(histView),
      Mv.partials(spark.read.parquet(batchPath), keys, cents), keys)
    refreshed.count()
    val scanned = collectWithSubqueries(refreshed.queryExecution.executedPlan) {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scanned.nonEmpty)
    assert(scanned.forall(p => p.contains(histView) || p.contains(batchPath)),
      s"refresh read outside view+batch: $scanned")
    assert(!scanned.exists(_.contains("lineitem")),
      "refresh re-read the history fact table")
    // and it is still exactly the full recompute
    val full = Mv.partials(li, keys, cents).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = refreshed.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == full)
  }

  private def canon5(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("A19 retractions: mergeDeletes + repairMax == recompute on survivors") {
    val deletePreds = Seq[org.apache.spark.sql.Column](
      col("l_orderkey") % 10 === 0,      // scattered rows, max mostly safe
      col("l_returnflag") === "R",       // whole groups emptied
      cents >= 9000000L)                 // deletes the extrema → max stale
    deletePreds.foreach { p =>
      val view = Mv.partials(li, keys, cents)
      val merged = Mv.mergeDeletes(
        view, Mv.deletePartials(li.filter(p), keys, cents), keys)
      val survivors = li.filter(!p)
      val repaired = Mv.repairMax(merged, survivors, keys, cents)
      assert(canon5(repaired) == canon5(Mv.partials(survivors, keys, cents)),
        s"incremental-with-deletes != recompute for delete predicate $p")
    }
  }

  test("A19 retractions: max survives WITHOUT history read when the " +
       "deleted max is strictly below the stored max") {
    // delete only cheap rows: every group's stored max survives, so no
    // row is flagged and repairMax's history leg has nothing to scan
    val p = cents < 100000L
    val merged = Mv.mergeDeletes(
      Mv.partials(li, keys, cents),
      Mv.deletePartials(li.filter(p), keys, cents), keys)
    assert(merged.filter(col("max_stale")).isEmpty,
      "a strictly-smaller deleted max must not invalidate the stored max")
    assert(canon5(merged.drop("max_stale")) ==
           canon5(Mv.partials(li.filter(!p), keys, cents)))
  }

  test("A19 × SNK9 composition: a view maintained from the snapshot " +
       "CHANGE FEED equals the recompute over the new version") {
    // the full incremental loop: fact table versions v1 -> v2 (rows
    // dropped, added, AND updated in place), row-level CDF with
    // preimages, view maintained by retracting preimage+delete rows
    // and adding postimage+insert rows — never re-reading v2 wholesale
    val root = java.nio.file.Files.createTempDirectory("mvcdf")
      .toString + "/facts"
    val factKeys = Seq("l_orderkey", "l_linenumber")
    // (orderkey, linenumber) is NOT unique in the fixture — reduce to
    // that grain first, per changes()' unique-key contract
    def facts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(max(col("l_returnflag")).as("l_returnflag"),
             max(col("l_linestatus")).as("l_linestatus"),
             sum(round(col("l_extendedprice") * 100).cast("long"))
               .as("cents"))
    val v1 = facts(li.filter(col("l_orderkey") % 5 =!= 0))
    val v2 = facts(li.filter(col("l_orderkey") % 7 =!= 0))
      // in-place updates: every 11th surviving row doubles its price
      .withColumn("cents",
        when(col("l_orderkey") % 11 === 0, col("cents") * 2)
          .otherwise(col("cents")))
    SnapshotTable.commit(v1, root, 0L)
    SnapshotTable.commit(v2, root, 1L)
    val feed = SnapshotTable.changes(spark, root, 1L, 2L, factKeys,
      preimages = true).localCheckpoint()
    val adds = feed.filter(
      col("change_type").isin("insert", "update_postimage"))
    val drops = feed.filter(
      col("change_type").isin("delete", "update_preimage"))
    val view1 = Mv.partials(v1, keys, col("cents"))
    val afterAdds = Mv.merge(view1,
      Mv.partials(adds, keys, col("cents")), keys)
    val merged = Mv.mergeDeletes(afterAdds,
      Mv.deletePartials(drops, keys, col("cents")), keys)
    val repaired = Mv.repairMax(merged,
      SnapshotTable.read(spark, root, 2L), keys, col("cents"))
    assert(canon5(repaired) == canon5(Mv.partials(v2, keys, col("cents"))),
      "incrementally-maintained view != recompute over version 2")
  }

  private def SnapshotTable = graft.catalog.SnapshotTable

  test("A19 retractions: CHAINED delete batches carry the stale flag — " +
       "a second batch must not clear an unrepaired NULL max") {
    // batch 1 deletes the extrema (max goes stale/NULL); batch 2
    // deletes cheap rows from OTHER rows before any repair ran
    val p1 = cents >= 9000000L
    val p2 = !p1 && cents < 100000L
    val m1 = Mv.mergeDeletes(Mv.partials(li, keys, cents),
      Mv.deletePartials(li.filter(p1), keys, cents), keys)
    val staleGroups = m1.filter(col("max_stale"))
      .select(keys.map(col): _*).collect().map(_.toString).toSet
    assert(staleGroups.nonEmpty, "fixture produced no stale group")
    val m2 = Mv.mergeDeletes(m1.drop("max_stale"),
      Mv.deletePartials(li.filter(p2), keys, cents), keys)
    val stillStale = m2.filter(col("max_stale"))
      .select(keys.map(col): _*).collect().map(_.toString).toSet
    assert(staleGroups.subsetOf(stillStale),
      s"chaining cleared stale groups: ${staleGroups -- stillStale}")
    // and the chained result still repairs to the recompute
    val survivors = li.filter(!p1 && !p2)
    assert(canon5(Mv.repairMax(m2, survivors, keys, cents)) ==
           canon5(Mv.partials(survivors, keys, cents)))
  }

  test("A19 retractions: over-delete and absent-group deletes fail loudly") {
    import spark.implicits._
    val view = Mv.partials(li, keys, cents)
    val doubled = Mv.deletePartials(
      li.filter(col("l_returnflag") === "R"), keys, cents)
      .withColumn("n_rows", col("n_rows") * 2)
    intercept[IllegalArgumentException] {
      Mv.mergeDeletes(view, doubled, keys)
    }
    val phantom = Seq(("Z", "Z", -1L, -100L, 100L))
      .toDF("l_returnflag", "l_linestatus", "n_rows", "sum_cents",
        "del_max_cents")
    intercept[IllegalArgumentException] {
      Mv.mergeDeletes(view, phantom, keys)
    }
  }
}
