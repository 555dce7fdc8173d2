package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — the pre-aggregation
  * pattern that makes dashboard-grain queries O(batch), not O(history),
  * at fact scale: the view stores one row of MERGEABLE state per group
  * (count, sum, max — avg derives as sum/count downstream), and a new
  * batch refreshes it by aggregating ONLY its own rows to the same
  * state and folding them in. History is never re-read: the refresh
  * touches the view (group-cardinality rows) plus the batch. The same
  * algebra [[graft.ops.RelQueries]]'s a18 uses for HLL sketches and
  * a15 for Misra-Gries counters, here for the plain additive aggregate
  * family. Inserts-only (max is not mergeable under deletes; deletes at
  * scale go through [[PartitionMerge.deleteFrom]] + partition-scoped
  * rebuild of the view).
  *
  * 100 TB posture: both sides of a refresh are tiny relative to the
  * fact table — the batch partial is one map-side-combined aggregate of
  * the new files, the merge an exchange at group cardinality. The view
  * itself rewrites wholesale only because it IS group-sized; a
  * partition-keyed view composes with [[PartitionMerge.mergeInto]]
  * instead.
  */
object Mv {

  /** The mergeable partial state of the grouped aggregate: one row per
    * key tuple — (n_rows, sum_cents, max_cents). */
  def partials(df: DataFrame, keys: Seq[String], valueCents: Column)
      : DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
           sum(valueCents).as("sum_cents"),
           max(valueCents).as("max_cents"))

  /** Fold a batch's partial state into the stored view: union + one
    * re-aggregation at group cardinality (count and sum merge by sum,
    * max by max). Groups new to the batch appear, untouched groups ride
    * through — the union-agg form needs no outer-join null handling. */
  def merge(mv: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    mv.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
           sum(col("sum_cents")).as("sum_cents"),
           max(col("max_cents")).as("max_cents"))

  /** S17: the mergeable per-column PROFILE state — one row per audited
    * column: exact row/null counts plus a Datasketches HLL sketch of
    * the column's values (the v6 profile's metrics, re-expressed so
    * every field merges: counts by sum, sketches by union). Built in
    * ONE aggregate over the batch, unpivoted via the 1-row
    * struct-array inline, exactly v6's shape. */
  def profilePartials(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c => Seq(
      sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
      expr(s"hll_sketch_agg($c)").as(s"${c}__sk")) }
    val entries = array(cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__nulls").as("n_null"),
        col(s"${c}__sk").as("sk")) }: _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(entries).as("m"))
      .select(col("m.col_name").as("col_name"), col("n_rows"),
        col("m.n_null").as("n_null"), col("m.sk").as("sk"))
  }

  /** Fold a batch's profile partials into the stored profile — sketch
    * union re-touches no rows, the a18 rollup algebra. */
  def profileMerge(view: DataFrame, delta: DataFrame): DataFrame =
    view.unionByName(delta).groupBy("col_name")
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_null")).as("n_null"),
           expr("hll_union_agg(sk)").as("sk"))
}
