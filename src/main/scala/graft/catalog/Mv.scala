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
}
