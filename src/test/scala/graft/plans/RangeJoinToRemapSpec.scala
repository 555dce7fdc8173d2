package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.functions._

/** The literal-range-join → RangeRemap optimizer rule: fires on the
  * provable pattern, keeps results identical, and declines anything it
  * cannot prove safe. (The test session installs GraftExtensions.) */
class RangeJoinToRemapSpec extends SparkSpec {

  private def ranges = {
    import spark.implicits._
    Seq((1.0, 10.0, 1), (10.0, 20.0, 5), (20.0, 31.0, 9))
      .toDF("lo", "hi", "out")
  }

  private def facts = {
    import spark.implicits._
    Seq(0L -> 0.5, 1L -> 1.0, 2L -> 9.999, 3L -> 10.0, 4L -> 25.0,
        5L -> 31.0, 6L -> 42.0, 7L -> Double.NaN)
      .toDF("id", "v")
  }

  private def rangeJoin(r: org.apache.spark.sql.DataFrame) = {
    val f = facts // bind once: each `facts` call mints fresh expr ids
    f.join(r, f("v") >= r("lo") && f("v") < r("hi"))
      .select(col("id"), col("out"))
  }

  test("rewrites the contiguous literal range join to a join-free plan") {
    // non-local fact side so ConvertToLocalRelation can't fold the result
    // away before we can observe the rewritten plan
    val f = spark.range(0, 8).select(col("id"),
      when(col("id") === 7, lit(Double.NaN))
        .otherwise(col("id") * lit(6.0)).as("v")) // 0,6,12,18,24,30,36,NaN
    val r = ranges
    val q = f.join(r, f("v") >= r("lo") && f("v") < r("hi"))
      .select(col("id"), col("out"))
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.isEmpty, "expected the join to be optimized away")
    assert(q.queryExecution.optimizedPlan.toString.contains("range_remap"))
    val got = q.collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    // half-open semantics: 0 below the first bound, 36 past the final
    // (exclusive) bound, NaN matches nothing
    assert(got == Set((1L, 1), (2L, 5), (3L, 5), (4L, 9), (5L, 9)))
  }

  test("fully-literal inputs fold to a LocalRelation through the rewrite") {
    val q = rangeJoin(ranges)
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.isEmpty, "expected the join to be optimized away")
    val got = q.collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    // 0.5 and 42.0 out of range, 31.0 at the final (exclusive) bound,
    // NaN matches nothing; 10.0 lands in [10,20)
    assert(got == Set((1L, 1), (2L, 1), (3L, 5), (4L, 9)))
  }

  test("declines non-contiguous ranges and keeps the join") {
    import spark.implicits._
    val gappy = Seq((1.0, 10.0, 1), (12.0, 20.0, 5)).toDF("lo", "hi", "out")
    val q = rangeJoin(gappy)
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.nonEmpty, "a gapped range table must not be rewritten")
    // 10.0 falls in the [10,12) gap; 25.0 is past [12,20)
    assert(q.collect().map(x => (x.getLong(0), x.getInt(1))).toSet ==
      Set((1L, 1), (2L, 1)))
  }

  test("fires through a non-pushable filter between project and join") {
    // non-local fact side so the rewritten result can't fold away before
    // the plan is observable
    val f = spark.range(0, 6).select(col("id"),
      (col("id") * lit(6.0)).as("v")) // 0,6,12,18,24,30
    val r = ranges
    // a non-deterministic predicate is the filter shape that actually
    // survives above the join (deterministic single-side predicates are
    // pushed below it by PushDownPredicates before this rule runs)
    val q = f.join(r, f("v") >= r("lo") && f("v") < r("hi"))
      .filter(rand(42) >= -1.0)
      .select(col("id"), col("out"))
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.isEmpty, "expected the rewrite to fire through the filter")
    assert(q.queryExecution.optimizedPlan.toString.contains("range_remap"))
    val got = q.collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    // 0 below the first bound; 6→1, 12→5, 18→5, 24→9, 30→9
    assert(got == Set((1L, 1), (2L, 5), (3L, 5), (4L, 9), (5L, 9)))
  }

  test("declines when the interposed filter references a bound column") {
    val f = facts
    val r = ranges
    val q = f.join(r, f("v") >= r("lo") && f("v") < r("hi"))
      .filter(col("lo") + rand(1) >= 0.0) // non-pushable AND reads `lo`
      .select(col("id"), col("out"))
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.nonEmpty, "a filter on a bound column must block the rewrite")
    assert(q.count() == 4)
  }

  test("declines when the bound columns themselves are selected") {
    val f = facts
    val r = ranges
    val q = f.join(r, f("v") >= r("lo") && f("v") < r("hi"))
      .select(col("id"), col("out"), col("lo"))
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.nonEmpty)
    assert(q.count() == 4)
  }

  test("fires on the declared j6_range_autorewrite gate query") {
    val q = graft.ops.RelQueries.j6RangeAutoRewrite(
      spark, "/root/testdata/sf0.001")
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.isEmpty, "the declared query must plan join-free")
    assert(q.queryExecution.optimizedPlan.toString.contains("range_remap"))
    assert(q.count() > 0)
  }

  test("rewritten plan equals the join on a dense value sweep") {
    import spark.implicits._
    val vs = (0 to 640).map(i => i / 20.0)  // 0.00 .. 32.00 step 0.05
    val dense = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val r = ranges
    val viaRule = dense.join(r,
        dense("v") >= r("lo") && dense("v") < r("hi"))
      .select(col("id"), col("out"))
      .collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    // reference: the same join with the rule unable to fire (lo selected)
    val viaJoin = dense.join(r,
        dense("v") >= r("lo") && dense("v") < r("hi"))
      .select(col("id"), col("out"), col("lo"))
      .collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(viaRule == viaJoin)
  }
}
