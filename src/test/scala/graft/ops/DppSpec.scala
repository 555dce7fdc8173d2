package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Scale evidence for DYNAMIC partition pruning: `j16_dpp_join` joins a
  * partitioned fact with a 2-row dim on the partition column — no
  * literal partition predicate exists anywhere in the query, so any
  * pruning must come from Catalyst injecting the dim's keys at runtime
  * (DynamicPruningExpression). At 100 TB this is the difference between
  * scanning every date/type directory of a star-schema fact and
  * scanning the ones the dim actually selects. SNK2+ pins the static
  * sibling (literal isin predicate → partition filter). */
class DppSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("j16_dpp_join: the fact scan carries a dynamic partition filter " +
       "and reads exactly the dim's 2 of 5 directories") {
    val df = graft.SparkEntry.queries("j16_dpp_join")(
      spark, "/root/testdata/sf0.01")
    // collect() executes THIS QueryExecution — count() would build and
    // run a different one, leaving these scan instances' metrics empty
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: FileSourceScanExec if f.partitionFilters.nonEmpty => f
    }
    assert(scans.nonEmpty, "no partition-filtered scan in the plan")
    val dynamic = scans.filter(_.partitionFilters.exists(
      _.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])))
    assert(dynamic.nonEmpty,
      "the partition filter is not DYNAMIC — DPP did not fire " +
        "(a static literal filter would not prove the join-driven path)")
    dynamic.foreach { f =>
      // selectedPartitions is the STATIC selection (all 5 type dirs —
      // no literal predicate exists); the runtime-pruned count only
      // shows in the scan's execution metric
      assert(f.selectedPartitions.partitionCount == 5,
        "fixture drift: expected 5 static event_type directories")
      assert(f.metrics("numPartitions").value == 2,
        s"scan read ${f.metrics("numPartitions").value} partition " +
          "directories at runtime, expected exactly the dim's 2 of 5")
    }
  }
}
