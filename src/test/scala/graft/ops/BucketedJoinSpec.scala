package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Scale evidence for the bucketing strategy SCALE.md prescribes for
  * repeated large×large joins: two tables bucketed on the join key
  * co-locate, so the sort-merge join runs with NO shuffle exchange —
  * the shuffle is paid once at write time, not per query. (At 100 TB
  * this is the difference between re-shuffling the fact table for every
  * join and reading pre-partitioned buckets.) */
class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def shufflesOf(df: org.apache.spark.sql.DataFrame) =
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    val broadcastOff =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force SMJ so the no-shuffle outcome is attributable to bucketing,
    // not to a broadcast of the small test tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_items")
    try {
      (1L to 1000L).map(i => (i, s"o$i")).toDF("order_id", "o_tag")
        .write.bucketBy(8, "order_id").sortBy("order_id")
        .saveAsTable("bkt_orders")
      (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("order_id", "i_tag")
        .write.bucketBy(8, "order_id").sortBy("order_id")
        .saveAsTable("bkt_items")

      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_items"), "order_id")
      assert(joined.count() == 3000)
      assert(shufflesOf(joined).isEmpty,
        s"expected bucket co-location to remove all shuffles, got:\n" +
          joined.queryExecution.executedPlan)

      // contrast: the same join over the same files read as plain
      // parquet (bucketing metadata lost) must shuffle both sides
      val loc = (n: String) => spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(n)).location.toString
      val flat = spark.read.parquet(loc("bkt_orders"))
        .join(spark.read.parquet(loc("bkt_items")), "order_id")
      assert(flat.count() == 3000)
      assert(shufflesOf(flat).nonEmpty,
        "plain parquet reads of the same data should have shuffled")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastOff)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_items")
    }
  }

  test("j11_bucketed_join (the declared query) plans with zero shuffles") {
    val broadcastOff =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // join on the bucket key AND the groupBy on the same key both ride
      // the bucket layout; the final top-10 is a TakeOrdered (no exchange)
      val df = RelQueries.j11BucketedJoin(spark, "/root/testdata/sf0.001")
      assert(df.count() == 10)
      assert(shufflesOf(df).isEmpty,
        s"expected the declared bucketed query to plan shuffle-free, got:\n" +
          df.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastOff)
    }
  }
}
