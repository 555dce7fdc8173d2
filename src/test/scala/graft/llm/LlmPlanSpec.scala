package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Plan-level evidence for the SCALE.md claims of the newest LLM
  * operators: what the shuffles CARRY matters more than how many there
  * are — a corpus-text shuffle is the 100 TB killer, id/token shuffles
  * are fine. */
class LlmPlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] =
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }

  private def corpus = {
    import spark.implicits._
    (0L until 200L)
      .map(i => (i, s"w$i common tokens here plus unique w${i * 7} tail"))
      .toDF("doc_id", "text")
  }

  test("redactPii plans map-only: zero shuffle exchanges") {
    val df = TextAnalysis.redactPii(corpus, col("doc_id"), col("text"))
    df.count()
    assert(shuffles(df).isEmpty,
      s"redaction must not shuffle:\n${df.queryExecution.executedPlan}")
  }

  test("decontaminate never shuffles corpus text or shingles") {
    import spark.implicits._
    val bench = Seq(Tuple1("common tokens here")).toDF("text")
    val df = Dedup.decontaminate(corpus, col("doc_id"), col("text"),
      bench, col("text"), n = 3)
    df.count()
    // the benchmark's own shingle distinct shuffles [sh] — benchmark-
    // sized, fine. The claims under test: corpus TEXT never shuffles,
    // and corpus SHINGLE rows (doc_id + sh) never shuffle.
    val wide = shuffles(df).filter { s =>
      val names = s.output.map(_.name.toLowerCase)
      names.contains("text") ||
        (names.contains("sh") && names.contains("doc_id"))
    }
    assert(wide.isEmpty,
      s"a shuffle carries corpus text/shingles:\n${wide.mkString("\n")}")
    // the benchmark shingle set must reach the flag join as a broadcast
    assert(df.queryExecution.executedPlan.toString
             .contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n${df.queryExecution.executedPlan}")
  }

  test("repetition never shuffles corpus text") {
    val df = TextAnalysis.repetition(corpus, col("doc_id"), col("text"))
    df.count()
    val wide = shuffles(df).filter(
      _.output.map(_.name.toLowerCase).contains("text"))
    assert(wide.isEmpty,
      s"a shuffle carries corpus text:\n${wide.mkString("\n")}")
  }

  test("vocabOov: vocab rides a broadcast, corpus text never shuffles") {
    val df = TextAnalysis.vocabOov(corpus, col("doc_id"), col("text"), 8)
    df.count()
    val wide = shuffles(df).filter(
      _.output.map(_.name.toLowerCase).contains("text"))
    assert(wide.isEmpty,
      s"a shuffle carries corpus text:\n${wide.mkString("\n")}")
    assert(df.queryExecution.executedPlan.toString
             .contains("BroadcastHashJoin"),
      s"vocab side not broadcast:\n${df.queryExecution.executedPlan}")
  }

  test("ivfPqTopK: codebooks broadcast, no raw-vector cartesian except " +
       "against broadcast codebooks, no corpus-sized build side") {
    import spark.implicits._
    val vecs = (0L until 120L)
      .map(i => (i, Seq.tabulate(16)(d => (((i * 31 + d * 17) % 13) - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val df = Pq.ivfPqTopK(vecs.filter(col("vec_id") =!= 0),
      col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") === 0), col("embedding"),
      k = 3, kc = 4, ksub = 4, m = 4, nprobe = 2)
    df.count()
    val plan = df.queryExecution.executedPlan
    // every nested-loop join (the corpus×codebook scoring legs) must
    // have a BROADCAST build side — a shuffled all-pairs join would be
    // the 100 TB killer
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val nested = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(nested.isEmpty,
      s"cartesian product (non-broadcast all-pairs) in plan:\n$plan")
    val bnl = collectWithSubqueries(plan) {
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.nonEmpty, s"expected broadcast codebook joins in:\n$plan")
  }

  test("ivfTopK assignment prefilter joins on the coarse bucket, " +
       "broadcast-built") {
    import spark.implicits._
    val vecs = (1L until 120L)
      .map(i => (i, Seq.tabulate(8)(d => (((i * 31 + d * 17) % 13) - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 1)
    val df = Similarity.ivfTopK(vecs.filter(col("vec_id") =!= 1),
      col("vec_id"), col("embedding"), q, col("embedding"),
      k = 5, stride = 7, nprobe = 2, coarseBits = 3)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the in-bucket candidate join is an equi-join on (bucket = cbucket)
    // with the centroid side broadcast — NOT a corpus×codebook cross join
    assert(plan.contains("BroadcastHashJoin") &&
           plan.toLowerCase.contains("cbucket"),
      s"expected broadcast bucket equi-join in:\n$plan")
  }
}
