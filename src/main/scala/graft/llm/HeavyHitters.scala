package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequent-items (heavy hitters) — the 100 TB
  * alternative to a full token groupBy when only the head of the
  * distribution matters: a MERGEABLE Misra-Gries sketch of k counters
  * per partition, combined associatively (Agarwal et al.'s mergeable-
  * summaries result), carrying the classic guarantee that every token
  * with true count > n/(k+1) SURVIVES in the summary no matter the
  * arrival or merge order, with per-counter undercount ≤ n/(k+1).
  *
  * The summary itself is order-DEPENDENT (Spark's partial-agg order is
  * not deterministic), so the declared query uses the production
  * two-pass shape: sketch → broadcast the ≤ k candidates → exact
  * second-pass count over candidates only → keep true heavy hitters.
  * That output is deterministic and oracle-checkable, and the sketch's
  * guarantee is precisely what makes the two-pass complete (no true
  * heavy hitter can be missing from the candidate set). */
class MisraGries(k: Int)(implicit mapEnc: Encoder[Map[String, Long]])
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"need k >= 1, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(m: Map[String, Long], tok: String): Map[String, Long] =
    if (m.contains(tok)) m.updated(tok, m(tok) + 1L)
    else if (m.size < k) m.updated(tok, 1L)
    else // all counters decrement; zeros free their slots
      m.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else { // subtract the (k+1)-th largest count from everything
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  def finish(m: Map[String, Long]): Map[String, Long] = m
  def bufferEncoder: Encoder[Map[String, Long]] = mapEnc
  def outputEncoder: Encoder[Map[String, Long]] = mapEnc
}

object HeavyHitters {

  /** Token counter riding the sketch pass — a second typed Aggregator
    * in the SAME select, so the total n costs no extra corpus scan. */
  private object CountAgg extends Aggregator[String, Long, Long] {
    def zero: Long = 0L
    def reduce(n: Long, t: String): Long = n + 1
    def merge(a: Long, b: Long): Long = a + b
    def finish(n: Long): Long = n
    def bufferEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
  }

  /** Two-pass heavy hitters over a whitespace-tokenized text column:
    * tokens with exact count strictly above n/(k+1). Pass 1 is ONE
    * corpus scan computing the Misra-Gries sketch AND the total count
    * (two typed Aggregators in one aggregate); pass 2 re-counts ONLY
    * the broadcast candidates (n rides the broadcast row) and applies
    * the threshold as integer arithmetic (cnt·(k+1) > n). Exactly two
    * corpus scans — the floor for exact-count heavy hitters. */
  def heavyHitters(docs: DataFrame, text: Column, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.select(explode(split(text, " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
    val cand = toks.select(col("tok")).as[String]
      .select(new MisraGries(k).toColumn, CountAgg.toColumn)
      .toDF("m", "n")
      .select(explode(map_keys(col("m"))).as("tok"), col("n"))
    toks.join(broadcast(cand), "tok")
      .groupBy("tok", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("tok"), col("cnt"))
  }
}
