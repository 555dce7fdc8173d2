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

  /** Two-pass heavy hitters over a whitespace-tokenized text column:
    * tokens with exact count strictly above n/(k+1). Pass 1 is the
    * Misra-Gries sketch (map-side partial summaries merged into ≤ k
    * candidates); pass 2 re-counts ONLY the broadcast candidates and
    * applies the threshold as integer arithmetic (cnt·(k+1) > n). */
  def heavyHitters(docs: DataFrame, text: Column, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs.select(explode(split(text, " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
    val cand = toks.select(col("tok")).as[String]
      .select(new MisraGries(k).toColumn)
      .toDF("m")
      .select(explode(map_keys(col("m"))).as("tok"))
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(cand), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("tok"), col("cnt"))
  }
}
