package graft.classify

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A10: the reference's remap-range merge (createInputRangesForRemap,
  * WROS/Weighted Raster Overlay Service.pyt:1119-1138) as a distributed
  * typed `Aggregator`.
  *
  * The reference concatenates two per-layer bound lists, sorts, removes the
  * first (minimum) element, bumps the last by +1 (§1.4 max-bump) and
  * comma-joins. Here the input is the un-ordered multiset of bounds —
  * unique-value rasters feed each value TWICE (a degenerate (v,v) pair,
  * pyt:1061-1062), so the buffer must keep duplicates; a set would change
  * the output arity.
  *
  * Buffer is the growing multiset (bounds are catalog-sized — the reference
  * caps unique values at 25, pyt:1090 — so an unsorted Seq merged at finish
  * beats maintaining sort order per row). Fewer than two bounds is the
  * reference's error path; we finish to the empty string instead of
  * throwing inside an aggregate.
  */
case class RangeBuf(vs: List[Double])

class RangeMergeAgg extends Aggregator[Double, RangeBuf, String] {
  def zero: RangeBuf = RangeBuf(Nil)
  def reduce(b: RangeBuf, a: Double): RangeBuf = RangeBuf(a :: b.vs)
  def merge(b1: RangeBuf, b2: RangeBuf): RangeBuf = RangeBuf(b1.vs ::: b2.vs)
  def finish(b: RangeBuf): String = {
    val s = b.vs.sorted
    if (s.size < 2) ""
    else (s.tail :+ (s.last + 1.0)).mkString(",")
  }
  def bufferEncoder: Encoder[RangeBuf] = Encoders.product[RangeBuf]
  def outputEncoder: Encoder[String] = Encoders.STRING
}
