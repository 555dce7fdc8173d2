package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range-list algebra: building and (de)coding the half-open
  * min-inclusive/max-exclusive range lists the reference keeps in
  * `InputRanges` (WROS/Weighted Raster Overlay Service.pyt:1119-1138,
  * pyt:929-936). All functions are pure Column expressions (array
  * built-ins -> codegen, no UDFs).
  */
object RangeCodec {

  /** createInputRangesForRemap (pyt:1119-1138): a sorted list of distinct
    * values v1..vn becomes contiguous half-open pairs
    * [v1,v2),[v2,v3),...,[vn,vn+1) — the reference doubles the list, sorts,
    * drops one min and appends max+1; net effect is exactly this.
    * Input: array<double> (need not be sorted/distinct). Output:
    * array<struct<lo:double, hi:double>>. */
  def valuesToRanges(values: Column): Column = {
    val v = array_sort(array_distinct(values))
    // try_element_at: past-the-end must yield null for the coalesce
    // fallback (plain element_at THROWS under Spark 4's ANSI default)
    transform(v, (x, i) => struct(
      x.as("lo"),
      coalesce(try_element_at(v, i + 2), x + lit(1.0)).as("hi")))
  }

  /** Classify-colorizer variant (pyt:977-999): bounds = min :: breaks;
    * pairs [b_i, b_{i+1}) with the final upper bound bumped +1
    * (max-bump, §1.4(2) of SURVEY.md). Input `bounds`: array<double>
    * already ordered (min, break1, ..., breakK). */
  def boundsToRanges(bounds: Column): Column = {
    val n = size(bounds)
    val ranges = transform(slice(bounds, lit(1), n - 1), (x, i) => struct(
      x.as("lo"),
      when(i === n - 2, element_at(bounds, n) + lit(1.0))
        .otherwise(element_at(bounds, i + 2)).as("hi")))
    // degenerate inputs (empty / single bound) yield an empty range list
    // instead of a runtime error (negative slice length); array() is
    // ARRAY<NULL>, the one array type ANSI lets us cast to the struct form
    when(n >= 2, ranges)
      .otherwise(array().cast("array<struct<lo:double,hi:double>>"))
  }

  /** Flatten array<struct<lo,hi>> to the stored CSV form
    * "lo1,hi1,lo2,hi2,..." (pyt:929-936). Doubles are rendered with
    * Java/Spark double-to-string (e.g. "20.0"), matching Python str(float)
    * for the simple magnitudes the catalog holds. */
  def encodeRanges(ranges: Column): Column =
    array_join(flatten(transform(ranges,
      r => array(r("lo").cast(StringType), r("hi").cast(StringType)))), ",")

  /** Parse "lo1,hi1,lo2,hi2,..." back to array<struct<lo,hi>>
    * (pyt:163-177: split + positional pairing). */
  def decodeRanges(csv: Column): Column = {
    // try_cast: non-numeric/empty tokens become null instead of an ANSI
    // cast error (split("") yields [""])
    val nums = transform(split(csv, ","), s => s.try_cast(DoubleType))
    // Column `/` is double division; sequence() needs an integral stop
    val k = (size(nums) / 2).cast(IntegerType)
    val pairs = transform(sequence(lit(0), k - 1), i => struct(
      element_at(nums, i * 2 + 1).as("lo"),
      element_at(nums, i * 2 + 2).as("hi")))
    // empty / null / odd-token CSV yields the complete pairs only (empty
    // array for ""), never an out-of-bounds element_at: split("") gives
    // [""], whose cast is null and size 1 -> k=0 -> sequence(0,-1) would
    // error, hence the guard.
    when(size(nums) >= 2, pairs)
      .otherwise(array().cast("array<struct<lo:double,hi:double>>"))
  }

  /** Contiguity check over array<struct<lo,hi>> (pyt:199-218):
    * every range[i].hi must equal range[i+1].lo. Returns boolean;
    * lists of fewer than two ranges are vacuously contiguous (the
    * unguarded slice would error on a negative length). */
  def isContiguous(ranges: Column): Column =
    when(size(ranges) < 2, lit(true)).otherwise(forall(
      zip_with(slice(ranges, lit(1), size(ranges) - 1),
               slice(ranges, lit(2), size(ranges) - 1),
               (a, b) => a("hi") === b("lo")),
      identity[Column]))
}
