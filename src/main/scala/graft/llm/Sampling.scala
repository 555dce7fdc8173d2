package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction.
  *
  * Training pipelines re-weight sources by sampling each at its own
  * rate; the selection must be a pure function of the row (reproducible
  * across runs, engines, and cluster sizes — never `rand()`), and at
  * 100 TB it must be a map-side filter with no shuffle.
  */
object Sampling {

  /** Keep a row iff the md5 of its id falls below the stratum's
    * threshold, expressed as a 4-hex-digit prefix: rate k/65536 maps to
    * the threshold `%04x`-formatted k, and a lexicographic compare of
    * the 32-char md5 hex against that prefix keeps exactly the ids whose
    * leading 16 hash bits are < k. md5 and byte-wise string order are
    * engine-portable, so an oracle can reproduce the exact row set —
    * unlike `TABLESAMPLE`/`rand(seed)`, which are engine-private.
    *
    * Rates are quantized to 1/65536 ≈ 0.0015%; strata absent from the
    * map fall back to `defaultRate`. Plan shape: a single codegen'd
    * filter over the scan — no shuffle, no state, trivially parallel.
    *
    * The per-stratum conditions are mutually exclusive by construction
    * (string equality against the Map's distinct keys), so the chain
    * order cannot change which rows survive; entries are still folded in
    * sorted-key order so the PLAN is byte-identical across runs and JVMs
    * (Map iteration order is unspecified), keeping plan caching and
    * canonicalization stable. */
  def stratified(df: DataFrame, id: Column, stratum: Column,
                 rates: Map[String, Double],
                 defaultRate: Double = 0.0): DataFrame = {
    def hex4(rate: Double): String = {
      val k = math.round(rate * 65536.0).toInt.max(0).min(65536)
      if (k == 65536) "g" else f"$k%04x" // 'g' > any hex char: keep all
    }
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(hex4(defaultRate))) {
        case (acc, (s, r)) => when(stratum === s, lit(hex4(r))).otherwise(acc)
      }
    df.filter(md5(id.cast("string")) < threshold)
  }
}
