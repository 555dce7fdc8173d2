import org.apache.spark.sql.{DataFrame, SparkSession}

/** graft — a Spark-native (Scala) analytics engine with the query and
  * data-processing capabilities of Esri/weighted-raster-overlay-service-toolbox
  * (reference, read-only at /root/reference), extended with the operator
  * surface a 100 TB training-data pipeline needs (dedup, similarity search,
  * text analysis, streaming).
  *
  * Design: declarative DataFrame/Dataset plans that Catalyst can optimize
  * (pushdown, pruning, broadcast, AQE); custom Catalyst expressions only
  * where built-ins genuinely can't express the semantics (RFC-4180 decode).
  */
package object graft {
  /** Load a driver fixture table (TESTDATA.md) from a scale-factor dir.
    *
    * `events.ts` is physically INT64 TIMESTAMP(NANOS), which Spark 4's
    * vectorized reader rejects outright; read it as a long (legacy
    * nanosAsLong) and rebuild a proper TimestampType column at microsecond
    * precision (integer arithmetic — double division would lose precision
    * above 2^53 ns). FLOOR division, not `div` truncation: DuckDB's
    * epoch_us() on TIMESTAMP_NS floors, and the two differ by 1us on
    * pre-epoch nanos.
    *
    * The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (all graft mains and the
    * test harness do) — setting it here per-read would mutate session-global
    * state at plan-build time, racy under concurrent plan construction. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      rebuildEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Rebuild the nanos-as-long `ts` column as a microsecond TimestampType —
    * shared by the batch reader above and streaming file sources (the
    * rebuild must be identical or batch-equivalence checks drift). */
  def rebuildEventTs(df: DataFrame): DataFrame =
    df.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
}
