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
  /** Load a driver fixture table (TESTDATA.md) from a scale-factor dir. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
