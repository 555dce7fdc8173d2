package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator (SURVEY.md §2.B) registers a named query
  * here; SQL-expressible ones also register a DuckDB oracle. */
object SparkEntry {
  /** Flagship query (weighted raster overlay, SURVEY §7.2) on sf=0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.WroQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.WroQueries.queries ++ ops.RelQueries.queries ++
      ops.LlmQueries.queries ++ ops.CatalogQueries.queries ++
      ops.StreamQueries.queries ++ ops.TsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.WroQueries.oracle ++ ops.RelQueries.oracle ++
      ops.LlmQueries.oracle ++ ops.CatalogQueries.oracle ++
      ops.StreamQueries.oracle ++ ops.TsQueries.oracle

  /** Headline subset timed by Bench (one per operator family — timing
    * every declared query would measure count, not the engine). */
  def headline: Seq[String] = Seq(
    "wro_overlay_flagship", "wro_classify_equal_interval",
    "j2_shuffle_join", "a2_groupby", "w1_rank", "o2_topk", "f3_datetime",
    "q3_shipping_priority")
}
