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
    * `events.ts` has shipped in two physical encodings across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark 4's vectorized
    * reader rejects outright — read as a long via legacy nanosAsLong and
    * rebuilt below) and plain TIMESTAMP(MICROS) isAdjustedToUTC=false
    * (which Spark reads as TIMESTAMP_NTZ). `rebuildEventTs` normalizes
    * either to session-zone TimestampType at microsecond precision so
    * every downstream operator sees one type regardless of generation.
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

  /** Run `body` with `confs` applied, restoring the previous session
    * values afterwards — safe only when `body` EXECUTES the plan it
    * builds (lazy plans would otherwise run after the restore). Shared
    * by the raster relaxations (ops.WroQueries), the dedup closure loop
    * (llm.Dedup) and layout maintenance (ops.Layout).
    *
    * Confs are SESSION-GLOBAL: a plan materialized CONCURRENTLY on the
    * same SparkSession while `body` runs (another driver thread, a
    * streaming micro-batch) would be planned under these confs too —
    * results stay correct, but a data-scale job could plan at the
    * loop's tiny parallelism. The declared-query and harness paths
    * materialize sequentially, so this is a documented boundary, not a
    * live hazard; a caller mixing an iterative loop with concurrent
    * same-session jobs should clone a session for the loop instead. */
  private[graft] def withConfs[T](spark: SparkSession,
                                  confs: Map[String, String])(body: => T): T = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Conditional scan-spread (optimization guide §2.5: "input skew — one
    * huge unsplittable file … repartition immediately after the read"):
    * hash-repartition `df` by `key` to the session's default parallelism
    * IFF its planned parallelism is below that. Compute-heavy per-row
    * derivations (shingling, gram explosion, hashed-feature folds,
    * multi-distinct Expand) otherwise run at the SCAN's split count —
    * the fixture tables are single-row-group parquet, so that is 2-6
    * tasks regardless of cores, and any production table arriving as a
    * few unsplittable files hits the same wall. At scale the condition
    * is a structural no-op (a large table has orders of magnitude more
    * splits than cores), so this is data-adaptive, never a local[32]
    * constant. The exchange moves the scan projection once, BEFORE the
    * k-times-larger derived stream exists; the EXPLICIT partition count
    * keeps AQE from byte-coalescing the small-bytes/heavy-compute stage
    * back to one task (the d24_triangles lesson), and hashing on a real
    * key keeps the assignment deterministic under task retry (guide
    * §2.5 rand-repartition caveat).
    *
    * SAFE ON ANY FRAME: the parallelism probe plans the frame, and on a
    * frame containing its own shuffle that planning would materialize
    * query stages under AQE — running the upstream jobs once EXTRA just
    * to be counted (stage reuse is per-QueryExecution, so the probe's
    * work would NOT be shared with the real run). Frames that are not
    * scan-level (anything beyond scans / local or checkpointed
    * relations / projections / filters / unions / aliases) are
    * therefore returned unchanged: their parallelism already comes
    * from an exchange, the very thing this helper substitutes for. */
  private[graft] def spreadScan(df: DataFrame, key: org.apache.spark.sql.Column)
      : DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanLevel(p: LogicalPlan): Boolean = p match {
      case _: Project | _: Filter | _: Union | _: SubqueryAlias =>
        p.children.forall(scanLevel)
      case leaf if leaf.children.isEmpty => true
      case _ => false
    }
    if (!scanLevel(df.queryExecution.analyzed)) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
    }
  }

  /** Normalize the `ts` column to microsecond TimestampType — shared by
    * the batch reader above and streaming file sources (the rebuild must
    * be identical or batch-equivalence checks drift). Long = legacy
    * nanos-as-long (FLOOR division to us, not `div` truncation: DuckDB's
    * epoch_us() on TIMESTAMP_NS floors, and the two differ by 1us on
    * pre-epoch nanos). TIMESTAMP_NTZ = the micros generation; the cast to
    * session-zone timestamp is wall-clock identity under the UTC session
    * every graft main pins. */
  def rebuildEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
