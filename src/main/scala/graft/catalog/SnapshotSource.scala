package graft.catalog

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SQL-NATIVE access to snapshot tables: `graft-snapshot` registered
  * as a Spark data source, so the protocol's reads compose with the
  * DataFrameReader and plain SQL instead of requiring the
  * [[SnapshotTable]] API:
  * {{{
  *   spark.read.format("graft-snapshot").option("path", root).load()
  *   CREATE TEMPORARY VIEW t USING `graft-snapshot` OPTIONS (path '...')
  * }}}
  * Options: `path` (table root, required), `version` (pin a committed
  * version; default latest), `asOfTimestamp` (epoch millis —
  * [[SnapshotTable.versionAsOf]] resolution; mutually exclusive with
  * `version`), `table` (read one table of a [[SnapshotGroup]] at
  * `path` instead of a single snapshot table). The version resolves
  * ONCE, when the relation is created — a `CREATE TEMPORARY VIEW`
  * therefore pins the snapshot it saw at creation (snapshot-isolation
  * view semantics, the protocol's reader property); re-create the
  * view (or `load()` again) to follow new commits.
  *
  * The relation implements `PrunedFilteredScan`, so Catalyst hands it
  * the query's column set and conjunctive filters: supported
  * comparisons (`= < <= > >=` against literals, `And` flattened)
  * translate to [[SnapshotTable.Pred]]s and drive MANIFEST pruning —
  * entries and per-file lists the recorded stats provably exclude are
  * never listed, never planned, never scanned — before the surviving
  * files go through the ordinary vectorized parquet scan (which
  * additionally gets the same predicates pushed to its footers).
  * `unhandledFilters` returns EVERY filter, so Spark re-applies the
  * full predicate above the scan: manifest pruning stays a pure
  * optimization and unsupported/partial translations (null checks,
  * IN, OR, non-literals) are simply not used for skipping. The scan
  * is handed back as `InternalRow`s (`needConversion = false`), so
  * the inner parquet read keeps whole-stage codegen.
  *
  * This is the DSv1 stable API (`RelationProvider`) by choice: the
  * relation's job is metadata pruning + delegation to the built-in
  * parquet source, exactly the granularity `PrunedFilteredScan`
  * expresses; a DSv2 `Table` would re-implement the file scan for no
  * added pushdown. Writes stay on the commit API — they need
  * `expectedBase`/tags/evolution flags that a blind `save()` cannot
  * express safely. */
class SnapshotSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot: the 'path' option (table root) is required"))
    val spark = sqlContext.sparkSession
    require(!(parameters.contains("version") &&
        parameters.contains("asOfTimestamp")),
      "graft-snapshot: 'version' and 'asOfTimestamp' are mutually exclusive")
    // `table` selects a table of a SnapshotGroup at `path`; absent, the
    // path is a single SnapshotTable. Group reads carry no skipping
    // stats by the recorded scope decision (group tables are small
    // artifacts), so the group relation prunes columns only.
    parameters.get("table") match {
      case Some(t) =>
        val version = parameters.get("version").map(_.toLong)
          .orElse(parameters.get("asOfTimestamp").map(ts =>
            SnapshotGroup.versionAsOf(spark, root, ts.toLong)))
          .getOrElse {
            val v = SnapshotGroup.currentVersion(spark, root)
            require(v > 0,
              s"graft-snapshot: group $root has no committed version")
            v
          }
        new SnapshotGroupRelation(sqlContext, root, t, version)
      case None =>
        val version = parameters.get("version").map(_.toLong)
          .orElse(parameters.get("asOfTimestamp").map(ts =>
            SnapshotTable.versionAsOf(spark, root, ts.toLong)))
          .getOrElse {
            val v = SnapshotTable.currentVersion(spark, root)
            require(v > 0, s"graft-snapshot: $root has no committed version")
            v
          }
        new SnapshotRelation(sqlContext, root, version)
    }
  }
}

object SnapshotSource {
  /** Last buildScan's manifest-pruning outcome — (entries planned,
    * files planned; -1 = some entry scans whole dirs). Instrumentation
    * for the gate/specs, same role as
    * [[SnapshotTable.manifestBodyReads]]; production code never reads
    * it. */
  private[graft] val lastPlanned =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long)]((0L, 0L))
}

/** One table of a [[SnapshotGroup]] through the data source: column
  * pruning only (group tables record no skipping stats — the scope
  * decision on [[SnapshotGroup]]); rows hand back as InternalRows
  * from the delegated parquet scan, filters re-applied by Spark. */
private[catalog] class SnapshotGroupRelation(val sqlContext: SQLContext,
    root: String, table: String, version: Long)
    extends BaseRelation with PrunedScan {

  private val spark = sqlContext.sparkSession
  // val, not def: the relation pins `version`, so the one resolved
  // read (one manifest body) serves schema and every buildScan
  private val df = SnapshotGroup.read(spark, root, table, version)

  override val schema: StructType = df.schema

  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String]): RDD[Row] = {
    import org.apache.spark.sql.functions.col
    val base = df
    val projected =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

private[catalog] class SnapshotRelation(val sqlContext: SQLContext,
    root: String, version: Long)
    extends BaseRelation with PrunedFilteredScan {

  private val spark = sqlContext.sparkSession
  private val m = SnapshotTable.manifestAt(spark, root, version)

  override val schema: StructType = StructType.fromDDL(m.schemaDdl)

  // rows are handed back as InternalRow from the delegated parquet
  // scan — no Row conversion layer, codegen preserved
  override def needConversion: Boolean = false

  // every filter is re-applied by Spark above this scan; translation
  // below is only ever used to SKIP provably-empty entries/files
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  /** The conjunctive, literal-comparison fragment of `filters` as
    * pruning preds — exactly the shape [[SnapshotTable.Pred]] decides
    * from interval bounds. Anything else contributes nothing (sound:
    * pruning keeps the entry). */
  private def toPreds(filters: Array[Filter]): Seq[SnapshotTable.Pred] =
    filters.toSeq.flatMap {
      case And(l, r) => toPreds(Array(l, r))
      case EqualTo(a, v) if lit(v) => Seq(SnapshotTable.Pred(a, "=", v))
      case GreaterThan(a, v) if lit(v) => Seq(SnapshotTable.Pred(a, ">", v))
      case GreaterThanOrEqual(a, v) if lit(v) =>
        Seq(SnapshotTable.Pred(a, ">=", v))
      case LessThan(a, v) if lit(v) => Seq(SnapshotTable.Pred(a, "<", v))
      case LessThanOrEqual(a, v) if lit(v) =>
        Seq(SnapshotTable.Pred(a, "<=", v))
      case _ => Nil
    }

  private def lit(v: Any): Boolean = v match {
    case null => false
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double |
         _: java.math.BigDecimal | _: scala.math.BigDecimal | _: String =>
      true
    case _ => false
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val preds = toPreds(filters)
    val sel = SnapshotTable.pruneFiles(m, preds)
    SnapshotSource.lastPlanned.set((sel.length.toLong,
      if (sel.forall(_._2.isDefined)) sel.flatMap(_._2.map(_.length.toLong)).sum
      else -1L))
    val base = SnapshotTable.readPruned(spark, root, m, sel, preds)
    import org.apache.spark.sql.functions.col
    val projected =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(col).toIndexedSeq: _*)
    // needConversion = false: hand back the InternalRow RDD
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
