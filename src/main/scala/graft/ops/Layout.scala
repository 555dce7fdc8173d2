package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering.
  *
  * Why it matters at 100 TB: a table range-partitioned and sorted on ONE
  * key prunes scans only on that key. Writing the table ordered by the
  * Z-interleave of two keys gives every file a small min/max rectangle
  * in BOTH dimensions, so a predicate on either key (or a 2D box) skips
  * most files via ordinary parquet/ORC min-max stats — no index
  * structure, no engine extension, just `repartitionByRange(zkey) +
  * sortWithinPartitions(zkey)` at write time. The interleave itself is
  * pure bit arithmetic — codegen'd, shuffle-free, and exactly
  * reproducible in any engine (the oracle recomputes it in SQL).
  */
object Layout {

  /** Morton-interleave two 16-bit keys into a 32-bit Z-value: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Inputs are masked
    * to 16 bits (the caller picks the resolution; 16 bits per dimension
    * addresses a 65536x65536 grid, plenty for file-level clustering). Pure
    * `shiftright/and/shiftleft/or` fold — stays in WholeStageCodegen. */
  def zorder16(x: Column, y: Column): Column = {
    val xm = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ym = y.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Inverse of [[zorder16]]: extract the (x, y) pair back out of a
    * Z-value — the round-trip property the spec checks. */
  def dezorder16(z: Column): (Column, Column) = {
    def gather(offset: Int): Column =
      (0 until 16).map { i =>
        shiftleft(shiftright(z.cast("long"), 2 * i + offset)
          .bitwiseAND(lit(1L)), i)
      }.reduce(_ bitwiseOR _)
    (gather(0), gather(1))
  }

  /** Cluster `df` for 2D pruning: range-partition then sort by the
    * Z-value of (x, y). Files written from the result carry tight
    * min/max rectangles in both dimensions. */
  def zorderBy(df: DataFrame, x: Column, y: Column,
               partitions: Int): DataFrame = {
    val keyed = df.withColumn("__z", zorder16(x, y))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Table MAINTENANCE: compaction × Z-order in ONE rewrite — the op a
    * 100-TB deployment schedules nightly. Streaming/merge sinks leave N
    * small fragments (the snk4 pathology: per-file overhead dominates
    * scans); a plain compaction fixes file count but writes an
    * arbitrary row layout. This reads the fragmented table once and
    * rewrites it as `files` Z-ordered parquet files, so the SAME pass
    * that pays the rewrite also buys two-dimensional min/max pruning
    * on (x, y) — file count AND per-file Morton-rectangle tightness
    * are spec-pinned (LayoutSpec); content invariance is the
    * snk8_compact_zorder gate. One shuffle (the Z range partitioner);
    * the sort is partition-local. */
  def compactZorder(spark: org.apache.spark.sql.SparkSession,
                    srcPath: String, dstPath: String,
                    x: Column, y: Column, files: Int): Unit =
    zorderBy(spark.read.parquet(srcPath), x, y, files)
      .write.mode("overwrite").parquet(dstPath)
}
