package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) curve arithmetic — the multi-dimensional clustering
  * key behind SNK18's 2-D data skipping. Interleaving the bits of two
  * bounded integer coordinates gives a 1-D sort/partition key whose
  * prefix blocks are axis-aligned squares: partitioning a table on a
  * Z-value prefix therefore bounds EVERY coordinate's per-partition
  * min/max (side ≤ 2^(droppedBits/2)), so the manifest stats that
  * [[graft.catalog.SnapshotTable.pruneEntries]] records at commit time
  * prune a predicate on ANY of the interleaved dimensions — where a
  * 1-D range layout prunes only its own sort dimension and must scan
  * everything for a query on the other axis. This is the Delta
  * OPTIMIZE ZORDER BY idea re-expressed through the snapshot
  * protocol's existing stats machinery: no new read path, the curve
  * only changes WHICH rows share a partition.
  *
  * Everything is plain integer shift/mask arithmetic composed from
  * built-in column functions — codegen'd end to end, and exactly
  * replayable in ANSI SQL ([[zValueSql]] emits the same term sum for
  * the DuckDB oracle, so the bucket assignment itself is gated).
  *
  * Scale shape: the z-value is a per-row projection (no shuffle, no
  * UDF); the partition count is the caller's prefix choice (4^k blocks
  * for k kept bit-pairs per axis), fixed by data-model resolution, not
  * data volume — at 100 TB the same 2-bits-per-level law holds, only
  * file counts per block grow. */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative coordinates:
    * bit i of `y` lands at position 2i+1, bit i of `x` at position 2i
    * (x is the minor/fast axis). Total 2·bits result bits; callers
    * must ensure coordinates fit in `bits` (the 100×100 grid fits 7).
    * Unrolled shift/mask term sum — constant-folded per row by
    * whole-stage codegen, no loop state. */
  def zValue(y: Column, x: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zorder: bits=$bits out of range")
    (0 until bits).map { i =>
      (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)
  }

  /** The SAME interleave as [[zValue]], as an ANSI SQL expression over
    * column expressions `y` and `x` — division/modulo instead of
    * shift/mask so it runs verbatim in DuckDB. Kept textually adjacent
    * to the Column form so the two cannot drift apart silently. */
  def zValueSql(y: String, x: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"zorder: bits=$bits out of range")
    (0 until bits).map { i =>
      s"((($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
      s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)})"
    }.mkString("(", " + ", ")")
  }

  /** Z-block id: the z-value with `drop` low bits removed — each block
    * is an axis-aligned 2^ceil(drop/2) × 2^floor(drop/2) rectangle of
    * the coordinate grid (a square when `drop` is even). Partitioning
    * on the block id is what gives every block its bounded per-axis
    * min/max. */
  def zBlock(y: Column, x: Column, bits: Int, drop: Int): Column =
    shiftright(zValue(y, x, bits).cast("long"), drop)

  /** SQL twin of [[zBlock]] (integer division by 2^drop). */
  def zBlockSql(y: String, x: String, bits: Int, drop: Int): String =
    s"(${zValueSql(y, x, bits)} // ${1L << drop})"
}
