package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ZOrder]]: the Column interleave matches a bit-twiddling reference
  * implementation, blocks are the axis-aligned rectangles the skipping
  * argument relies on, and the curve is a bijection on the grid. */
class ZOrderSpec extends SparkSpec {

  private def refZ(y: Long, x: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((y >> i) & 1L) << (2 * i + 1)) | (((x >> i) & 1L) << (2 * i))
    }.sum

  test("zValue matches the reference interleave over the full 32x32 " +
       "grid and is a bijection") {
    import spark.implicits._
    val grid = for (y <- 0L until 32L; x <- 0L until 32L) yield (y, x)
    val got = grid.toDF("y", "x")
      .select(col("y"), col("x"),
        ZOrder.zValue(col("y"), col("x"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (y, x, z) =>
      assert(z == refZ(y, x, 5), s"($y,$x): $z != ${refZ(y, x, 5)}")
    }
    assert(got.map(_._3).distinct.length == 1024,
      "z must be a bijection on the grid")
    assert(got.map(_._3).min == 0L && got.map(_._3).max == 1023L)
  }

  test("zBlock partitions the grid into axis-aligned squares whose " +
       "side is 2^(drop/2) — the bound the per-entry stats inherit") {
    import spark.implicits._
    val grid = for (y <- 0L until 128L; x <- 0L until 128L) yield (y, x)
    val spans = grid.toDF("y", "x")
      .select(col("y"), col("x"),
        ZOrder.zBlock(col("y"), col("x"), 7, 10).as("zb"))
      .groupBy("zb")
      .agg(count(lit(1)).as("n"),
        (max("y") - min("y")).as("ys"), (max("x") - min("x")).as("xs"))
      .collect()
    assert(spans.length == 16)
    spans.foreach { r =>
      assert(r.getLong(1) == 1024L, "each block holds 32x32 cells")
      assert(r.getLong(2) == 31L && r.getLong(3) == 31L,
        s"block ${r.getLong(0)} spans (${r.getLong(2)},${r.getLong(3)})" +
        " — not a 32x32 square")
    }
  }
}
