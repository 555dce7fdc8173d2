package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the GIS raster-algebra queries (focal/zonal
  * statistics, NEAREST resampling). The oracle gate proves fixture
  * equality; these prove the neighborhood/selection semantics on inputs
  * where each edge — grid corner, sparse NoData hole, center-sample
  * index — is load-bearing. */
class GisQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("focal: 3x3 contributions, corner clipping, NoData holes") {
    import spark.implicits._
    // sparse grid: two adjacent cells at the (0,0) corner + one isolated
    val g = Seq((0L, 0L, 1L), (0L, 1L, 2L), (5L, 5L, 100L))
      .toDF("r", "c", "cents")
    val got = WroQueries.focalFrom(g).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), (x.getLong(2), x.getLong(3))))
      .toMap
    // corner cell: itself + right neighbor (out-of-grid rows clipped)
    assert(got((0L, 0L)) == (3L, 2L))
    assert(got((0L, 1L)) == (3L, 2L))
    // one row below the pair: both contribute
    assert(got((1L, 0L)) == (3L, 2L) && got((1L, 1L)) == (3L, 2L))
    // (1,2) only sees (0,1)
    assert(got((1L, 2L)) == (2L, 1L))
    // the isolated cell radiates to exactly its 9-cell neighborhood
    assert(got((4L, 4L)) == (100L, 1L) && got((6L, 6L)) == (100L, 1L))
    assert(!got.contains(3L -> 5L) && !got.contains(7L -> 5L))
    // exact target census: the corner pair reaches {0,1}x{0,2} = 6
    // in-grid cells after clipping, the isolated cell reaches 9
    assert(got.size == 6 + 9)
  }

  test("zonal: zones partition the cells, aggregates are consistent") {
    val pc = WroQueries.perCell(spark, dir)
    val nCells = pc.count()
    val z = WroQueries.zonalStats(spark, dir).collect()
    assert(z.map(_.getLong(1)).sum == nCells)
    assert(z.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 4))
    assert(z.forall(r => r.getLong(3) <= r.getLong(4))) // min <= max
    spark.catalog.clearCache()
  }

  test("resample: center sampling picks input (4R+2, 4C+2), nothing else") {
    val out = WroQueries.resampleNearest(spark, dir)
      .filter(col("layer") === "quantity")
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    // expected: quantity at every existing input cell with r%4==2, c%4==2
    val exp = WroQueries.perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % 100).as("c"),
        (col("quantity").cast("decimal(18,4)") * 10000).cast("long").as("v"))
      .filter(col("r") % 4 === 2 && col("c") % 4 === 2)
      .collect()
      .map(r => ((r.getLong(0) / 4, r.getLong(1) / 4), r.getLong(2))).toMap
    assert(out == exp && out.nonEmpty)
  }
}
