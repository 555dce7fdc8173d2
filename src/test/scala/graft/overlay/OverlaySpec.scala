package graft.overlay

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Weighted-overlay kernel semantics: half-open remap boundaries
  * (min-inclusive / max-exclusive, §1.4(1)) and exact integer scoring. */
class OverlaySpec extends SparkSpec {

  private def catalogDf = {
    import spark.implicits._
    // one layer, ranges [0,10) -> 1, [10,20) -> 9
    Seq(("L", Seq(("low", 0.0, 10.0, 1), ("high", 10.0, 20.0, 9))))
      .toDF("layer", "rangesRaw")
      .select(col("layer"), transform(col("rangesRaw"), r => struct(
        r("_1").as("label"), r("_2").as("lo"), r("_3").as("hi"),
        r("_4").as("out"))).as("ranges"))
  }

  test("remap is min-inclusive, max-exclusive (boundary value goes UP)") {
    import spark.implicits._
    val cells = Seq((1L, "L", 0.0), (2L, "L", 9.999), (3L, "L", 10.0),
                    (4L, "L", 19.999)).toDF("cell_id", "layer", "value")
    val out = WeightedOverlay.remap(cells, WeightedOverlay.explodeRanges(catalogDf))
      .select("cell_id", "out").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 9, 4L -> 9))
  }

  test("value at/above final hi matches nothing (no silent clamp)") {
    import spark.implicits._
    val cells = Seq((1L, "L", 20.0), (2L, "L", -0.01)).toDF("cell_id", "layer", "value")
    assert(WeightedOverlay.remap(cells,
      WeightedOverlay.explodeRanges(catalogDf)).count() == 0)
  }

  test("score: exact integer weighted sum over layers") {
    import spark.implicits._
    val remapped = Seq((1L, "A", 9), (1L, "B", 1), (2L, "A", 5))
      .toDF("cell_id", "layer", "out")
    val weights = Seq(("A", 7), ("B", 3)).toDF("layer", "w10")
    val rows = WeightedOverlay.score(remapped, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 9L * 7 + 1 * 3, 2L), (2L, 35L, 1L)))
  }

  test("maskNoData: half-open NoData ranges drop cells; unmasked layers " +
       "and boundary values survive") {
    import spark.implicits._
    val cells = Seq((1L, "A", 5.0), (2L, "A", 10.0), (3L, "A", 19.999),
                    (4L, "A", 20.0), (5L, "B", 15.0))
      .toDF("cell_id", "layer", "value")
    val nd = Seq(("A", 10.0, 20.0)).toDF("layer", "lo", "hi")
      .groupBy("layer")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct($"lo", $"hi")).as("nd"))
    val kept = WeightedOverlay.maskNoData(cells, nd)
      .collect().map(_.getLong(0)).toSet
    // lo inclusive (10.0 masked), hi exclusive (20.0 kept), layer B
    // has no NoData table entry -> untouched
    assert(kept == Set(1L, 4L, 5L))
  }
}
