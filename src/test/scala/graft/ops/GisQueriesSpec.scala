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

  test("majority: strict-majority replaces, ties and isolation keep own") {
    import spark.implicits._
    val g = Seq((0L, 0L, 1), (0L, 1L, 1), (0L, 2L, 2), (1L, 1L, 2),
      (5L, 5L, 3)).toDF("r", "c", "cls")
    val got = WroQueries.majorityFrom(g).collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getInt(2), x.getLong(3), x.getInt(4)))).toMap
    // (0,0): 2 nbrs {1,2} tie at count 1 — no strict majority, keeps 1
    assert(got((0L, 0L)) == ((1, 2L, 1)))
    // (0,1): 3 nbrs {1,2,2} — class 2 holds 2·2 > 3, replaced
    assert(got((0L, 1L)) == ((1, 3L, 2)))
    // (0,2): 2 nbrs {1,2} tie — keeps 2
    assert(got((0L, 2L)) == ((2, 2L, 2)))
    // (1,1): 3 nbrs {1,1,2} — class 1 majority, replaced
    assert(got((1L, 1L)) == ((2, 3L, 1)))
    // isolated cell: zero neighbors, keeps own class
    assert(got((5L, 5L)) == ((3, 0L, 3)))
    assert(got.size == 5)
  }

  test("cost distance: chamfer 3/4 metric, NoData barrier, cap") {
    import spark.implicits._
    // source at (0,0); (3,3) is present but disconnected — NoData
    // cells are barriers, so it must NOT appear in the result
    val g = Seq((0L, 0L, 4), (0L, 1L, 0), (1L, 1L, 0), (0L, 2L, 0),
      (1L, 2L, 0), (3L, 3L, 0)).toDF("r", "c", "cls")
    val got = WroQueries.costDistanceFrom(g, k = 10).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(got((0L, 0L)) == 0L)            // source
    assert(got((0L, 1L)) == 3L)            // one cardinal step
    assert(got((1L, 1L)) == 4L)            // one diagonal step
    assert(got((0L, 2L)) == 6L)            // two cardinal steps
    assert(got((1L, 2L)) == 7L)            // cardinal + diagonal
    assert(!got.contains((3L, 3L)) && got.size == 5)
    // a 1-round cap reaches only the source's immediate neighbors
    val capped = WroQueries.costDistanceFrom(g, k = 1).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(capped ==
      Map((0L, 0L) -> 0L, (0L, 1L) -> 3L, (1L, 1L) -> 4L))
  }

  test("cost distance equals brute-force Bellman-Ford on random sparse " +
       "grids (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // ~60 present cells on a 12x12 grid, ~1/6 of them sources
      val cells = (0 until 144).filter(_ => rnd.nextDouble() < 0.42)
        .map(i => (i / 12L, i % 12L, if (rnd.nextInt(6) == 0) 4 else 0))
      if (cells.exists(_._3 == 4)) {
        val k = 10
        // reference: k rounds of relaxation over a Scala map
        val present = cells.map(c => (c._1, c._2)).toSet
        var ref = cells.filter(_._3 == 4)
          .map(c => (c._1, c._2) -> 0L).toMap
        val offs = for { dr <- -1L to 1L; dc <- -1L to 1L
                         if dr != 0 || dc != 0 }
          yield (dr, dc, if (dr == 0 || dc == 0) 3L else 4L)
        for (_ <- 1 to k) {
          val ext = ref.toSeq.flatMap { case ((r, c), d) =>
            offs.map { case (dr, dc, w) => ((r + dr, c + dc), d + w) } }
            .filter { case (p, _) => present(p) }
          ref = (ref.toSeq ++ ext).groupBy(_._1)
            .map { case (p, ds) => p -> ds.map(_._2).min }
        }
        val got = WroQueries
          .costDistanceFrom(cells.toDF("r", "c", "cls"), k)
          .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2)))
          .toMap
        assert(got == ref, s"trial $trial: mismatch")
      }
    }
  }

  test("majority filter equals brute-force neighborhood mode on random " +
       "classed grids (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val cells = (0 until 144).filter(_ => rnd.nextDouble() < 0.5)
      .map(i => (i / 12L, i % 12L, rnd.nextInt(5)))
    val byPos = cells.map(c => (c._1, c._2) -> c._3).toMap
    val ref = cells.map { case (r, c, cls) =>
      val nbrs = for { dr <- -1 to 1; dc <- -1 to 1
                       if dr != 0 || dc != 0
                       v <- byPos.get((r + dr, c + dc)) } yield v
      val out = if (nbrs.isEmpty) cls else {
        val (mode, cnt) = nbrs.groupBy(identity)
          .map { case (v, vs) => (v, vs.size) }
          .minBy { case (v, n) => (-n, v) }
        if (cnt * 2 > nbrs.size) mode else cls
      }
      (r, c) -> ((cls, nbrs.size.toLong, out))
    }.toMap
    val got = WroQueries.majorityFrom(cells.toDF("r", "c", "cls"))
      .collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getInt(2), x.getLong(3), x.getInt(4)))).toMap
    assert(got == ref)
  }

  test("watershed doubling equals linear pointer-following on random " +
       "functional graphs (property)") {
    // the doubling identity next^(2^k) is independent of the D8
    // derivation — check it on random self-loop-terminated pointer maps
    val rnd = new scala.util.Random(13)
    val n = 200
    val next = Array.tabulate(n) { i =>
      if (rnd.nextInt(5) == 0) i else rnd.nextInt(n) } // ~1/5 sinks
    // linear: follow 16 steps
    val linear = Array.tabulate(n) { i =>
      var cur = i; for (_ <- 1 to 16) cur = next(cur); cur }
    // doubling: 4 squarings
    var p = next.clone()
    for (_ <- 1 to 4) { val q = p.clone(); p = q.map(v => q(v)) }
    assert(p.sameElements(linear))
    // labels only where the 16-hop target is a sink (self-loop)
    val labeled = (0 until n).filter(i => next(p(i)) == p(i) &&
      p(i) == next(p(i)))
    assert(labeled.forall(i => linear(i) == p(i)))
  }

  test("flow length: additive doubling equals brute-force linear walk") {
    val code2off = Map(1 -> (0, 1), 2 -> (1, 1), 4 -> (1, 0), 8 -> (1, -1),
      16 -> (0, -1), 32 -> (-1, -1), 64 -> (-1, 0), 128 -> (-1, 1))
    val fd = WroQueries.flowDirection(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2).toInt)).toMap
    val present = WroQueries.perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % 100).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: follow the D8 pointer 16 steps, summing chamfer
    // weights; sinks (no pointer) absorb at distance 0
    val exp = present.flatMap { start =>
      var cur = start; var acc = 0L
      for (_ <- 1 to 16) {
        fd.get(cur).foreach { code =>
          val (dr, dc) = code2off(code)
          acc += (if (dr == 0 || dc == 0) 3 else 4)
          cur = (cur._1 + dr, cur._2 + dc)
        }
      }
      if (fd.contains(cur)) None // did not reach a sink in 16 hops
      else Some(start -> acc)
    }.toMap
    val got = WroQueries.flowLength(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == exp && got.nonEmpty)
    spark.catalog.clearCache()
  }

  test("allocation: nearest source wins, distance ties to smaller src id") {
    import spark.implicits._
    // two sources at (0,0) and (0,4); the midpoint (0,2) is 6 from
    // both — the packed-key min must hand it to the SMALLER source id
    val g = Seq((0L, 0L, 4), (0L, 1L, 0), (0L, 2L, 0), (0L, 3L, 0),
      (0L, 4L, 4)).toDF("r", "c", "cls")
    val got = WroQueries.allocationFrom(g, k = 10).collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(got((0L, 0L)) == ((0L, 0L, 0L)))
    assert(got((0L, 4L)) == ((0L, 0L, 4L)))
    assert(got((0L, 1L)) == ((3L, 0L, 0L)))
    assert(got((0L, 3L)) == ((3L, 0L, 4L)))
    assert(got((0L, 2L)) == ((6L, 0L, 0L)), "tie goes to source (0,0)")
    assert(got.size == 5)
  }
}
