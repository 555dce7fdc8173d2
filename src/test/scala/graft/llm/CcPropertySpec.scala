package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential property test for the quotient-hooking CC
  * primitive: on random graphs spanning the shapes that stress
  * different convergence paths — sparse random pairs (the d2 near-dup
  * regime), long CHAINS (maximum diameter per edge — the mesh-creep
  * regime that broke the old per-node propagation), STARS (maximum
  * fan-in hooking), and dense blocks (heavy quotient contraction) —
  * the converged labels must equal brute-force union-find, and the
  * loud-failure contract must never fire within the default round
  * budget. */
class CcPropertySpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are not necessarily component minima under this union rule;
    // normalize: min node id per root
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  test("dedupClusters equals brute-force union-find on random mixed " +
       "graphs (chains, stars, blocks, noise) — property") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val edges = scala.collection.mutable.Buffer.empty[(Long, Long)]
      // a long chain: diameter = length, the worst case for label creep
      val base = trial * 10000L
      val chain = (0 until 120).map(i => (base + i, base + i + 1))
      edges ++= chain
      // stars: one hub, many leaves
      for (h <- 1 to 3) {
        val hub = base + 1000 * h
        edges ++= (1 to 20).map(i => (hub, hub + i))
      }
      // a dense block
      val blk = (0 until 12).map(i => base + 5000 + i)
      edges ++= (for { a <- blk; b <- blk; if a < b && rnd.nextBoolean() }
        yield (a, b))
      // random sparse noise, some overlapping the structures above
      edges ++= (1 to 80).map(_ =>
        (base + rnd.nextInt(6000).toLong, base + rnd.nextInt(6000).toLong))
        .filter { case (a, b) => a != b }
      val exp = unionFind(edges.toSeq)
      val got = Dedup.dedupClusters(
          edges.toSeq.toDF("a", "b"), col("a"), col("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp, s"trial $trial: labels diverge from union-find")
      spark.catalog.clearCache()
    }
  }

  test("ccByLabelProp (the audit formulation) equals union-find AND " +
       "dedupClusters on random mixed graphs — the differential pair " +
       "the sf3 gate rides (graft.CcDiff)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 2) {
      val edges = scala.collection.mutable.Buffer.empty[(Long, Long)]
      val base = trial * 20000L
      edges ++= (0 until 90).map(i => (base + i, base + i + 1)) // chain
      val hub = base + 3000
      edges ++= (1 to 15).map(i => (hub, hub + i)) // star
      edges ++= (1 to 60).map(_ =>
        (base + rnd.nextInt(4000).toLong, base + rnd.nextInt(4000).toLong))
        .filter { case (a, b) => a != b }
      val exp = unionFind(edges.toSeq)
      val prop = Dedup.ccByLabelProp(
          edges.toSeq.toDF("a", "b"), col("a"), col("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == exp,
        s"trial $trial: label propagation diverges from union-find")
      val hooked = Dedup.dedupClusters(
          edges.toSeq.toDF("a", "b"), col("a"), col("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == hooked,
        s"trial $trial: the two closure formulations disagree")
      spark.catalog.clearCache()
    }
  }

  test("dedupClusters converges fast on a 2-D mesh (the region-group " +
       "regime the old propagation failed)") {
    import spark.implicits._
    // 40x40 grid, rook adjacency — diameter 78; per-node propagation
    // would need ~78 rounds, quotient hooking must fit in the default 25
    val edges = (for {
      r <- 0 until 40; c <- 0 until 40
      (dr, dc) <- Seq((0, 1), (1, 0))
      if r + dr < 40 && c + dc < 40
    } yield ((r * 40 + c).toLong, ((r + dr) * 40 + c + dc).toLong)).toSeq
    val got = Dedup.dedupClusters(edges.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 1600 && got.forall(_._2 == 0L),
      "one component labeled by its minimum cell")
    spark.catalog.clearCache()
  }
}
