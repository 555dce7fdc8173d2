package graft.ops

import graft._
import graft.classify.Classify
import graft.overlay.WeightedOverlay
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-native capability queries over the driver fixtures.
  *
  * Pseudo-rasters (FIXTURES.md §B): lineitem rows become cells —
  * cell_id = l_orderkey % 10000, three "layers" from l_quantity /
  * l_extendedprice / l_discount. A cell's layer value is max() over its
  * rows (order-independent, exact), so every declared query is
  * deterministic and DuckDB-oracle-checkable.
  */
object WroQueries {

  /** Layer name -> (source column, weight*10). */
  val layers: Seq[(String, String, Int)] = Seq(
    ("quantity", "l_quantity", 5),
    ("extendedprice", "l_extendedprice", 3),
    ("discount", "l_discount", 2))

  /** Per-cell aggregate: ONE shuffle of the fact table, aggregating all
    * three layer columns in the same pass (map-side partial agg), BEFORE
    * unpivoting — the unpivot then runs over ≤10k rows instead of
    * inflating the pre-shuffle data 3×. Output is bounded by the cell_id
    * domain (10k rows) at any scale factor, so it is safe to cache when a
    * query needs the subtree twice (stats + remap). */
  def perCell(spark: SparkSession, dir: String): DataFrame = {
    val aggs = layers.map { case (name, src, _) =>
      max(col(src).cast("double")).as(name) }
    table(spark, dir, "lineitem")
      .groupBy((col("l_orderkey") % 10000).as("cell_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** One row per (cell, layer): long+narrow raster representation that
    * partitions/scales (SURVEY §1.3 raster cells mapping). */
  def cellsFrom(pc: DataFrame): DataFrame = {
    val kv = layers.flatMap { case (name, _, _) =>
      Seq(lit(name), col(name)) }
    pc.select(col("cell_id"), explode(map(kv: _*)).as(Seq("layer", "value")))
  }

  def cells(spark: SparkSession, dir: String): DataFrame =
    cellsFrom(perCell(spark, dir))

  /** Decoded catalog derived from per-layer stats (R7/R9). */
  def catalogFrom(cells: DataFrame): DataFrame =
    cells
      .groupBy("layer")
      .agg(min("value").as("mn"), max("value").as("mx"))
      .select(col("layer"),
              Classify.equalInterval(col("mn"), col("mx")).as("ranges"))

  def catalog(spark: SparkSession, dir: String): DataFrame =
    catalogFrom(cells(spark, dir))

  private def weights(spark: SparkSession): DataFrame = {
    import spark.implicits._
    layers.map { case (n, _, w) => (n, w) }.toDF("layer", "w10")
  }

  /** Flagship (R31/J6/A7): equal-interval classify each layer, range-join
    * cells to ranges (broadcast), weighted-sum to a per-cell score.
    * The fact table is scanned/aggregated ONCE: the per-cell aggregate is
    * cached (bounded ≤10k rows), and both the stats/classification branch
    * and the remap branch reuse it. No global sort — the driver's compare
    * is order-insensitive and the bench action is count(). */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val cs = cellsFrom(perCell(spark, dir).cache())
    WeightedOverlay(cs, catalogFrom(cs), weights(spark))
      .select(col("cell_id"), col("score10").cast("long").as("score10"),
              col("n_layers"))
  }

  /** R31 NoData variant: the flagship overlay with per-layer NoData
    * masking (NoDataRanges, pyt:597 — declared by the reference with the
    * InputRanges pair format but never populated; the service kernel
    * consumes it here). Classification stats stay derived from the FULL
    * raster (the mask applies at overlay time, not stats time), so the
    * ranges match the flagship's and only the per-cell contributions
    * change: a masked (cell, layer) drops out of both score10 and
    * n_layers. */
  def overlayNoData(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cs = cellsFrom(perCell(spark, dir).cache())
    val nd = Seq(("quantity", 10.0, 20.0), ("discount", 0.0, 0.02))
      .toDF("layer", "lo", "hi")
      .groupBy("layer")
      .agg(collect_list(struct(col("lo"), col("hi"))).as("nd"))
    WeightedOverlay(WeightedOverlay.maskNoData(cs, nd), catalogFrom(cs),
        weights(spark))
      .select(col("cell_id"), col("score10").cast("long").as("score10"),
              col("n_layers"))
  }

  /** The skewed-overlay's planted OBSERVATION table: raw fact rows
    * unpivoted (no per-cell pre-aggregation) with a hot cell — rows
    * whose order key is not divisible by 4 (three quarters of the
    * table) all land on cell 0. The 100× question for the flagship:
    * real rasters have empty-ocean/dense-city distributions. */
  private[ops] def skewedObs(spark: SparkSession, dir: String): DataFrame = {
    val hot = when(col("l_orderkey") % 4 === 0, col("l_orderkey") % 10000)
      .otherwise(lit(0L))
    val kv = layers.flatMap { case (name, src, _) =>
      Seq(lit(name), col(src).cast("double")) }
    table(spark, dir, "lineitem")
      .select(hot.as("cell_id"), explode(map(kv: _*)).as(Seq("layer", "value")))
  }

  /** The skewed fact×fact stage of [[overlaySkewed]], exposed for the
    * partition-balance spec: observations join their (cell, layer) max.
    * `salted = false` is the naive plan the salt exists to fix. */
  private[ops] def skewedJoined(spark: SparkSession, dir: String,
                                salted: Boolean): DataFrame = {
    val obs = skewedObs(spark, dir)
    val cellMax = obs.groupBy("cell_id", "layer").agg(max("value").as("maxv"))
    if (salted)
      Skew.saltedJoinOn(obs, cellMax, Seq("cell_id", "layer"), salts = 16,
        merge = true)
    else obs.join(cellMax.hint("merge"), Seq("cell_id", "layer"))
  }

  /** The flagship under PLANTED SKEW (the verdict's 100×-question gate):
    * per-observation overlay — remap every raw row, keep only
    * "representative" observations (within the top half of their cell's
    * value range), weighted-sum per cell — on a distribution where one
    * hot cell carries 3/4 of the table.
    *
    * Where the skew bites and how it is handled:
    *  - the per-(cell, layer) max is a hash AGGREGATE — map-side partial
    *    aggregation absorbs input skew by construction;
    *  - the observation×cellMax join is fact×fact at mosaic scale (one
    *    stats row per cell of a 10^12-cell raster does not broadcast),
    *    pinned to sort-merge by hint and SALTED across 16 sub-keys
    *    ([[Skew.saltedJoinOn]]): the hot cell's rows land in 16 tasks
    *    instead of one. SkewSpec measures the balance — no join task
    *    above 4× the median — and that the UNSALTED plan genuinely
    *    violates it on the same data;
    *  - remap and weights stay broadcast (the flagship kernel).
    * The oracle replays the PLAIN join — the gate proves the salt is
    * result-invariant, not just balanced. */
  def overlaySkewed(spark: SparkSession, dir: String): DataFrame = {
    val rep = skewedJoined(spark, dir, salted = true)
      .filter(col("value") * 2 >= col("maxv"))
    val ranges = WeightedOverlay.explodeRanges(catalog(spark, dir))
    WeightedOverlay.score(WeightedOverlay.remap(rep, ranges), weights(spark))
      .select(col("cell_id"), col("score10").cast("long").as("score10"),
              col("n_layers").as("n_obs"))
  }

  /** Rows the planted hot cell contributes to the skewed shuffle — the
    * sizing input for [[aqeSkewConfs]]. The hot fraction is known BY
    * CONSTRUCTION (the `% 4 =!= 0` plant in [[skewedObs]] routes ~3/4
    * of orders to cell 0, once per layer), so the sizing pays one
    * metadata-only row count instead of a filtered column scan — the
    * advisory needs the magnitude, not the exact row. */
  private[ops] def hotSkewRows(spark: SparkSession, dir: String): Long =
    table(spark, dir, "lineitem").count() * 3 / 4 * layers.size

  /** The AQE-skew config set [[overlaySkewedAqe]] and its spec share:
    * thresholds lowered so the planted hot partition clears the split
    * gate — a 100-TB deployment keeps the defaults (256 MB threshold,
    * 5× factor) and gets the same rewrite on a genuinely hot raster
    * cell. forceOptimizeSkewedJoin: the join feeds an aggregate, and
    * without force AQE declines splits that add a downstream exchange.
    *
    * SIZED TO THE DATA, not a constant: the advisory targets ~3 splits
    * of the hot partition at ANY SF (measured ~3.4 compressed shuffle
    * bytes/row at the test SFs). Round 7 ran a fixed 32 KB advisory,
    * which shattered the sf0.1 hot partition (~7.6 MB) into hundreds
    * of tasks and taxed the bench 21 s of pure task overhead — the
    * scaffold the r7 verdict flagged. The split demonstration is
    * unchanged; only the subtask COUNT is pinned (2–4). */
  private[ops] def aqeSkewConfs(hotRows: Long): Map[String, String] = {
    val hotBytes = math.max(49152L, (hotRows * 3.4).toLong)
    val advisory = math.max(16384L, hotBytes / 3)
    Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        (advisory / 2).toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory.toString,
      // without these two, coalescePartitions' parallelismFirst floor
      // (minPartitionSize 1 MB) merges ALL test-SF partitions into one
      // read before the skew rule can see the hot one. (Disabling
      // coalescing outright was measured WORSE at sf1 — 45.5 s vs
      // 37.8 — so this pair stays; the AQE demo's ~2.6–3.6× gap to the
      // salted sibling at sf1 is the intrinsic cost of the unsalted
      // plan shape it exists to demonstrate: a 75%-hot round-robin
      // re-shuffle plus a forced-skew sort-merge join, where the
      // salted path streams one hash join end to end.)
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
        math.max(4096L, advisory / 8).toString)
  }

  /** The unsalted skewed join ARRANGED so OptimizeSkewedJoin can fire —
    * two preconditions Spark's rule imposes that the naive plan of
    * [[skewedJoined]] violates (both discovered empirically, both
    * no-ops at production scale):
    *  1. the rule's pattern is SMJ(Sort(ShuffleStage), Sort(ShuffleStage))
    *     — the per-cell max AGGREGATE sitting between the build-side
    *     sort and its shuffle masks the stage, so the build side
    *     materializes first (at 100 TB a stats table is a separately
    *     materialized artifact anyway);
    *  2. AQE splits a skewed reduce partition along MAPPER boundaries —
    *     a single-row-group parquet scan yields ONE mapper, making the
    *     hot partition unsplittable — so the probe side pre-distributes
    *     across 16 round-robin mappers (a real fact scan has thousands
    *     of map tasks; this scaffold exists only because test SF fits
    *     one row group). */
  private[ops] def skewedJoinedAqe(spark: SparkSession, dir: String)
      : DataFrame = {
    val obs = skewedObs(spark, dir)
    // the round-robin exchange ITSELF is the 16-mapper stage feeding
    // the join shuffle — no checkpoint: materializing the full fact to
    // storage once more bought nothing (the skew rule only needs the
    // join's shuffle stage to have >1 mapper to split along)
    val obsManyMappers = obs.repartition(16)
    val cellMax = obs.groupBy("cell_id", "layer")
      .agg(max("value").as("maxv")).localCheckpoint()
    obsManyMappers.join(cellMax.hint("merge"), Seq("cell_id", "layer"))
  }

  /** Forwarder to [[graft.withConfs]] (moved to the package object so the
    * llm closure loop can share it); see that scaladoc for the
    * must-materialize-inside contract. */
  private[ops] def withConfs[T](spark: SparkSession,
                                confs: Map[String, String])(body: => T): T =
    graft.withConfs(spark, confs)(body)

  /** J13 under ADAPTIVE skew handling — the same planted-skew overlay as
    * [[overlaySkewed]] with the manual salt DISABLED: the hot cell is
    * left in one shuffle partition and Spark's OptimizeSkewedJoin (what
    * a 100-TB deployment reaches for first) splits it at runtime into
    * advisory-sized sub-tasks, replicating the matching build rows — the
    * engine-native version of [[Skew.saltedJoinOn]]'s 16-way salt. The
    * fact×fact stage must EXECUTE under the lowered thresholds, so it
    * materializes via localCheckpoint inside a config save/restore
    * block; the flagship kernel (broadcast remap + weights) composes on
    * top afterwards. Result-invariance vs the salted path is the gate
    * (identical oracle as wro_overlay_skewed); SkewSpec asserts the
    * final adaptive plan actually carries the skew=true sort-merge
    * join. */
  def overlaySkewedAqe(spark: SparkSession, dir: String): DataFrame = {
    // the near-max filter rides INSIDE the materialization: it runs in
    // the same tasks as the skew-split join output, so the checkpoint
    // stores the filtered survivors, not the full fact×stats product
    // (the salted sibling streams end-to-end and never materializes —
    // this is the AQE path's equivalent economy)
    val rep = withConfs(spark, aqeSkewConfs(hotSkewRows(spark, dir))) {
      skewedJoinedAqe(spark, dir)
        .filter(col("value") * 2 >= col("maxv"))
        .localCheckpoint()
    }
    val ranges = WeightedOverlay.explodeRanges(catalog(spark, dir))
    WeightedOverlay.score(WeightedOverlay.remap(rep, ranges), weights(spark))
      .select(col("cell_id"), col("score10").cast("long").as("score10"),
              col("n_layers").as("n_obs"))
  }

  /** A9 as explicit bin COUNTS (pyt:903 grounding — the raster histogram
    * behind classification): per-layer equi-width 5-bin histogram via a
    * width_bucket-style expression. Stats ride a broadcast; the bin
    * assignment is a map-side projection, so the only shuffle is the
    * final keyed (layer, bin) count — ≤15 rows out at any scale. The
    * true max is clamped into the top bin (half-open bins elsewhere). */
  def a9Histogram(spark: SparkSession, dir: String): DataFrame = {
    val cs = cellsFrom(perCell(spark, dir).cache())
    val stats = cs.groupBy(col("layer").as("s_layer"))
      .agg(min("value").as("mn"), max("value").as("mx"))
    cs.join(broadcast(stats), col("layer") === col("s_layer"))
      .select(col("layer"),
        least(floor((col("value") - col("mn")) /
                    ((col("mx") - col("mn")) / lit(5.0))), lit(4))
          .cast("int").as("bin"))
      .groupBy("layer", "bin")
      .agg(count(lit(1)).as("n"))
  }

  /** The pseudo-raster as a 2-D grid: cell_id 0..9999 unfolds to a
    * 100×100 raster (row = cell_id div 100, col = cell_id % 100). The
    * grid is SPARSE — a (row, col) with no fact rows is NoData, and the
    * raster-algebra queries below treat absence as NoData the way the
    * service kernel does (pyt:597 NoData semantics): focal/zonal
    * statistics aggregate over present cells only. */
  private val GridW = 100L

  /** GIS1 — FOCAL statistics (Esri Focal Statistics, 3×3 rectangle
    * neighborhood): per grid cell, the sum and count of the quantity
    * layer over the cell and its 8 neighbors. Spark-first shape: each
    * present cell CONTRIBUTES to its 9 neighbors (two tiny generators,
    * 9× row inflation of the BOUNDED ≤10k-cell raster — never of the
    * fact table), then one hash aggregate with map-side partial combine
    * folds contributions per target cell. At 100 TB the raster domain,
    * not the fact table, bounds the focal exchange; a tiled layout
    * (partition by tile, overlap = 1-cell halo) keeps the same plan
    * shuffle-free per tile. Values snap to BIGINT cents before the sum
    * (the money policy), so the focal sum is exact under any
    * aggregation order. */
  def focalStats(spark: SparkSession, dir: String): DataFrame =
    focalFrom(perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents")))

  /** Focal core over a sparse grid (r, c, cents), exposed for the
    * hand-computed neighborhood spec. */
  private[ops] def focalFrom(g: DataFrame): DataFrame = {
    val off = typedLit(Seq(-1L, 0L, 1L))
    g.select(col("r"), col("c"), col("cents"), explode(off).as("dr"))
      .select((col("r") + col("dr")).as("r"), col("c"), col("cents"),
        explode(off).as("dc"))
      .select(col("r"), (col("c") + col("dc")).as("c"), col("cents"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .groupBy("r", "c")
      .agg(sum("cents").as("focal_sum"), count(lit(1)).as("n_nbr"))
  }

  /** GIS2 — ZONAL statistics (Esri Zonal Statistics as Table): zones =
    * the quantity layer equal-interval-binned into 5 classes (the a9
    * gate-proven break formula), values = the extendedprice layer as
    * exact cents; per zone: cell count, sum, min, max. Because the
    * catalog stores layers as bands of ONE wide per-cell row, the
    * zone↔value alignment is a projection — the cell-aligned raster
    * join that a band-per-table layout would need never materializes
    * (the multiband-storage dividend; at 100 TB this is the difference
    * between zero and one fact-grain shuffle). The per-cell aggregate
    * is cached: stats leg + zoning leg reuse it (multi-leg policy), and
    * every post-cache exchange carries ≤10k bounded rows. */
  def zonalStats(spark: SparkSession, dir: String): DataFrame = {
    val pc = perCell(spark, dir).cache()
    val stats = pc.agg(min("quantity").as("mn"), max("quantity").as("mx"))
    pc.crossJoin(broadcast(stats))
      .select(
        least(floor((col("quantity") - col("mn")) /
                    ((col("mx") - col("mn")) / lit(5.0))), lit(4))
          .cast("int").as("zone"),
        (col("extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_cells"), sum("cents").as("sum_cents"),
           min("cents").as("min_cents"), max("cents").as("max_cents"))
  }

  /** GIS3 — NEAREST-neighbor resampling, the one resampling mode the
    * reference permits (pyt:25, pyt:606, pyt:823 — suitability classes
    * must not be interpolated). Downscale ×4: output cell (R, C) takes
    * the input cell nearest its center, floor((R+0.5)·4) = 4R+2. The
    * selection predicate is a pure function of the grid position, so it
    * is applied to the FACT TABLE before the per-cell shuffle — 15/16
    * of the rows never enter the exchange (the pushed-down form of
    * "resample then aggregate"; resampling after perCell would shuffle
    * everything first). NoData (absent) input cells stay absent — exactly
    * NEAREST's no-interpolation contract. */
  def resampleNearest(spark: SparkSession, dir: String): DataFrame = {
    val keep = expr("((l_orderkey % 10000) div 100) % 4 = 2") &&
      expr("((l_orderkey % 10000) % 100) % 4 = 2")
    val aggs = layers.map { case (name, src, _) =>
      max(col(src).cast("double")).as(name) }
    val pc = table(spark, dir, "lineitem").filter(keep)
      .groupBy((col("l_orderkey") % 10000).as("cell_id"))
      .agg(aggs.head, aggs.tail: _*)
    cellsFrom(pc).select(col("layer"),
      expr("(cell_id div 100) div 4").as("out_r"),
      expr("(cell_id % 100) div 4").as("out_c"),
      (col("value").cast("decimal(18,4)") * 10000).cast("long").as("v4"))
  }

  /** GIS4 — SLOPE gradients (Horn 1981; the kernel behind the Esri
    * Surface toolset's Slope/Aspect, the natural next operator after
    * GIS1's focal smoothing): per grid cell the x/y gradients of the
    * quantity surface over its 3×3 neighborhood,
    *   gx = (zNE + 2·zE + zSE) − (zNW + 2·zW + zSW),
    *   gy = (zSW + 2·zS + zSE) − (zNW + 2·zN + zNE)
    * (y positive toward increasing row). Emitted as exact
    * cents·weight BIGINTs, UNDIVIDED: Horn's 1/(8·cellsize) factor and
    * Esri's atan(√(gx²+gy²)) are monotone post-transforms of these two
    * integers, and applying them would put IEEE trig in the gate.
    * Only COMPLETE neighborhoods emit (n == 9): the sparse raster's
    * absent cells are NoData, and Horn over NoData is implementation-
    * defined (Esri substitutes the center z) — the complete-
    * neighborhood restriction is the one contract every implementation
    * agrees on, and it is non-vacuous at gate SF (edge cells and cells
    * ringing empty cells are suppressed). Same contribute-to-neighbors
    * shape as GIS1: each present cell fans out to the ≤9 targets it
    * influences carrying the weight the TARGET sees — a source at
    * relative offset (−dr,−dc) from its target weighs
    * wx = −dc·(2−|dr|), wy = −dr·(2−|dc|) — then ONE map-side-combined
    * hash aggregate folds contributions. The exchange is bounded by the
    * ≤10k-cell raster domain, never the fact table; at 100 TB a tiled
    * layout with a 1-cell halo keeps the identical plan shuffle-free
    * per tile. */
  def slope(spark: SparkSession, dir: String): DataFrame = {
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L }
      yield (dr, dc, -dc * (2 - math.abs(dr)), -dr * (2 - math.abs(dc)))
    perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .select(col("r"), col("c"), col("cents"),
        explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"), (col("c") + col("o._2")).as("c"),
        (col("cents") * col("o._3")).as("xc"),
        (col("cents") * col("o._4")).as("yc"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .groupBy("r", "c")
      .agg(sum("xc").as("gx"), sum("yc").as("gy"), count(lit(1)).as("n"))
      .filter(col("n") === 9)
      .select("r", "c", "gx", "gy")
  }

  /** GIS13 — HILLSHADE, classed (Esri Hillshade, default NW light —
    * azimuth 315°, altitude 45° — emitted as brightness CLASSES: the
    * no-interpolation rule protects classed output, and classing is
    * exactly what removes IEEE sqrt/trig from the gate): illumination
    * is the dot of the surface normal with the light vector. With
    * [[slope]]'s exact integer gradients (gx east+, gy south+), the
    * unnormalized z-up normal is n = (−gx, gy, 8·C) — C = 100 cents
    * of elevation per cell width, the documented fixture constant —
    * and the unit NW light (−½, ½, √2/2), scaled by 10/√2 under the
    * GIS8 rational √2 ≈ 7/5, becomes L = (−7, 7, 10) (|L|² = 198,
    * ~1% deviation, documented):
    *   dot = 7·gx + 7·gy + 80·C.
    * Brightness class = the largest k ∈ {0..3} with shade ≥ k/4 —
    * i.e. 16·dot² ≥ 198·k²·|n|² while dot ≥ 0 — and −1
    * (self-shadowed) when dot < 0: squared BIGINT cross-multiplies,
    * no sqrt, the identical arithmetic replayed in the oracle. Pure
    * projection over the slope frame — no exchange beyond slope's
    * own two. */
  def hillshade(spark: SparkSession, dir: String): DataFrame = {
    val C = 100L
    val dot = col("gx") * 7 + col("gy") * 7 + lit(80L * C)
    val n2 = col("gx") * col("gx") + col("gy") * col("gy") +
      lit(64L * C * C)
    val d2x16 = dot * dot * 16
    slope(spark, dir).select(col("r"), col("c"),
      when(dot < 0, lit(-1))
        .when(d2x16 >= n2 * (198L * 9), lit(3))
        .when(d2x16 >= n2 * (198L * 4), lit(2))
        .when(d2x16 >= n2 * 198L, lit(1))
        .otherwise(lit(0)).as("shade_class"))
  }

  /** GIS6 — ASPECT classing (Esri Aspect with classed output — the
    * no-interpolation rule pyt:25/606/823 demands CLASSES, and Esri's
    * own Aspect tool bins to the 8 compass sectors + flat): each
    * complete-neighborhood cell's Horn gradient (gx east-positive, gy
    * south-positive, [[slope]]'s exact integers) classified into its
    * 45°-wide compass octant. The 22.5° sector boundaries are the one
    * place IEEE trig could leak into the gate — instead tan(22.5°) =
    * √2−1 ≈ 0.414214 is replaced by the rational 29/70 ≈ 0.414286 and
    * the test becomes the BIGINT cross-multiply 70·|minor| ≤ 29·|major|
    * (boundaries land at arctan(29/70) ≈ 22.504°, a documented 0.004°
    * deviation; ties resolve INTO the cardinal band via ≤). Flat =
    * both gradients zero. Codes: 0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE,
    * 8=flat — the octant of the GRADIENT vector (steepest ascent;
    * Esri's downslope aspect is the point reflection, a relabeling).
    * Pure projection over the slope frame — no exchange beyond
    * [[slope]]'s own two. */
  def aspect(spark: SparkSession, dir: String): DataFrame = {
    val (ax, ay) = (abs(col("gx")), abs(col("gy")))
    val ew = when(col("gx") > 0, lit(0)).otherwise(lit(4))
    val ns = when(col("gy") > 0, lit(6)).otherwise(lit(2))
    val diag = when(col("gx") > 0,
        when(col("gy") > 0, lit(7)).otherwise(lit(1)))
      .otherwise(when(col("gy") > 0, lit(5)).otherwise(lit(3)))
    slope(spark, dir).select(col("r"), col("c"),
      when(col("gx") === 0 && col("gy") === 0, lit(8))
        .when(ay * 70 <= ax * 29, ew)
        .when(ax * 70 <= ay * 29, ns)
        .otherwise(diag).as("octant"))
  }

  /** GIS8 — D8 FLOW DIRECTION (Esri/Jenson-Domingue 1988, the
    * hydrology raster classic): each complete-neighborhood cell points
    * at the neighbor with the steepest distance-weighted drop, encoded
    * in Esri's power-of-two compass codes (E=1 SE=2 S=4 SW=8 W=16
    * NW=32 N=64 NE=128). Steepness = drop/distance with diagonal
    * distance √2 — approximated 7/5 (1.4, a documented 1% deviation)
    * so the argmax key is the BIGINT drop·(7 cardinal / 5 diagonal)
    * and no sqrt enters the gate; ties take the smallest code
    * (deterministic where Esri's tie rule is lookup-table-internal);
    * all-uphill cells (pits) still point at their least-bad neighbor —
    * pit handling is the fill algorithm's job, documented not hidden.
    * Shape: the cached cell grid C fans out codes to its 8 neighbors
    * (raster-domain bounded), joins back to C for the center
    * elevation, and one min(struct(−key, code)) aggregate picks the
    * receiver — argmax as a partially-aggregable min, no window. */
  /** (dr, dc) = target − source; code/weight are the TARGET's view of
    * the source (its neighbor at (−dr, −dc)). Shared with the oracle's
    * generated VALUES. */
  private val d8Offs: Seq[(Long, Long, Long, Long)] = for {
    dr <- -1L to 1L; dc <- -1L to 1L; if dr != 0 || dc != 0
  } yield {
    val (nr, nc) = (-dr, -dc)
    val code = (nr, nc) match {
      case (0L, 1L) => 1L; case (1L, 1L) => 2L; case (1L, 0L) => 4L
      case (1L, -1L) => 8L; case (0L, -1L) => 16L; case (-1L, -1L) => 32L
      case (-1L, 0L) => 64L; case (-1L, 1L) => 128L
      case _ => sys.error("unreachable")
    }
    (dr, dc, code, if (nr == 0L || nc == 0L) 7L else 5L)
  }

  def flowDirection(spark: SparkSession, dir: String): DataFrame = {
    val cells = perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .cache()
    val offs = d8Offs
    val nbr = cells.select(col("r"), col("c"), col("cents"),
        explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"), (col("c") + col("o._2")).as("c"),
        col("cents").as("nb_cents"), col("o._3").as("code"),
        col("o._4").as("w"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
    nbr.join(cells.withColumnRenamed("cents", "own"), Seq("r", "c"))
      .select(col("r"), col("c"), col("code"),
        ((col("own") - col("nb_cents")) * col("w")).as("key"))
      .groupBy("r", "c")
      .agg(count(lit(1)).as("n"),
           min(struct((-col("key")).as("nk"), col("code"))).as("b"))
      .filter(col("n") === 8)
      .select(col("r"), col("c"), col("b.code").as("d8"))
  }

  /** GIS9 — FLOW ACCUMULATION over the D8 pointers (the second half of
    * the Jenson-Domingue pair: how many upstream cells drain through
    * each cell), bounded at `K` hops — the bounded-iteration posture
    * (q23's recursion cap, d2_dedup_clusters' round discipline): each
    * round extends every path by one hop via a keyed equi-join of the
    * current frontier against the 1-hop edge table, so round cost is
    * frontier-sized and rounds are K, not terrain-diameter. Upstream
    * count = count(DISTINCT origin) per receiving cell — DISTINCT, not
    * count(*), because the pit-pair 2-cycles [[flowDirection]]'s
    * least-bad-neighbor rule admits would otherwise count an origin
    * once per lap (cells encode as r·100+c, exact on the 100-wide
    * grid). Boundary cells have no D8 code and simply terminate paths.
    * At 100 TB the edge table is raster-domain bounded and
    * checkpointed once; each round is one partition-local join when
    * both sides hash on the cell key. */
  def flowAccumulation(spark: SparkSession, dir: String, k: Int = 10)
      : DataFrame = {
    val code2dr = expr("""CASE d8 WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 4 THEN 1
      WHEN 8 THEN 1 WHEN 16 THEN 0 WHEN 32 THEN -1 WHEN 64 THEN -1
      ELSE -1 END""")
    val code2dc = expr("""CASE d8 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 4 THEN 0
      WHEN 8 THEN -1 WHEN 16 THEN -1 WHEN 32 THEN -1 WHEN 64 THEN 0
      ELSE 1 END""")
    val edges = flowDirection(spark, dir)
      .select((col("r") * 100 + col("c")).as("u"),
        ((col("r") + code2dr) * 100 + (col("c") + code2dc)).as("v"))
      .localCheckpoint()
    val step = edges.select(col("u").as("su"), col("v").as("sv"))
    var cur = edges
    var all = edges
    // loop under relaxConfs: every per-round frame is raster-domain
    // bounded (≤GridW² rows), so the k−1 extension checkpoints run as
    // k−1 single jobs at domain-sized partitions instead of paying
    // AQE's per-stage job submission at the session's data-scale
    // partition count (the costDistanceFrom discipline applied to the
    // one D8 loop that still paid it). The edges checkpoint above
    // stays OUTSIDE — its plan aggregates the fact table at data
    // scale. The final countDistinct below is lazy (materializes after
    // the restore), so it correctly runs at session confs.
    withConfs(spark, relaxConfs) {
      for (_ <- 2 to k) {
        cur = cur.join(step, col("v") === col("su"))
          .select(col("u"), col("sv").as("v"))
          .localCheckpoint()
        all = all.unionByName(cur)
      }
      cur
    }
    all.groupBy("v")
      .agg(countDistinct(col("u")).as("n_upstream"))
      .select(expr("v div 100").as("r"), (col("v") % 100).as("c"),
        col("n_upstream"))
  }

  /** The classified raster shared by GIS10/GIS11: each present cell's
    * equal-interval class of the quantity layer (the a9/GIS2 break
    * formula — identical float arithmetic in both engines, gate-proven
    * by wro_zonal_stats). One broadcast of the 1-row stats. */
  private def classedGrid(spark: SparkSession, dir: String): DataFrame = {
    // cached: the stats leg and the classing leg both read it (the
    // flagship's multi-leg policy; bounded by the ≤10k cell domain)
    val pc = perCell(spark, dir).cache()
    val stats = pc.agg(min("quantity").as("mn"), max("quantity").as("mx"))
    pc.crossJoin(broadcast(stats))
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        least(floor((col("quantity") - col("mn")) /
                    ((col("mx") - col("mn")) / lit(5.0))), lit(4))
          .cast("int").as("cls"))
  }

  /** GIS10 — MAJORITY filter (Esri Majority Filter, the classed-raster
    * smoothing tool; GIS5 detected class boundaries, this cleans them):
    * each present cell's class is replaced by the most frequent class
    * among its ≤8 PRESENT neighbors iff that class holds a STRICT
    * majority (count·2 > n present neighbors, Esri's MAJORITY
    * threshold); otherwise the cell keeps its own class. Ties in the
    * frequency count take the smallest class — a22's
    * min(struct(−count, value)) mode, partially aggregable, no window.
    * Shape: one contribute-to-neighbors fan-out over the 3×3 offsets
    * with the (0,0) leg tagged SELF, then a two-level hash aggregate —
    * (r, c, cls) counts, then per (r, c) the mode-over-neighbors and
    * the self class in the SAME pass (the self tag rides the count
    * rows, so the cell's own class needs no join back). NoData cells
    * neither vote nor emit. Exchanges: perCell's one + two raster-
    * domain-bounded aggregates. */
  def majorityFilter(spark: SparkSession, dir: String): DataFrame =
    majorityFrom(classedGrid(spark, dir))

  /** Majority-filter core over a classed sparse grid (r, c, cls),
    * exposed for the hand-computed neighborhood spec. */
  private[ops] def majorityFrom(classed: DataFrame): DataFrame = {
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L }
      yield (dr, dc, if (dr == 0L && dc == 0L) 1 else 0)
    classed
      .select(col("r"), col("c"), col("cls"), explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"), (col("c") + col("o._2")).as("c"),
        col("cls"), col("o._3").as("self"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .groupBy("r", "c", "cls")
      .agg(sum(lit(1) - col("self")).as("nbr_n"), max("self").as("has_self"))
      .groupBy("r", "c")
      .agg(
        max(when(col("has_self") === 1, col("cls"))).as("own_cls"),
        sum("nbr_n").as("n_nbr"),
        min(when(col("nbr_n") > 0,
          struct((-col("nbr_n")).as("neg"), col("cls")))).as("m"),
        max("has_self").as("present"))
      .filter(col("present") === 1)
      .select(col("r"), col("c"), col("own_cls"), col("n_nbr"),
        when(col("m.neg") * -2 > col("n_nbr"), col("m.cls"))
          .otherwise(col("own_cls")).as("out_cls"))
  }

  /** GIS11 — COST DISTANCE (Esri Cost Distance, the Spatial Analyst
    * accumulated-travel-cost tool) from the class-4 source cells over
    * a unit-cost surface, chamfer 3-4 metric (Borgefors 1986: cardinal
    * step 3, diagonal 4 — the classic integer approximation of
    * Euclidean distance, max error ~8%; the 1/3·cellsize factor is a
    * monotone post-scale kept out of the gate), bounded at `k`
    * relaxation rounds — the GIS9 bounded-iteration posture. NoData
    * cells are BARRIERS (Esri's cost-distance contract): travel only
    * crosses present cells, so the result is the geodesic distance on
    * the populated grid, not straight-line. Each round is one
    * Bellman-Ford relaxation — extend every current estimate by one
    * edge (9-offset generator whose weight-0 SELF step keeps the
    * current estimate — no join, no union), keep in-grid PRESENT
    * targets (broadcast semi of the ≤10k-cell domain), fold min per
    * cell — so after k rounds each cell holds the min cost over
    * ≤k-edge paths, frontier cost per round, k rounds not
    * grid-diameter, and the whole relaxation is ONE linear lineage
    * (a single job, one reused domain broadcast). Cells a source
    * cannot reach in k hops stay NoData (absent). */
  def costDistance(spark: SparkSession, dir: String, k: Int = 10)
      : DataFrame =
    costDistanceFrom(classedGrid(spark, dir), k)

  /** Cost-distance core over a classed sparse grid (r, c, cls) with
    * class-`seedCls` sources, exposed for the barrier/metric spec. */
  private[ops] def costDistanceFrom(classed: DataFrame, k: Int,
                                    seedCls: Int = 4): DataFrame = {
    // the SELF offset (0,0, weight 0) folds "keep the current
    // estimate" into the same fan-out as the 8 neighbor extensions,
    // so each round is min over ONE generator — no union referencing
    // `best` twice, hence no doubling subtree, hence NO per-round
    // checkpoint: the k rounds are one linear lineage Spark runs as a
    // SINGLE job (one reused broadcast of the present-cell domain,
    // k chained partial-agg shuffles AQE coalesces to the data),
    // instead of k checkpoint jobs each paying scheduling + a fresh
    // broadcast. Measured 4.1 s → ~1.5 s at sf0.1 for the same rows.
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L }
      yield (dr, dc, if (dr == 0L && dc == 0L) 0L
                     else if (dr == 0L || dc == 0L) 3L else 4L)
    val cells = classed.localCheckpoint()
    val present = cells.select("r", "c")
    var best = cells.filter(col("cls") === seedCls)
      .select(col("r"), col("c"), lit(0L).as("d"))
    for (_ <- 1 to k) {
      best = best
        .select(col("r"), col("c"), col("d"), explode(typedLit(offs)).as("o"))
        .select((col("r") + col("o._1")).as("r"),
          (col("c") + col("o._2")).as("c"), (col("d") + col("o._3")).as("d"))
        .filter(col("r").between(0, GridW - 1) &&
          col("c").between(0, GridW - 1))
        .join(broadcast(present), Seq("r", "c"), "left_semi")
        .groupBy("r", "c").agg(min("d").as("d"))
    }
    withConfs(classed.sparkSession, relaxConfs) {
      best.localCheckpoint()
    }.withColumnRenamed("d", "cost34")
  }

  /** Confs the domain-bounded relaxations materialize under: AQE OFF
    * — under AQE every one of the k chained shuffle stages is
    * submitted as its OWN job (~150-200 ms scheduling each, measured)
    * while the stages carry ≤10k rows, so there is nothing to adapt
    * and the whole k-round lineage can run as ONE job — and shuffle
    * partitions sized to the RASTER DOMAIN (≤GridW² rows by
    * construction at ANY scale factor), not the session's data-scale
    * default of 32: the k tiny stages otherwise pay k×32 empty-task
    * launches. Data-sized like [[aqeSkewConfs]], scoped to the
    * materialization via [[withConfs]]; everything else in the
    * session (including the AQE skew demos) keeps AQE on. */
  private val relaxConfs = Map(
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.shuffle.partitions" -> "4")

  /** GIS23 — LEAST-COST PATH (Esri Cost Path, the backtrace companion
    * to GIS11's accumulated-cost field): from the hardest-to-reach
    * cell (max cost34, ties to the smallest packed key — a
    * deterministic in-plan choice, no parameter), walk the optimal
    * route back to a source by repeatedly stepping to THE predecessor
    * — the neighbor y with d(y) + w(y→x) = d(x) (w = chamfer 3/4),
    * ties to the minimum packed d·10⁴ + key. The predecessor FUNCTION
    * is built once as a table (one 8-offset fan-out + equality filter
    * + min-packed aggregate over the cost field — raster-domain
    * bounded, the relaxation invariant guarantees every non-source
    * reachable cell has one); the walk itself is a SINGLE-ROW pointer
    * chase, so it runs where a ≤⌈4k/3⌉-step sequential chase belongs:
    * on the driver, over the pred table collected ONCE (bounded by
    * the ≤GridW² raster domain at ANY scale factor — the documented
    * bounded-collect boundary, like Bpe's ≤topM rows; the cost FIELD
    * and the pred FUNCTION stay distributed). The former
    * formulation — one Spark join of a one-row frontier per step —
    * paid either a ~100 ms checkpoint job per step or ~2 s of
    * planning the unioned join chain, for a walk whose total state is
    * one (r, c) pair. Emits (seq, r, c, cost34) from destination
    * (seq 0, max cost34, ties to the smallest packed key) down to the
    * source. The relaxation invariant (every non-source cell has a
    * predecessor) holds only at CONVERGENCE of the k-round cost
    * field — under truncation a cell can hold a ≤k-edge cost whose
    * predecessor's own recorded cost is cheaper still, leaving no
    * valid step; the walk then FAILS LOUDLY (the dedupClusters
    * discipline) rather than emitting a truncated route as if
    * complete. */
  def leastCostPath(spark: SparkSession, dir: String, k: Int = 10)
      : DataFrame = {
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L; if dr != 0 || dc != 0 }
      yield (dr, dc, if (dr == 0L || dc == 0L) 3L else 4L)
    val cost = costDistance(spark, dir, k)
    val pred = withConfs(spark, relaxConfs) {
      cost
        .select(col("r").as("yr"), col("c").as("yc"),
          col("cost34").as("yd"), explode(typedLit(offs)).as("o"))
        .select((col("yr") + col("o._1")).as("r"),
          (col("yc") + col("o._2")).as("c"),
          col("yr"), col("yc"), col("yd"), col("o._3").as("w"))
        .join(broadcast(cost), Seq("r", "c"))
        .filter(col("yd") + col("w") === col("cost34"))
        .groupBy("r", "c")
        .agg(min(col("yd") * 10000 + col("yr") * 100 + col("yc")).as("pk"))
        .select(col("r"), col("c"), expr("(pk % 10000) div 100").as("pr"),
          (col("pk") % 100).as("pc"))
        .localCheckpoint()
    }
    // both collects are bounded by the raster domain (≤GridW² rows)
    val costOf: Map[(Long, Long), Long] = cost.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val predOf: Map[(Long, Long), (Long, Long)] = pred.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    require(costOf.nonEmpty,
      "least-cost path found no destination — the cost field is empty")
    // destination: max cost34, ties to the SMALLEST packed key
    val dest = costOf.keysIterator.reduce { (a, b) =>
      val (da, db) = (costOf(a), costOf(b))
      if (da > db || (da == db &&
        a._1 * 100 + a._2 < b._1 * 100 + b._2)) a else b
    }
    // a converged field bounds cost34 by 4k but each backtrace step
    // drops it by only >=3 (orthogonal chamfer weight), so a valid
    // path can need up to ceil(4k/3) steps — walking only k would
    // trip the convergence guard below on a perfectly valid field.
    val steps = math.ceil(4.0 * k / 3.0).toInt
    val path = scala.collection.mutable.ArrayBuffer(
      (0L, dest._1, dest._2, costOf(dest)))
    var cur = dest
    while (path.last._4 != 0L && predOf.contains(cur) &&
           path.length <= steps) {
      cur = predOf(cur)
      path += ((path.length.toLong, cur._1, cur._2, costOf(cur)))
    }
    // loud truncation guard: a non-converged cost field can strand
    // the walk mid-path (no predecessor before reaching a source)
    require(path.last._4 == 0L,
      s"least-cost path did not reach a source in $steps steps — the " +
      "k-round cost field is not converged for this destination; " +
      "raise k")
    import spark.implicits._
    path.toSeq.toDF("seq", "r", "c", "cost34")
  }

  /** GIS12 — EUCLIDEAN ALLOCATION (Esri Euclidean Allocation, the
    * nearest-source Voronoi labeling that pairs with GIS11's
    * distance): every reachable cell is labeled with the SOURCE CELL
    * it is cheapest to reach, chamfer 3-4 metric, same 10-round
    * bounded relaxation and NoData-barrier contract. The per-cell
    * state is ONE BIGINT — the packed key d·10⁴ + src (src =
    * r·100 + c < 10⁴, d ≤ 40 at the cap), so "min distance, ties to
    * the smallest source id" is a plain min() — partially aggregable,
    * engine-exact, and the same total order in the oracle's packed
    * min. Emits the distance AND the allocated source, unpacked. */
  def allocation(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    allocationFrom(classedGrid(spark, dir), k)

  private[ops] def allocationFrom(classed: DataFrame, k: Int): DataFrame = {
    // same single-lineage relaxation as [[costDistanceFrom]]: the
    // weight-0 self offset subsumes the union, so the k rounds run as
    // one job with no per-round checkpoints.
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L }
      yield (dr, dc, if (dr == 0L && dc == 0L) 0L
                     else if (dr == 0L || dc == 0L) 3L else 4L)
    val cells = classed.localCheckpoint()
    val present = cells.select("r", "c")
    var best = cells.filter(col("cls") === 4)
      .select(col("r"), col("c"),
        (col("r") * 100 + col("c")).as("key"))   // d = 0, packed = src
    for (_ <- 1 to k) {
      best = best
        .select(col("r"), col("c"), col("key"),
          explode(typedLit(offs)).as("o"))
        .select((col("r") + col("o._1")).as("r"),
          (col("c") + col("o._2")).as("c"),
          (col("key") + col("o._3") * 10000L).as("key"))
        .filter(col("r").between(0, GridW - 1) &&
          col("c").between(0, GridW - 1))
        .join(broadcast(present), Seq("r", "c"), "left_semi")
        .groupBy("r", "c").agg(min("key").as("key"))
    }
    best = withConfs(classed.sparkSession, relaxConfs) {
      best.localCheckpoint()
    }
    best.select(col("r"), col("c"), expr("key div 10000").as("cost34"),
      expr("(key % 10000) div 100").as("src_r"),
      (col("key") % 100).as("src_c"))
  }

  /** GIS27 — CORRIDOR (Esri Corridor, Distance toolset: the SUM of two
    * accumulated-cost surfaces — every cell's value is the total cost
    * of the best A→cell→B route through it; thresholding the sum picks
    * the movement corridor between the two source sets): the class-4
    * and class-0 cost fields (GIS11's k-round chamfer relaxation,
    * seed class parameterized) joined on the cell key and summed.
    * Only cells reachable from BOTH source sets within k rounds emit
    * (the inner join IS the reachability intersection — Esri's NoData
    * propagation for corridor); the threshold cut is the caller's
    * post-filter, so the full sum surface ships. Two proven subplans
    * + one co-partitioned join; at 100 TB each field is the GIS11
    * frontier relaxation and the join inherits their layout. */
  def corridor(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val classed = classedGrid(spark, dir)
    // ONE FUSED relaxation for BOTH source sets (r12): the two per-seed
    // recurrences never interact, so carrying the seed class in the
    // aggregation key computes both cost fields in a single k-round
    // lineage — one materialization job instead of two, one broadcast
    // of the present-cell domain instead of two, and the final
    // co-partitioned join collapses into a pivot aggregate (2
    // checkpointed inputs + join exchange → 1 groupBy). Per-round row
    // count is |frontier_4| + |frontier_0| — the same total rows the
    // two separate lineages carried. Result-identical by construction:
    // min-fold per (cell, seed) is exactly costDistanceFrom's
    // recurrence per seed, and the non-null filter reproduces the
    // inner join's both-reachable semantics (oracle unchanged,
    // re-verified exact).
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L }
      yield (dr, dc, if (dr == 0L && dc == 0L) 0L
                     else if (dr == 0L || dc == 0L) 3L else 4L)
    val cells = classed.localCheckpoint()
    val present = cells.select("r", "c")
    var best = cells.filter(col("cls") === 4 || col("cls") === 0)
      .select(col("r"), col("c"), col("cls").as("seed"), lit(0L).as("d"))
    for (_ <- 1 to k) {
      best = best
        .select(col("r"), col("c"), col("seed"), col("d"),
          explode(typedLit(offs)).as("o"))
        .select((col("r") + col("o._1")).as("r"),
          (col("c") + col("o._2")).as("c"), col("seed"),
          (col("d") + col("o._3")).as("d"))
        .filter(col("r").between(0, GridW - 1) &&
          col("c").between(0, GridW - 1))
        .join(broadcast(present), Seq("r", "c"), "left_semi")
        .groupBy("r", "c", "seed").agg(min("d").as("d"))
    }
    val both = withConfs(spark, relaxConfs) {
      best.localCheckpoint()
    }
    both.groupBy("r", "c")
      .agg(min(when(col("seed") === 4, col("d"))).as("cost_a"),
           min(when(col("seed") === 0, col("d"))).as("cost_b"))
      .filter(col("cost_a").isNotNull && col("cost_b").isNotNull)
      .select(col("r"), col("c"), col("cost_a"), col("cost_b"),
        (col("cost_a") + col("cost_b")).as("total34"))
  }

  /** GIS15 — CURVATURE (Esri Curvature / Zevenbergen-Thorne 1987 —
    * the second-derivative Surface op; slope is the first): per
    * complete-neighborhood cell the three second differences of the
    * quantity surface,
    *   d2x  = z_W − 2·z_C + z_E            (east-west concavity),
    *   d2y  = z_N − 2·z_C + z_S            (north-south),
    *   dxy4 = −z_NW + z_NE + z_SW − z_SE   (4× the cross term),
    * emitted UNDIVIDED in cents (the 1/cellsize² factors are monotone
    * post-scales; dividing would put floats in the gate), plus the
    * Laplacian concavity class sign(d2x + d2y) ∈ {−1, 0, 1} — Esri's
    * convex/flat/concave classing. Same contribute-to-neighbors shape
    * as GIS1/GIS4 with per-offset weight TRIPLES; one map-side-
    * combined aggregate, raster-domain bounded. */
  def curvature(spark: SparkSession, dir: String): DataFrame = {
    // weights the TARGET sees from a source at offset (−dr, −dc):
    // wx: E/W neighbors +1, center −2 | wy: N/S +1, center −2
    // wxy: corners −(−1)^... : NW/SE −1, NE/SW +1
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L } yield {
      val (nr, nc) = (-dr, -dc)
      val wx = if (nr == 0L && nc != 0L) 1L
               else if (nr == 0L && nc == 0L) -2L else 0L
      val wy = if (nc == 0L && nr != 0L) 1L
               else if (nr == 0L && nc == 0L) -2L else 0L
      val wxy = if (nr != 0L && nc != 0L) -nr * nc else 0L
      (dr, dc, wx, wy, wxy)
    }
    perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .select(col("r"), col("c"), col("cents"),
        explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"), (col("c") + col("o._2")).as("c"),
        (col("cents") * col("o._3")).as("xc"),
        (col("cents") * col("o._4")).as("yc"),
        (col("cents") * col("o._5")).as("xyc"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .groupBy("r", "c")
      .agg(sum("xc").as("d2x"), sum("yc").as("d2y"),
        sum("xyc").as("dxy4"), count(lit(1)).as("n"))
      .filter(col("n") === 9)
      .select(col("r"), col("c"), col("d2x"), col("d2y"), col("dxy4"),
        signum(col("d2x") + col("d2y")).cast("int").as("concavity"))
  }

  /** GIS16 — VIEWSHED (Esri Viewshed, single observer at grid center
    * (50,50)): a cell is visible iff its elevation angle from the
    * observer exceeds every NEARER cell's angle on the SAME ray.
    * Spark-first decomposition: cells group into rays by their
    * PRIMITIVE direction vector (dr, dc)/g — g = gcd via a bounded
    * sequence-filter expression (no UDF; divisors ≤ 99), written
    * IDENTICALLY in both engines — and along a ray the true distance
    * is g·|unit|, so |unit| cancels and the angle order is exactly
    * p/g (p = cents − observer cents): ONE division per cell, and
    * identical int64 inputs give the identical binary64 quotient in
    * every IEEE engine — the comparison is deterministic without any
    * accumulation-order hazard (the float-policy exception the d3
    * cosine rounding established, but exact here). Visibility = one
    * running-max window per ray (order by g, strict >: ties block the
    * farther cell). NoData cells neither block nor appear — the
    * documented sparse-raster contract (Esri interpolates; classes
    * must not be, pyt:25/606/823). One exchange: the ray window. */
  def viewshed(spark: SparkSession, dir: String): DataFrame = {
    val cells = perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .cache()
    val obs = cells.filter(col("r") === 50 && col("c") === 50)
      .select(col("cents").as("z0"))
    val gExpr = expr("""array_max(filter(sequence(1, 99),
      k -> abs(r - 50) % k = 0 AND abs(c - 50) % k = 0))""")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("udr", "udc").orderBy("g")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    cells.filter(col("r") =!= 50 || col("c") =!= 50)
      .crossJoin(broadcast(obs))
      .withColumn("g", gExpr)
      .select(col("r"), col("c"),
        expr("(r - 50) div g").as("udr"),
        expr("(c - 50) div g").as("udc"),
        col("g"),
        ((col("cents") - col("z0")).cast("double") / col("g")).as("ang"))
      .withColumn("vis",
        (col("ang") > coalesce(max("ang").over(w),
          lit(Double.NegativeInfinity))).cast("int"))
      .select(col("r"), col("c"), col("g").cast("long").as("m"),
        col("vis"))
  }

  /** GIS14 — WATERSHED labeling (Esri Watershed: which outlet does
    * each cell drain to?) by POINTER DOUBLING over the D8 flow
    * pointers — the log-rounds functional-graph primitive GIS9's
    * linear frontier walk doesn't exercise: p₀ = next (with SINKS —
    * cells with no D8 code, i.e. the grid/NoData boundary — made
    * SELF-LOOPS), then k squarings give next^(2^k); after 4 rounds
    * every cell ≤16 hops from its outlet holds that outlet, in FOUR
    * raster-domain joins instead of sixteen (at 100 TB the doubling
    * count is the log of the longest drainage path — 40 rounds cover
    * 2^40 cells of relief). Cells whose 16-hop target is NOT a sink
    * stay unlabeled (absent): mid-path cells on longer drains and the
    * pit-pair 2-cycles [[flowDirection]]'s least-bad-neighbor rule
    * admits (fill's job, GIS9's documented stance). The oracle walks
    * the SAME 16 steps linearly — next^16 computed two different
    * ways must agree cell-for-cell. */
  def watershed(spark: SparkSession, dir: String, doublings: Int = 4)
      : DataFrame = {
    val code2dr = expr("""CASE d8 WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 4 THEN 1
      WHEN 8 THEN 1 WHEN 16 THEN 0 WHEN 32 THEN -1 WHEN 64 THEN -1
      ELSE -1 END""")
    val code2dc = expr("""CASE d8 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 4 THEN 0
      WHEN 8 THEN -1 WHEN 16 THEN -1 WHEN 32 THEN -1 WHEN 64 THEN 0
      ELSE 1 END""")
    val e = flowDirection(spark, dir)
      .select((col("r") * 100 + col("c")).as("u"),
        ((col("r") + code2dr) * 100 + (col("c") + code2dc)).as("v"))
    val cells = perCell(spark, dir)
      .select((expr("cell_id div 100") * 100 + col("cell_id") % 100)
        .as("u"))
    var p = cells.join(e, Seq("u"), "left")
      .select(col("u"), coalesce(col("v"), col("u")).as("v"))
      .localCheckpoint()
    val sinks = p.filter(col("u") === col("v")).select(col("u").as("s"))
      .localCheckpoint()
    // doubling loop under relaxConfs (raster-domain bounded, the
    // costDistanceFrom discipline): each squaring checkpoint becomes
    // one job at domain-sized partitions. The initial pointer-table
    // checkpoint above stays outside — it joins the fact-scale scan.
    withConfs(spark, relaxConfs) {
      for (_ <- 1 to doublings) {
        p = p.join(p.select(col("u").as("m"), col("v").as("w")),
            col("v") === col("m"))
          .select(col("u"), col("w").as("v"))
          .localCheckpoint()
      }
      p
    }
    // the sink set is boundary-sized (≤ the raster frontier) —
    // broadcast it so the final label filter never exchanges
    p.join(broadcast(sinks), col("v") === col("s"), "left_semi")
      .select(expr("u div 100").as("r"), (col("u") % 100).as("c"),
        expr("v div 100").as("ws_r"), (col("v") % 100).as("ws_c"))
  }

  /** GIS28 — FLOW LENGTH (Esri Flow Length, downstream: the
    * chamfer-weighted distance each cell travels along its D8 path to
    * its outlet) by POINTER DOUBLING WITH AN ADDITIVE PAYLOAD — the
    * GIS14 machinery generalized from labels to aggregates: the
    * pointer table carries (next, dist); squaring composes both,
    *   p²(u) = (p(p(u).v).v, p(u).d + p(p(u).v).d),
    * and sinks are 0-distance self-loops (absorbing, so the sum stops
    * growing at the outlet). Four squarings give the ≤16-hop path
    * distance in FOUR raster-domain joins — at 100 TB, log(longest
    * drainage path) rounds, the same reason GIS14 scales, now proven
    * for a non-idempotent (summing) composition. Step weights are the
    * GIS11 chamfer 3/4; cells whose 16-hop target is NOT a sink stay
    * honestly unlabeled (the GIS14 contract). The oracle walks the
    * SAME 16 steps LINEARLY, accumulating — sum-over-path computed
    * two structurally different ways must agree cell-for-cell. */
  def flowLength(spark: SparkSession, dir: String, doublings: Int = 4)
      : DataFrame = {
    val code2dr = expr("""CASE d8 WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 4 THEN 1
      WHEN 8 THEN 1 WHEN 16 THEN 0 WHEN 32 THEN -1 WHEN 64 THEN -1
      ELSE -1 END""")
    val code2dc = expr("""CASE d8 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 4 THEN 0
      WHEN 8 THEN -1 WHEN 16 THEN -1 WHEN 32 THEN -1 WHEN 64 THEN 0
      ELSE 1 END""")
    val stepW = expr("""CASE WHEN d8 IN (1, 4, 16, 64) THEN 3 ELSE 4 END""")
    val e = flowDirection(spark, dir)
      .select((col("r") * 100 + col("c")).as("u"),
        ((col("r") + code2dr) * 100 + (col("c") + code2dc)).as("v"),
        stepW.cast("long").as("d"))
    val cells = perCell(spark, dir)
      .select((expr("cell_id div 100") * 100 + col("cell_id") % 100)
        .as("u"))
    var p = cells.join(e, Seq("u"), "left")
      .select(col("u"), coalesce(col("v"), col("u")).as("v"),
        coalesce(col("d"), lit(0L)).as("d"))
      .localCheckpoint()
    val sinks = p.filter(col("u") === col("v")).select(col("u").as("s"))
      .localCheckpoint()
    // doubling loop under relaxConfs — same rationale as [[watershed]].
    withConfs(spark, relaxConfs) {
      for (_ <- 1 to doublings) {
        p = p.join(p.select(col("u").as("m"), col("v").as("w"),
            col("d").as("d2")), col("v") === col("m"))
          .select(col("u"), col("w").as("v"), (col("d") + col("d2")).as("d"))
          .localCheckpoint()
      }
      p
    }
    p.join(broadcast(sinks), col("v") === col("s"), "left_semi")
      .select(expr("u div 100").as("r"), (col("u") % 100).as("c"),
        col("d").as("len34"))
  }

  /** GIS7 — POLYGON zonal statistics (Esri Zonal Statistics with
    * FEATURE zones — GIS2's zones were raster classes; real zone data
    * is vector polygons): per polygon, the count and exact-cents sum
    * of the raster cells inside it. Point-in-polygon is the classic
    * even-odd ray cast in EXACT INTEGER arithmetic: edge (a, b)
    * crosses the +x ray from (px, py) iff (a.y > py) ≠ (b.y > py) and
    * px lies left of the edge's x at py — the division-free
    * cross-multiplied form (px−a.x)·(b.y−a.y) ≶ (py−a.y)·(b.x−a.x),
    * sign-flipped by edge direction (PNPOLY's integer twin; boundary
    * cells follow the strict-inequality convention, identical in both
    * engines because the arithmetic is). Concave polygons work by
    * construction — P3 is an L. The crossing count folds in ONE
    * higher-order aggregate over the vertex array (no edge explode,
    * no shuffle at cell grain beyond perCell's own); the 6-polygon dim
    * broadcasts, bbox-prefiltered (a pure pruning step: cells outside
    * the bbox have even parity by construction). At real feature
    * counts the j18 tile-replication join replaces the broadcast —
    * same refine predicate. */
  /** The GIS7 zone features — shared by the operator (vertex arrays)
    * and its oracle (pre-expanded edge VALUES). */
  private val polys: Seq[(Int, Seq[(Long, Long)])] = Seq(
    1 -> Seq((10L, 10L), (30L, 10L), (30L, 30L), (10L, 30L)),
    2 -> Seq((50L, 20L), (80L, 20L), (65L, 45L)),
    3 -> Seq((10L, 60L), (40L, 60L), (40L, 75L), (25L, 75L),
             (25L, 90L), (10L, 90L)),        // concave L
    4 -> Seq((70L, 60L), (85L, 75L), (70L, 90L), (55L, 75L)),
    5 -> Seq((0L, 0L), (99L, 1L), (99L, 3L), (0L, 2L)), // thin sliver
    6 -> Seq((20L, 40L), (60L, 35L), (90L, 50L), (55L, 95L), (15L, 80L)))

  def polygonZonal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val polyDf = polys.map { case (id, vs) =>
      (id, vs, vs.map(_._1).min, vs.map(_._1).max,
       vs.map(_._2).min, vs.map(_._2).max) }
      .toDF("poly_id", "vs0", "x_lo", "x_hi", "y_lo", "y_hi")
      .select(col("poly_id"),
        expr("transform(vs0, p -> struct(p._1 AS x, p._2 AS y))").as("vs"),
        col("x_lo"), col("x_hi"), col("y_lo"), col("y_hi"))
    val cells = perCell(spark, dir)
      .select((col("cell_id") % GridW).as("px"),
        expr("cell_id div 100").as("py"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val crossings = expr("""
      aggregate(sequence(1, size(vs)), 0, (acc, i) -> acc + (
        CASE WHEN (element_at(vs, i).y > py) !=
                  (element_at(vs, 1 + i % size(vs)).y > py)
             THEN CASE WHEN element_at(vs, 1 + i % size(vs)).y >
                            element_at(vs, i).y
               THEN CASE WHEN (px - element_at(vs, i).x) *
                  (element_at(vs, 1 + i % size(vs)).y - element_at(vs, i).y)
                  < (py - element_at(vs, i).y) *
                  (element_at(vs, 1 + i % size(vs)).x - element_at(vs, i).x)
                  THEN 1 ELSE 0 END
               ELSE CASE WHEN (px - element_at(vs, i).x) *
                  (element_at(vs, 1 + i % size(vs)).y - element_at(vs, i).y)
                  > (py - element_at(vs, i).y) *
                  (element_at(vs, 1 + i % size(vs)).x - element_at(vs, i).x)
                  THEN 1 ELSE 0 END END
             ELSE 0 END))""")
    cells.join(broadcast(polyDf),
        col("px").between(col("x_lo"), col("x_hi")) &&
        col("py").between(col("y_lo"), col("y_hi")))
      .withColumn("k", crossings)
      .filter(col("k") % 2 === 1)
      .groupBy("poly_id")
      .agg(count(lit(1)).as("n_cells"), sum(col("cents")).as("sum_cents"))
  }

  /** GIS5 — CLASS-BOUNDARY detection over the classified raster (the
    * Esri Boundary-Clean/Contour family's core predicate, and the
    * classed-surface operation the reference's no-interpolation rule
    * pyt:25/606/823 exists to protect): a present cell is a boundary
    * cell iff any 4-neighbor carries a DIFFERENT class, classes = the
    * a9/zonal gate-proven equal-interval binning of the quantity
    * layer. Same contribute-to-neighbors shape as GIS1/GIS4 with a
    * 5-point (von Neumann) stencil: each classed cell fans out to the
    * ≤5 targets it informs, tagged is_self on its own cell; targets
    * without a self contribution are NoData and drop (absent neighbors
    * simply don't vote — a boundary against NoData is not a class
    * boundary, the documented contract). One map-side-combined
    * aggregate; min≠max over contributed classes IS the
    * any-different predicate — no pairwise neighbor comparison
    * materializes. Exchange bounded by the raster domain. */
  def classBoundaries(spark: SparkSession, dir: String): DataFrame = {
    // cached: the bounded ≤10k-cell aggregate feeds both the stats leg
    // and the classing leg (the zonal multi-leg policy)
    val cs = perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        col("quantity").cast("double").as("q"))
      .cache()
    val stats = cs.agg(min("q").as("mn"), max("q").as("mx"))
    val classed = cs.crossJoin(broadcast(stats))
      .select(col("r"), col("c"),
        least(floor((col("q") - col("mn")) /
                    ((col("mx") - col("mn")) / lit(5.0))), lit(4))
          .cast("int").as("cls"))
    val offs = Seq((0L, 0L, 1), (-1L, 0L, 0), (1L, 0L, 0),
      (0L, -1L, 0), (0L, 1L, 0))
    classed.select(col("r"), col("c"), col("cls"),
        explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"), (col("c") + col("o._2")).as("c"),
        col("cls"), col("o._3").as("is_self"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .groupBy("r", "c")
      .agg(max(col("is_self")).as("self_present"),
           min(when(col("is_self") === 1, col("cls"))).as("own_cls"),
           min(col("cls")).as("mn_cls"), max(col("cls")).as("mx_cls"))
      .filter(col("self_present") === 1)
      .select(col("r"), col("c"), col("own_cls").as("cls"),
        (col("mn_cls") =!= col("mx_cls")).cast("int").as("is_boundary"))
  }

  /** GIS22 — TOPOGRAPHIC WETNESS INDEX (Beven-Kirkby 1979 — the
    * hydrology composite Esri documents as Ln(flow-accumulation /
    * tan(slope)); the capstone of the D8 trio: direction → accumulation
    * → wetness): per complete-neighborhood cell, the specific
    * catchment proxy a = 1 + n_upstream (GIS9's ≤10-hop distinct
    * origin count; cells off the drainage graph get a = 1) over the
    * gradient magnitude (GIS4's exact integers). TWI is monotone in
    * a²/|∇z|², so the CLASS — wet = #{t ∈ {10⁴,10⁵,10⁶} :
    * a²·10⁶ ≥ t·g2}, g2 = gx²+gy² — needs neither ln, sqrt, nor
    * division: BIGINT cross-multiplies only (a ≤ 10⁴, a²·10⁶ ≤ 10¹⁴;
    * g2 ≤ 3.4·10⁹, ·10⁶ ≤ 3.4·10¹⁵ — int64-safe). Flat complete
    * neighborhoods (g2 = 0) class maximally wet, the standard TWI
    * convention. Emitted: (r, c, a, g2, wet_class) — a and g2 exact,
    * the class the only derived value. Shape: the two proven subplans
    * joined once on (r, c), both raster-domain bounded; at 100 TB the
    * join co-partitions on the cell key both sides already carry. */
  def twi(spark: SparkSession, dir: String): DataFrame = {
    val a = coalesce(col("n_upstream"), lit(0L)) + 1
    val g2 = col("gx") * col("gx") + col("gy") * col("gy")
    val wet = (a * a * 1000000L >= g2 * 10000L).cast("int") +
      (a * a * 1000000L >= g2 * 100000L).cast("int") +
      (a * a * 1000000L >= g2 * 1000000L).cast("int")
    slope(spark, dir)
      .join(flowAccumulation(spark, dir), Seq("r", "c"), "left")
      .select(col("r"), col("c"), a.as("a"), g2.as("g2"),
        wet.as("wet_class"))
  }

  /** GIS24 — COMBINE (Esri Combine, the Local toolset's multi-raster
    * tool: assign a unique id to every distinct COMBINATION of input
    * class values and emit the combination raster + its attribute
    * table): all three layers classed equal-interval (the a9/GIS2
    * gate-proven break formula, per-layer stats from the same cached
    * per-cell aggregate), then each distinct (cq, cp, cd) triple gets
    * a dense id — Esri ids by first-scan order, which is
    * nondeterministic under parallel scan, so the deterministic twin
    * ids by the triple's sort order (dense_rank over the DISTINCT
    * combination set: ≤125 rows, window cost bounded by the class
    * domain, never the raster). The id table broadcasts back onto the
    * cells. Emits (r, c, cq, cp, cd, combo_id, combo_n) — raster and
    * attribute-table join in one frame. */
  def combine(spark: SparkSession, dir: String): DataFrame = {
    val pc = perCell(spark, dir).cache()
    val aggs = layers.flatMap { case (name, _, _) =>
      Seq(min(col(name)).as(s"mn_$name"), max(col(name)).as(s"mx_$name")) }
    val stats = pc.agg(aggs.head, aggs.tail: _*)
    def cls(name: String) =
      least(floor((col(name) - col(s"mn_$name")) /
        ((col(s"mx_$name") - col(s"mn_$name")) / lit(5.0))), lit(4))
        .cast("int")
    val classed = pc.crossJoin(broadcast(stats))
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        cls("quantity").as("cq"), cls("extendedprice").as("cp"),
        cls("discount").as("cd"))
    val combos = classed.groupBy("cq", "cp", "cd")
      .agg(count(lit(1)).as("combo_n"))
      .withColumn("combo_id", dense_rank().over(
        org.apache.spark.sql.expressions.Window
          .orderBy("cq", "cp", "cd")).cast("long"))
    classed.join(broadcast(combos), Seq("cq", "cp", "cd"))
      .select("r", "c", "cq", "cp", "cd", "combo_id", "combo_n")
  }

  /** GIS25 — EXPAND (Esri Expand, the Generalization toolset's
    * morphological dilation: the chosen zone grows into its
    * neighbors): class-4 cells (the GIS11 source class) expand by one
    * cell — a present cell's out class is 4 iff ANY cell in its 3×3
    * neighborhood carries class 4, else its own class. NoData cells
    * neither receive nor transmit (absent cells stay absent — Esri's
    * contract). One contribute-to-neighbors fan-out with the self tag
    * riding the same rows (the GIS10 shape): max(is4) over
    * contributions is the any-predicate, no pairwise comparison
    * materializes. */
  def expand(spark: SparkSession, dir: String): DataFrame = {
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L }
      yield (dr, dc, if (dr == 0L && dc == 0L) 1 else 0)
    classedGrid(spark, dir)
      .select(col("r"), col("c"), col("cls"), explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"), (col("c") + col("o._2")).as("c"),
        col("cls"), col("o._3").as("self"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .groupBy("r", "c")
      .agg(max(when(col("self") === 1, col("cls"))).as("own_cls"),
        max(when(col("cls") === 4, 1).otherwise(0)).as("any4"),
        max("self").as("present"))
      .filter(col("present") === 1)
      .select(col("r"), col("c"), col("own_cls"),
        when(col("any4") === 1, lit(4)).otherwise(col("own_cls"))
          .as("out_cls"))
  }

  /** GIS26 — ZONAL GEOMETRY (Esri Zonal Geometry: area, centroid,
    * extent per zone) over GIS17's converged regions — the proof that
    * region labels are USEFUL downstream, not just correct: per
    * region, the cell count (area in cells), the EXACT centroid
    * numerators (sum_r, sum_c — centroid = sums/n is the caller's
    * monotone post-divide, the no-division-in-gate policy), and the
    * bounding extent. One keyed aggregate over the labeled grid; at
    * 100 TB it co-partitions on the region key the labeling already
    * produced. */
  def zonalGeometry(spark: SparkSession, dir: String): DataFrame =
    regionGroup(spark, dir)
      .groupBy("cls", "reg_r", "reg_c")
      .agg(count(lit(1)).as("n_cells"),
        sum("r").as("sum_r"), sum("c").as("sum_c"),
        min("r").as("min_r"), max("r").as("max_r"),
        min("c").as("min_c"), max("c").as("max_c"))

  /** The exact-units grid shared by the spatial-statistics gates
    * (GIS17–GIS19): quantity is integral 1..50 in every fixture
    * generation (verified at all SFs), so the per-cell max casts to
    * BIGINT losslessly and every downstream moment/deviation product
    * stays in exact int64 range (bounds documented per operator). */
  private def unitsGrid(spark: SparkSession, dir: String): DataFrame =
    perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        col("quantity").cast("long").as("u"))

  /** GIS18 — global MORAN'S I components (the spatial-autocorrelation
    * statistic; Esri Spatial Autocorrelation / Global Moran's I tool):
    * with rook (4-neighbor) binary weights over PRESENT cells,
    *   I = (N / W) · Σ_ij w_ij·dev_i·dev_j / Σ_i dev_i²,
    * dev_i = x_i − x̄. Emitted UNDIVIDED as the four exact integers
    * (n_cells, w_pairs, num, den) with deviations at the N-scale —
    * dev_i := N·x_i − Σx, an integer, which multiplies I's numerator
    * and denominator by the same N² and cancels — so no division or
    * float mean ever enters the gate. Bounds: units ≤ 50, N ≤ 10⁴ ⇒
    * |dev| ≤ 5·10⁵, |dev_i·dev_j| ≤ 2.5·10¹¹, summed over ≤ 4·10⁴
    * directed rook pairs ≤ 10¹⁶ — int64-safe. Shape: one broadcast of
    * the 1-row moment table, one 4-offset fan-out joined back to the
    * deviation grid (raster-domain bounded), three scalar aggregates.
    * At 100 TB the pair join is a tiled halo exchange; nothing is
    * all-pairs — W is linear in cells, not quadratic. */
  def moran(spark: SparkSession, dir: String): DataFrame = {
    val g = unitsGrid(spark, dir).cache()
    val t = g.agg(count(lit(1)).as("n"), sum("u").as("s"))
    val d = g.crossJoin(broadcast(t))
      .select(col("r"), col("c"),
        (col("n") * col("u") - col("s")).as("dev"), col("n"))
      .localCheckpoint()
    val offs = Seq((0L, 1L), (0L, -1L), (1L, 0L), (-1L, 0L))
    val pairs = d
      .select(col("r"), col("c"), col("dev").as("da"),
        explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"),
        (col("c") + col("o._2")).as("c"), col("da"))
      .join(d.select(col("r"), col("c"), col("dev").as("db")), Seq("r", "c"))
      .agg(count(lit(1)).as("w_pairs"), sum(col("da") * col("db")).as("num"))
    val den = d.agg(sum(col("dev") * col("dev")).as("den"))
    d.select(col("n")).limit(1)
      .crossJoin(broadcast(pairs)).crossJoin(broadcast(den))
      .select(col("n").as("n_cells"), col("w_pairs"), col("num"), col("den"))
  }

  /** GIS19 — GETIS-ORD Gi* hot-spot classing (Esri Hot Spot Analysis):
    * per present cell, the z-score of its 3×3 focal sum (self included
    * — the * in Gi*) against the global distribution,
    *   z = (Σ_j x_j − x̄·n_k) / (S·√[(N·n_k − n_k²)/(N−1)]),
    * classed into integer sigma bands: gi_class = sign(num)·k, k = the
    * largest of {1,2,3} with z² ≥ k² (0 when |z| < 1). The entire
    * decision is division- and sqrt-free by cross-multiplying:
    *   num = N·local − n_k·Σx   (the N-scaled numerator),
    *   den = N·Σx² − (Σx)²     (N²·S² up to the same scale),
    *   z² ≥ k²  ⟺  num²·(N−1) ≥ k²·den·(N·n_k − n_k²),
    * all BIGINT (num² ≤ 2.1·10¹³, ×(N−1) ≤ 2.1·10¹⁷; rhs ≤ 2·10¹⁷ at
    * k=3 — int64-safe), identical arithmetic in the oracle. Shape: the
    * GIS1 contribute-to-neighbors fan-out for the focal sum (3×3, self
    * included), one broadcast 1-row moment table, one projection. At
    * 100 TB: tiled halo exchange, raster-domain bounded. */
  def giStar(spark: SparkSession, dir: String): DataFrame = {
    val g = unitsGrid(spark, dir).cache()
    val t = g.agg(count(lit(1)).as("n"), sum("u").as("s"),
      sum(col("u") * col("u")).as("ss"))
    val offs = for { dr <- -1L to 1L; dc <- -1L to 1L } yield (dr, dc)
    val focal = g
      .select(col("r"), col("c"), col("u"), explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"),
        (col("c") + col("o._2")).as("c"), col("u"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .groupBy("r", "c")
      .agg(sum("u").as("local"), count(lit(1)).as("nk"))
      // only PRESENT cells get a Gi* (semi join against the cached grid)
      .join(g.select("r", "c"), Seq("r", "c"), "left_semi")
    val num = col("n") * col("local") - col("nk") * col("s")
    val den = col("n") * col("ss") - col("s") * col("s")
    val lhs = num * num * (col("n") - 1)
    val rhs = den * (col("n") * col("nk") - col("nk") * col("nk"))
    focal.crossJoin(broadcast(t))
      .select(col("r"), col("c"),
        (signum(num).cast("long") *
          when(lhs >= rhs * 9L, 3L).when(lhs >= rhs * 4L, 2L)
            .when(lhs >= rhs, 1L).otherwise(0L)).cast("int").as("gi_class"))
  }

  /** GIS20 — IDW interpolation (Esri IDW, Spatial Analyst's
    * inverse-distance-weighted surface tool) at the grid's ABSENT
    * cells — the one Surface op whose output domain is the NoData
    * complement: each absent in-grid cell takes the weighted mean of
    * the present cells within Chebyshev radius 2, weight 1/d². The
    * classic IDW division is kept OUT of the gate by two exact moves:
    * (a) d² over the 24-offset neighborhood only takes values
    * {1,2,4,5,8}, whose lcm-scaled weights 40/d² = {40,20,10,8,5} are
    * integers; (b) the result is emitted as the exact pair
    * (num40 = Σ cents·40/d², den40 = Σ 40/d²) — num40/den40 is the
    * IDW value, a monotone post-divide. Cells with NO present
    * neighbor in radius 2 stay NoData (absent), Esri's search-radius
    * contract. Shape: present cells fan out to their 24 targets
    * (raster-domain bounded), one anti-join against the present set
    * keeps interpolation strictly on NoData ground, one aggregate. */
  def idw(spark: SparkSession, dir: String): DataFrame = {
    val g = perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .cache()
    val offs = for {
      dr <- -2L to 2L; dc <- -2L to 2L; if dr != 0 || dc != 0
    } yield (dr, dc, 40L / (dr * dr + dc * dc))
    g.select(col("r"), col("c"), col("cents"),
        explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"),
        (col("c") + col("o._2")).as("c"),
        (col("cents") * col("o._3")).as("wc"), col("o._3").as("w"))
      .filter(col("r").between(0, GridW - 1) && col("c").between(0, GridW - 1))
      .join(g.select("r", "c"), Seq("r", "c"), "left_anti")
      .groupBy("r", "c")
      .agg(sum("wc").as("num40"), sum("w").as("den40"))
  }

  /** GIS21 — BILINEAR resampling (Esri Resample BILINEAR — the
    * continuous-data sibling of GIS3's nearest-neighbor; the reference
    * forbids it for classed rasters pyt:25/606/823, which is exactly
    * why it must exist for VALUE rasters): the 25×25 output grid
    * samples the input at (4R+1.25, 4C+1.25) — deliberately off the
    * cell lattice so all four corner weights are non-trivial — from
    * corners (4R+1..2, 4C+1..2) with per-axis weights (¾, ¼). In
    * 16ths the 2-D weights are the integers {9,3,3,1} and the output
    * is the exact BIGINT v16 = Σ corner_cents·w16. Only complete
    * 4-corner neighborhoods emit (the GIS4 NoData discipline —
    * interpolating past NoData is implementation-defined). Shape:
    * each input cell plays ≤4 corner ROLES, each mapping it to at
    * most one output cell by integer divisibility — a 4-row fan-out,
    * one aggregate, no join at all. */
  def resampleBilinear(spark: SparkSession, dir: String): DataFrame = {
    // role (i, j): the cell acts as corner (4R+1+i, 4C+1+j); weight
    // (3−2i)·(3−2j) sixteenths
    val roles = for { i <- 0L to 1L; j <- 0L to 1L }
      yield (i, j, (3 - 2 * i) * (3 - 2 * j))
    perCell(spark, dir)
      .select(expr("cell_id div 100").as("r"), (col("cell_id") % GridW).as("c"),
        (col("quantity").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .select(col("r"), col("c"), col("cents"),
        explode(typedLit(roles)).as("o"))
      .filter((col("r") - 1 - col("o._1")) % 4 === 0 &&
              (col("c") - 1 - col("o._2")) % 4 === 0)
      .select(expr("(r - 1 - o._1) div 4").as("out_r"),
        expr("(c - 1 - o._2) div 4").as("out_c"),
        (col("cents") * col("o._3")).as("wc"))
      .filter(col("out_r").between(0, 24) && col("out_c").between(0, 24))
      .groupBy("out_r", "out_c")
      .agg(sum("wc").as("v16"), count(lit(1)).as("n"))
      .filter(col("n") === 4)
      .select("out_r", "out_c", "v16")
  }

  /** GIS17 — REGION GROUP (Esri Region Group: label each cell with its
    * connected region of same-class cells, rook connectivity) — the
    * raster face of connected components, run to TRUE CONVERGENCE via
    * [[graft.llm.Dedup.dedupClusters]]'s pointer-jumping min-label
    * loop (O(log diameter) rounds — the d2 closure machinery reused on
    * the grid graph, which is the point: one CC primitive serves both
    * the dedup pipeline and the raster toolbox). Classes are u mod 7 —
    * balanced at GATE SF (~6 draws/cell keeps the max-quantity spread
    * wide, regions small, and the oracle's full reachability closure
    * tractable), but NOT at larger SFs: max-of-60 concentrates u at
    * 50, one class reaches ~70% density — above the ~0.59 site-
    * percolation threshold — and a 7k-cell diameter-~150 giant
    * component forms at sf0.1. That component is exactly the stressor
    * that forced [[Dedup.dedupClusters]] onto quotient hooking (see
    * its scaladoc); the operator handles it in 5 rounds. Region id
    * = min packed key (r·100+c) in the component, Esri's
    * smallest-cell-id labeling made deterministic. Isolated cells
    * (no same-class rook neighbor) are their own region via the
    * left-join coalesce — they never enter the edge set at all.
    * Shape: one rook fan-out join builds the (undirected-once) edge
    * set; the CC loop is per-round one keyed join+aggregate; one
    * final left join attaches labels. All raster-domain bounded. */
  def regionGroup(spark: SparkSession, dir: String): DataFrame = {
    val g = unitsGrid(spark, dir)
      .select(col("r"), col("c"), (col("u") % 7).as("cls"),
        (col("r") * 100 + col("c")).as("k"))
      .localCheckpoint()
    // undirected-once edges: each cell pairs with its E and S same-class
    // neighbors (covers all rook adjacencies exactly once)
    val offs = Seq((0L, 1L), (1L, 0L))
    val edges = g
      .select(col("r"), col("c"), col("cls").as("cls_a"), col("k").as("ka"),
        explode(typedLit(offs)).as("o"))
      .select((col("r") + col("o._1")).as("r"),
        (col("c") + col("o._2")).as("c"), col("cls_a"), col("ka"))
      .join(g.select(col("r"), col("c"), col("cls").as("cls_b"),
        col("k").as("kb")), Seq("r", "c"))
      .filter(col("cls_a") === col("cls_b"))
      .select("ka", "kb")
    val labels = graft.llm.Dedup.dedupClusters(edges, col("ka"), col("kb"))
    g.join(labels.withColumnRenamed("doc_id", "k"), Seq("k"), "left")
      .select(col("r"), col("c"), col("cls"),
        coalesce(col("cluster_id"), col("k")).as("reg"))
      .select(col("r"), col("c"), col("cls"),
        expr("reg div 100").as("reg_r"), (col("reg") % 100).as("reg_c"))
  }

  /** R2 (pyt:710-745): the layer-filter chain — keep rasters, optionally
    * visible only, never mosaic/web/datasource-less layers, skip names
    * containing \\Boundary / \\Footprint / \\Image, first-wins dedup by
    * name. Faithful quirk: the reference tests `longName.find(x) > 0`,
    * so a match at position 0 (long name STARTING with \\Boundary) is
    * kept — expressed as locate(...) <= 1. Dedup is row_number over the
    * layer order (the reference keeps the first encountered), not
    * dropDuplicates, which picks an arbitrary row per key. */
  def layerFilter(layers: DataFrame, visibleOnly: Boolean): DataFrame = {
    def skip(pat: String) = locate("\\" + pat, col("long_name")) <= 1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("name").orderBy("layer_id")
    layers
      .filter(col("is_raster") &&
        (!lit(visibleOnly) || col("visible")) &&
        // null dataset_type is KEPT: the reference only rejects when the
        // Describe object has a datasetType attribute (pyt:721-724)
        coalesce(col("dataset_type") =!= "MosaicDataset", lit(true)) &&
        !col("is_web") && col("datasource").isNotNull &&
        skip("Boundary") && skip("Footprint") && skip("Image"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** R2 as a declared query over a golden layer table covering every
    * rejection reason plus the position-0 quirk and a duplicate name. */
  def layerFilterGolden(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val layers = Seq(
      (1L, "elev", "grp\\elev", true, true, false, "RasterDataset", "d1"),
      (2L, "table1", "grp\\table1", false, true, false, "Table", "d2"),
      (3L, "hidden", "grp\\hidden", true, false, false, "RasterDataset", "d3"),
      (4L, "mosaic1", "grp\\mosaic1", true, true, false, "MosaicDataset", "d4"),
      (5L, "web1", "grp\\web1", true, true, true, "RasterDataset", "d5"),
      (6L, "nods", "grp\\nods", true, true, false, "RasterDataset", null),
      (7L, "bnd", "grp\\Boundary\\bnd", true, true, false, "RasterDataset", "d7"),
      (8L, "bndstart", "\\Boundary\\c", true, true, false, "RasterDataset", "d8"),
      (9L, "elev", "grp2\\elev", true, true, false, "RasterDataset", "d9"),
      (10L, "slope", "grp\\slope", true, true, false, "RasterDataset", "d10"),
      (11L, "notype", "grp\\notype", true, true, false, null, "d11"))
      .toDF("layer_id", "name", "long_name", "is_raster", "visible",
            "is_web", "dataset_type", "datasource")
    layerFilter(layers, visibleOnly = true)
      .select("layer_id", "name", "long_name")
  }

  /** F9/J6-phase-2 (SURVEY §7.4) as a declared query: the remap kernel
    * WITHOUT a range join — per-layer sorted bounds + outs arrays ride a
    * tiny broadcast, and the codegen'd [[graft.functions.RangeRemap]]
    * binary-searches them inside whole-stage codegen. Result is identical
    * to the join-based remap (the flagship path) by construction. */
  def remapExpr(spark: SparkSession, dir: String): DataFrame = {
    val cs = cellsFrom(perCell(spark, dir).cache())
    val dim = catalogFrom(cs).select(
      col("layer"),
      concat(transform(col("ranges"), r => r("lo")),
             array(element_at(col("ranges"), -1)("hi"))).as("bounds"),
      transform(col("ranges"), r => r("out")).as("outs"))
    cs.join(broadcast(dim), "layer")
      .select(col("cell_id"), col("layer"),
              graft.functions.RangeRemap(
                col("value"), col("bounds"), col("outs")).as("out"))
  }

  /** R9 as a declared query: the derived classification table itself. */
  def classifyEqualInterval(spark: SparkSession, dir: String): DataFrame =
    WeightedOverlay.explodeRanges(catalog(spark, dir))

  private def explodeClasses(df: DataFrame, ranges: org.apache.spark.sql.Column): DataFrame =
    df.select(posexplode(ranges).as(Seq("class_idx", "r")))
      .select(col("class_idx"), col("r.label").as("label"),
              col("r.lo").as("lo"), col("r.hi").as("hi"), col("r.out").as("out"))

  /** R11 (pyt:1081-1108) as a declared query: unique-value classification
    * over the distinct l_linenumber values (a thematic pseudo-raster).
    * Distinct collapses to a bounded set before any driver-side array work
    * — collect_set output is #distinct-values sized, not data-sized. */
  def classifyUnique(spark: SparkSession, dir: String): DataFrame = {
    val vals = table(spark, dir, "lineitem")
      .agg(collect_set(col("l_linenumber").cast("double")).as("vs"))
    explodeClasses(vals, Classify.uniqueValues(col("vs")))
  }

  /** R10 (pyt:941-1008) as a declared query: classify-colorizer breaks
    * over l_quantity stats — breaks at 25%/50%/100% of the value span,
    * "lo to hi" labels, all outputs 5, final max-bump. */
  def classifyBreaks(spark: SparkSession, dir: String): DataFrame = {
    val stats = table(spark, dir, "lineitem")
      .agg(min(col("l_quantity").cast("double")).as("mn"),
           max(col("l_quantity").cast("double")).as("mx"))
    val span = col("mx") - col("mn")
    val breaks = array(col("mn") + span * 0.25, col("mn") + span * 0.5,
                       col("mn") + span * 1.0)
    explodeClasses(stats, Classify.fromBreaks(col("mn"), breaks))
  }

  /** R12 (pyt:1021-1078) as a declared query: unique-value classification
    * where labels come from a colorizer lookup joined CASE-INSENSITIVELY
    * to the raster attribute table's class field (pyt:1059-1068). The
    * colorizer is dimension-sized -> broadcast; values and labels stay
    * paired through collection (struct list), so ordering is irrelevant. */
  def classifyLabelJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rat = table(spark, dir, "lineitem")
      .select(col("l_linenumber").cast("double").as("v"),
              concat(lit("cls"), col("l_linenumber")).as("field"))
      .distinct()
    val colorizer = Seq(
      ("CLS1", "One"), ("CLS2", "Two"), ("CLS3", "Three"), ("CLS4", "Four"),
      ("CLS5", "Five"), ("CLS6", "Six"), ("CLS7", "Seven"))
      .toDF("cval", "clabel")
    val pairs = rat
      .join(broadcast(colorizer), lower(col("field")) === lower(col("cval")))
      .agg(collect_list(struct(col("v"), col("clabel"))).as("ps"))
      .select(transform(col("ps"), p => p("v")).as("vs"),
              transform(col("ps"), p => p("clabel")).as("ls"))
    explodeClasses(pairs, Classify.uniqueValues(col("vs"), col("ls")))
  }

  /** R29 (pyt:1083-1105, the value-field colorizer branch) as a declared
    * query: colorizer items whose values AND labels are locale-formatted
    * numeric strings ("1,234.5 m") — both digit-stripped (keep digits and
    * the decimal point), the value parsed to double, the label kept as
    * the stripped STRING (the reference appends `lbl`, not the original,
    * pyt:1089-1090), then unique-value classification over the parsed
    * values. The locale strings are built from lineitem's distinct
    * l_linenumber by concatenation so the oracle constructs byte-identical
    * inputs. */
  def classifyLocale(spark: SparkSession, dir: String): DataFrame = {
    val items = table(spark, dir, "lineitem")
      .select(col("l_linenumber").cast("string").as("ln")).distinct()
      .select(concat(lit("1,00"), col("ln"), lit(".5")).as("value_str"),
              concat(lit("elev 1,00"), col("ln"), lit(".5 m")).as("label_str"))
    val pairs = items.agg(collect_list(struct(
        Classify.numericFromLabel(col("value_str")).as("v"),
        Classify.digitsOnly(col("label_str")).as("l"))).as("ps"))
      .select(transform(col("ps"), p => p("v")).as("vs"),
              transform(col("ps"), p => p("l")).as("ls"))
    explodeClasses(pairs, Classify.uniqueValues(col("vs"), col("ls")))
  }

  // ---- shared oracle-SQL fragments (DuckDB dialect) ----

  private[ops] val cellsSql: String = layers.map { case (name, src, _) =>
    s"SELECT l_orderkey % 10000 AS cell_id, '$name' AS layer, CAST($src AS DOUBLE) AS value FROM lineitem"
  }.mkString(
    "SELECT cell_id, layer, max(value) AS value FROM (", " UNION ALL ",
    ") GROUP BY cell_id, layer")

  /** The GIS10/GIS11 classed grid as oracle CTEs (pc → s → g): the
    * same equal-interval break formula as [[classedGrid]], float
    * arithmetic written once, identically, in both engines. */
  private val classedGridSql: String =
    """pc AS (
      |  SELECT l_orderkey % 10000 AS cell_id,
      |    max(CAST(l_quantity AS DOUBLE)) AS q
      |  FROM lineitem GROUP BY 1),
      |s AS (SELECT min(q) AS mn, max(q) AS mx FROM pc),
      |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c,
      |        CAST(least(floor((q - mn) / ((mx - mn) / 5.0)), 4) AS INT)
      |          AS cls
      |      FROM pc, s)""".stripMargin

  private[ops] val rangesSql: String =
    s"""WITH cells AS ($cellsSql),
       |stats AS (SELECT layer, min(value) AS mn, max(value) AS mx FROM cells GROUP BY layer),
       |ranges AS (
       |  SELECT layer, CAST(i AS INT) AS class_idx,
       |    CASE i WHEN 0 THEN 'Very Low' WHEN 1 THEN 'Low' WHEN 2 THEN 'Medium' WHEN 3 THEN 'High' ELSE 'Very High' END AS label,
       |    mn + CAST(i AS DOUBLE) * ((mx - mn) / 5.0) AS lo,
       |    CASE WHEN i = 4 THEN mx + 1.0 ELSE mn + CAST(i + 1 AS DOUBLE) * ((mx - mn) / 5.0) END AS hi,
       |    CASE i WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 5 WHEN 3 THEN 7 ELSE 9 END AS out
       |  FROM stats, (SELECT unnest(generate_series(0, 4)) AS i))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wro_overlay_flagship" -> flagship,
    "wro_overlay_nodata" -> overlayNoData,
    "wro_overlay_skewed" -> overlaySkewed,
    "wro_overlay_skewed_aqe" -> overlaySkewedAqe,
    "a9_histogram" -> a9Histogram,
    "wro_focal_stats" -> focalStats,
    "wro_zonal_stats" -> zonalStats,
    "wro_resample_nearest" -> resampleNearest,
    "wro_slope" -> slope,
    "wro_class_boundaries" -> classBoundaries,
    "wro_aspect" -> aspect,
    "wro_polygon_zonal" -> polygonZonal,
    "wro_flow_direction" -> flowDirection,
    "wro_flow_accumulation" -> ((s: SparkSession, d: String) =>
      flowAccumulation(s, d)),
    "wro_majority_filter" -> majorityFilter,
    "wro_cost_distance" -> ((s: SparkSession, d: String) =>
      costDistance(s, d)),
    "wro_allocation" -> ((s: SparkSession, d: String) =>
      allocation(s, d)),
    "wro_hillshade" -> hillshade,
    "wro_watershed" -> ((s: SparkSession, d: String) => watershed(s, d)),
    "wro_flow_length" -> ((s: SparkSession, d: String) => flowLength(s, d)),
    "wro_curvature" -> curvature,
    "wro_viewshed" -> viewshed,
    "wro_moran" -> moran,
    "wro_gi_star" -> giStar,
    "wro_idw" -> idw,
    "wro_resample_bilinear" -> resampleBilinear,
    "wro_region_group" -> regionGroup,
    "wro_twi" -> twi,
    "wro_least_cost_path" -> ((s: SparkSession, d: String) =>
      leastCostPath(s, d)),
    "wro_combine" -> combine,
    "wro_expand" -> expand,
    "wro_zonal_geometry" -> zonalGeometry,
    "wro_corridor" -> ((s: SparkSession, d: String) => corridor(s, d)),
    "wro_layer_filter" -> layerFilterGolden,
    "f9_remap_expr" -> remapExpr,
    "wro_classify_equal_interval" -> classifyEqualInterval,
    "wro_classify_unique" -> classifyUnique,
    "wro_classify_breaks" -> classifyBreaks,
    "wro_classify_labeljoin" -> classifyLabelJoin,
    "wro_classify_locale" -> classifyLocale
  )

  /** The D8 steepest-descent CTE blocks (pc→rk), shared by the
    * flow-direction oracle and the accumulation oracle's edge base. */
  private val d8OracleCtes: String =
    s"""pc AS (
       |  SELECT l_orderkey % 10000 AS cell_id,
       |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
       |         AS BIGINT) AS cents
       |  FROM lineitem GROUP BY 1),
       |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
       |o(dr, dc, code, w) AS (VALUES
       |  ${d8Offs.map { case (dr, dc, code, wt) =>
            s"($dr, $dc, $code, $wt)" }.mkString(",\n  ")}),
       |n AS (SELECT g.r + o.dr AS r, g.c + o.dc AS c, g.cents AS nb,
       |        o.code, o.w
       |      FROM g, o),
       |j AS (SELECT n.r, n.c, n.code, (g2.cents - n.nb) * n.w AS key
       |      FROM n JOIN g g2 ON g2.r = n.r AND g2.c = n.c),
       |rk AS (SELECT r, c, code,
       |         count(*) OVER (PARTITION BY r, c) AS nn,
       |         row_number() OVER (PARTITION BY r, c
       |           ORDER BY key DESC, code ASC) AS rn
       |       FROM j)""".stripMargin

  /** The exact-units grid CTE shared by the spatial-statistics oracles
    * (quantity integral 1..50 — CAST DOUBLE→BIGINT is lossless). */
  private val unitsGridSql: String =
    """pc AS (
      |  SELECT l_orderkey % 10000 AS cell_id,
      |    CAST(max(CAST(l_quantity AS DOUBLE)) AS BIGINT) AS u
      |  FROM lineitem GROUP BY 1),
      |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, u FROM pc)"""
      .stripMargin

  /** Plain-join replay of the planted-skew overlay — the shared oracle
    * of the salted (wro_overlay_skewed) and AQE-split
    * (wro_overlay_skewed_aqe) executions: both must be result-invariant
    * vs the naive join. */
  private val skewedOracleSql =
    s"""$rangesSql,
       |weights AS (${layers.map { case (n, _, w) => s"SELECT '$n' AS layer, $w AS w10" }.mkString(" UNION ALL ")}),
       |obs AS (
       |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN l_orderkey % 10000
       |              ELSE 0 END AS cell_id, layer, value
       |  FROM (${layers.map { case (name, src, _) =>
                s"SELECT l_orderkey, '$name' AS layer, CAST($src AS DOUBLE) AS value FROM lineitem"
              }.mkString(" UNION ALL ")})),
       |cellmax AS (
       |  SELECT cell_id, layer, max(value) AS maxv FROM obs GROUP BY 1, 2),
       |rep AS (
       |  SELECT o.cell_id, o.layer, o.value FROM obs o
       |  JOIN cellmax m ON o.cell_id = m.cell_id AND o.layer = m.layer
       |  WHERE o.value * 2 >= m.maxv),
       |remapped AS (
       |  SELECT c.cell_id, c.layer, r.out
       |  FROM rep c JOIN ranges r
       |    ON c.layer = r.layer AND c.value >= r.lo AND c.value < r.hi)
       |SELECT m.cell_id, CAST(sum(m.out * w.w10) AS BIGINT) AS score10,
       |  count(*) AS n_obs
       |FROM remapped m JOIN weights w ON m.layer = w.layer
       |GROUP BY m.cell_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // the same N-scaled deviations (dev = N·u − Σu) over the same rook
    // fan-out; sums CAST from DuckDB's HUGEINT back to BIGINT
    "wro_moran" ->
      s"""WITH $unitsGridSql,
        |t AS (SELECT count(*) AS n, CAST(sum(u) AS BIGINT) AS s FROM g),
        |d AS (SELECT r, c, t.n * g.u - t.s AS dev FROM g, t),
        |o(dr, dc) AS (VALUES (0, 1), (0, -1), (1, 0), (-1, 0)),
        |pr AS (SELECT d2.dev AS da, d1.dev AS db
        |       FROM d d1 CROSS JOIN o JOIN d d2
        |         ON d2.r = d1.r + o.dr AND d2.c = d1.c + o.dc)
        |SELECT t.n AS n_cells, p.w_pairs, p.num, q.den
        |FROM t,
        |  (SELECT count(*) AS w_pairs,
        |     CAST(sum(da * db) AS BIGINT) AS num FROM pr) p,
        |  (SELECT CAST(sum(dev * dev) AS BIGINT) AS den FROM d) q"""
        .stripMargin,
    // identical cross-multiplied sigma-band CASE over the same 3×3
    // focal sum (self included) and 1-row moment table
    "wro_gi_star" ->
      s"""WITH $unitsGridSql,
        |t AS (SELECT count(*) AS n, CAST(sum(u) AS BIGINT) AS s,
        |        CAST(sum(u * u) AS BIGINT) AS ss FROM g),
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |f AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c, g.u
        |      FROM g, o o1, o o2
        |      WHERE g.r + o1.d BETWEEN 0 AND 99
        |        AND g.c + o2.d BETWEEN 0 AND 99),
        |fs AS (SELECT f.r, f.c, CAST(sum(f.u) AS BIGINT) AS local,
        |         count(*) AS nk
        |       FROM f JOIN g ON g.r = f.r AND g.c = f.c
        |       GROUP BY 1, 2),
        |z AS (SELECT r, c, t.n * local - nk * t.s AS num,
        |        t.n * t.ss - t.s * t.s AS den,
        |        t.n * nk - nk * nk AS vk, t.n AS n
        |      FROM fs, t)
        |SELECT r, c, CAST(
        |  (CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END) *
        |  (CASE WHEN num * num * (n - 1) >= den * vk * 9 THEN 3
        |        WHEN num * num * (n - 1) >= den * vk * 4 THEN 2
        |        WHEN num * num * (n - 1) >= den * vk THEN 1
        |        ELSE 0 END) AS INT) AS gi_class
        |FROM z""".stripMargin,
    // the same 24-offset lcm-40 integer weights; interpolation domain
    // restricted to absent in-grid cells by the same anti-join
    "wro_idw" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |o AS (SELECT o1.d AS dr, o2.d AS dc,
        |        40 // (o1.d * o1.d + o2.d * o2.d) AS w
        |      FROM (SELECT unnest([-2, -1, 0, 1, 2]) AS d) o1,
        |           (SELECT unnest([-2, -1, 0, 1, 2]) AS d) o2
        |      WHERE NOT (o1.d = 0 AND o2.d = 0)),
        |n AS (SELECT g.r + o.dr AS r, g.c + o.dc AS c,
        |        g.cents * o.w AS wc, o.w
        |      FROM g, o
        |      WHERE g.r + o.dr BETWEEN 0 AND 99
        |        AND g.c + o.dc BETWEEN 0 AND 99)
        |SELECT n.r, n.c, CAST(sum(wc) AS BIGINT) AS num40,
        |       CAST(sum(w) AS BIGINT) AS den40
        |FROM n ANTI JOIN g ON g.r = n.r AND g.c = n.c
        |GROUP BY 1, 2""".stripMargin,
    // the same 4-corner role fan-out: divisibility picks each cell's
    // output target per role, 16th-weights {9,3,3,1}, complete corners
    "wro_resample_bilinear" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |ro(i, j, w) AS (VALUES (0, 0, 9), (0, 1, 3), (1, 0, 3), (1, 1, 1)),
        |f AS (SELECT (r - 1 - i) // 4 AS out_r, (c - 1 - j) // 4 AS out_c,
        |        cents * w AS wc
        |      FROM g, ro
        |      WHERE (r - 1 - i) % 4 = 0 AND (c - 1 - j) % 4 = 0
        |        AND (r - 1 - i) // 4 BETWEEN 0 AND 24
        |        AND (c - 1 - j) // 4 BETWEEN 0 AND 24)
        |SELECT out_r, out_c, CAST(sum(wc) AS BIGINT) AS v16
        |FROM f GROUP BY 1, 2 HAVING count(*) = 4""".stripMargin,
    // independent formulation: instead of replaying the min-label
    // rounds, the FULL reachability closure (recursive UNION dedups to
    // the fixpoint) — min reachable key per cell must equal the
    // converged pointer-jumping label exactly
    "wro_region_group" ->
      s"""WITH RECURSIVE $unitsGridSql,
        |cl AS (SELECT r, c, u % 7 AS cls, r * 100 + c AS k FROM g),
        |e AS (SELECT a.k AS u, b.k AS v
        |      FROM cl a JOIN cl b
        |        ON a.cls = b.cls AND
        |           ((abs(a.r - b.r) = 1 AND a.c = b.c) OR
        |            (a.r = b.r AND abs(a.c - b.c) = 1))),
        |reach(o, v) AS (
        |  SELECT k, k FROM cl
        |  UNION
        |  SELECT reach.o, e.v FROM reach JOIN e ON e.u = reach.v),
        |lbl AS (SELECT o, min(v) AS reg FROM reach GROUP BY o)
        |SELECT cl.r, cl.c, CAST(cl.cls AS BIGINT) AS cls,
        |  reg // 100 AS reg_r, reg % 100 AS reg_c
        |FROM cl JOIN lbl ON lbl.o = cl.k""".stripMargin,
    // contribute-to-neighbors replayed as a 3×3 offset cross join over
    // the same per-cell cents; sum(BIGINT) is HUGEINT in DuckDB → CAST
    "wro_focal_stats" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |n AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c, g.cents
        |      FROM g, o o1, o o2)
        |SELECT r, c, CAST(sum(cents) AS BIGINT) AS focal_sum,
        |       count(*) AS n_nbr
        |FROM n WHERE r BETWEEN 0 AND 99 AND c BETWEEN 0 AND 99
        |GROUP BY 1, 2""".stripMargin,
    // independent formulation: window-rank argmax (ORDER BY key DESC,
    // code ASC) instead of the min(struct) aggregate; same generated
    // offset/code/weight VALUES
    "wro_flow_direction" ->
      s"""WITH $d8OracleCtes
        |SELECT r, c, CAST(code AS BIGINT) AS d8
        |FROM rk WHERE rn = 1 AND nn = 8""".stripMargin,
    // the D8 CTEs + a depth-capped recursive path walk; DISTINCT
    // origins per receiver (pit-pair 2-cycles would re-count per lap)
    "wro_flow_accumulation" ->
      s"""WITH RECURSIVE $d8OracleCtes,
        |fd AS (SELECT r, c, code AS d8 FROM rk WHERE rn = 1 AND nn = 8),
        |off(code, dr, dc) AS (VALUES (1,0,1),(2,1,1),(4,1,0),(8,1,-1),
        |  (16,0,-1),(32,-1,-1),(64,-1,0),(128,-1,1)),
        |e AS (SELECT fd.r * 100 + fd.c AS u,
        |        (fd.r + off.dr) * 100 + (fd.c + off.dc) AS v
        |      FROM fd JOIN off ON fd.d8 = off.code),
        |p(u, v, d) AS (
        |  SELECT u, v, 1 FROM e
        |  UNION ALL
        |  SELECT p.u, e.v, d + 1 FROM p JOIN e ON e.u = p.v WHERE d < 10)
        |SELECT v // 100 AS r, v % 100 AS c,
        |  count(DISTINCT u) AS n_upstream
        |FROM p GROUP BY 1, 2""".stripMargin,
    // contribute-to-neighbors with a self tag; the struct-min mode is
    // replayed as a packed-integer min ((8−cnt)·16+cls — cnt ≤ 8,
    // cls ≤ 4, both non-negative, so min picks max count then min
    // class, the identical total order)
    "wro_majority_filter" ->
      s"""WITH $classedGridSql,
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |n AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c, g.cls,
        |        CASE WHEN o1.d = 0 AND o2.d = 0 THEN 1 ELSE 0 END AS self
        |      FROM g, o o1, o o2
        |      WHERE g.r + o1.d BETWEEN 0 AND 99
        |        AND g.c + o2.d BETWEEN 0 AND 99),
        |pcl AS (SELECT r, c, cls, sum(1 - self) AS nbr_n,
        |          max(self) AS has_self
        |        FROM n GROUP BY 1, 2, 3),
        |agg AS (SELECT r, c,
        |          max(CASE WHEN has_self = 1 THEN cls END) AS own_cls,
        |          CAST(sum(nbr_n) AS BIGINT) AS n_nbr,
        |          min(CASE WHEN nbr_n > 0
        |              THEN (8 - nbr_n) * 16 + cls END) AS mkey,
        |          max(has_self) AS present
        |        FROM pcl GROUP BY 1, 2)
        |SELECT r, c, own_cls, n_nbr,
        |  CAST(CASE WHEN (8 - mkey // 16) * 2 > n_nbr THEN mkey % 16
        |       ELSE own_cls END AS INT) AS out_cls
        |FROM agg WHERE present = 1""".stripMargin,
    // per-layer equal-interval classes from one stats row; combo ids by
    // the same dense_rank-over-sorted-triples rule
    "wro_combine" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    max(CAST(l_quantity AS DOUBLE)) AS q,
        |    max(CAST(l_extendedprice AS DOUBLE)) AS p,
        |    max(CAST(l_discount AS DOUBLE)) AS d
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT min(q) AS mnq, max(q) AS mxq, min(p) AS mnp,
        |        max(p) AS mxp, min(d) AS mnd, max(d) AS mxd FROM pc),
        |cl AS (
        |  SELECT cell_id // 100 AS r, cell_id % 100 AS c,
        |    CAST(least(floor((q - mnq) / ((mxq - mnq) / 5.0)), 4) AS INT)
        |      AS cq,
        |    CAST(least(floor((p - mnp) / ((mxp - mnp) / 5.0)), 4) AS INT)
        |      AS cp,
        |    CAST(least(floor((d - mnd) / ((mxd - mnd) / 5.0)), 4) AS INT)
        |      AS cd
        |  FROM pc, s),
        |combos AS (
        |  SELECT cq, cp, cd, count(*) AS combo_n,
        |    CAST(dense_rank() OVER (ORDER BY cq, cp, cd) AS BIGINT)
        |      AS combo_id
        |  FROM cl GROUP BY 1, 2, 3)
        |SELECT cl.r, cl.c, cl.cq, cl.cp, cl.cd,
        |  combos.combo_id, combos.combo_n
        |FROM cl JOIN combos USING (cq, cp, cd)""".stripMargin,
    // the GIS10 fan-out shape; max-of-indicator is the any-4 predicate
    "wro_expand" ->
      s"""WITH $classedGridSql,
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |n AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c, g.cls,
        |        CASE WHEN o1.d = 0 AND o2.d = 0 THEN 1 ELSE 0 END AS self
        |      FROM g, o o1, o o2
        |      WHERE g.r + o1.d BETWEEN 0 AND 99
        |        AND g.c + o2.d BETWEEN 0 AND 99)
        |SELECT r, c,
        |  max(CASE WHEN self = 1 THEN cls END) AS own_cls,
        |  CAST(CASE WHEN max(CASE WHEN cls = 4 THEN 1 ELSE 0 END) = 1
        |       THEN 4 ELSE max(CASE WHEN self = 1 THEN cls END) END AS INT)
        |    AS out_cls
        |FROM n GROUP BY 1, 2 HAVING max(self) = 1""".stripMargin,
    // the region-group closure + one aggregate per converged label
    "wro_zonal_geometry" ->
      s"""WITH RECURSIVE $unitsGridSql,
        |cl AS (SELECT r, c, u % 7 AS cls, r * 100 + c AS k FROM g),
        |e AS (SELECT a.k AS u, b.k AS v
        |      FROM cl a JOIN cl b
        |        ON a.cls = b.cls AND
        |           ((abs(a.r - b.r) = 1 AND a.c = b.c) OR
        |            (a.r = b.r AND abs(a.c - b.c) = 1))),
        |reach(o, v) AS (
        |  SELECT k, k FROM cl
        |  UNION
        |  SELECT reach.o, e.v FROM reach JOIN e ON e.u = reach.v),
        |lbl AS (SELECT o, min(v) AS reg FROM reach GROUP BY o)
        |SELECT CAST(cl.cls AS BIGINT) AS cls,
        |  reg // 100 AS reg_r, reg % 100 AS reg_c,
        |  count(*) AS n_cells,
        |  CAST(sum(cl.r) AS BIGINT) AS sum_r,
        |  CAST(sum(cl.c) AS BIGINT) AS sum_c,
        |  min(cl.r) AS min_r, max(cl.r) AS max_r,
        |  min(cl.c) AS min_c, max(cl.c) AS max_c
        |FROM cl JOIN lbl ON lbl.o = cl.k
        |GROUP BY 1, 2, 3""".stripMargin,
    // the flow-accumulation recursive walk + the slope stencil composed
    // from the SAME shared cents grid, identical cross-multiplied class
    "wro_twi" ->
      s"""WITH RECURSIVE $d8OracleCtes,
        |fd AS (SELECT r, c, code AS d8 FROM rk WHERE rn = 1 AND nn = 8),
        |off(code, dr, dc) AS (VALUES (1,0,1),(2,1,1),(4,1,0),(8,1,-1),
        |  (16,0,-1),(32,-1,-1),(64,-1,0),(128,-1,1)),
        |e AS (SELECT fd.r * 100 + fd.c AS u,
        |        (fd.r + off.dr) * 100 + (fd.c + off.dc) AS v
        |      FROM fd JOIN off ON fd.d8 = off.code),
        |p(u, v, d) AS (
        |  SELECT u, v, 1 FROM e
        |  UNION ALL
        |  SELECT p.u, e.v, d + 1 FROM p JOIN e ON e.u = p.v WHERE d < 10),
        |acc AS (SELECT v // 100 AS r, v % 100 AS c,
        |          count(DISTINCT u) AS n_upstream FROM p GROUP BY 1, 2),
        |so AS (SELECT unnest([-1, 0, 1]) AS d),
        |sn AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c,
        |         g.cents * (-o2.d * (2 - abs(o1.d))) AS xc,
        |         g.cents * (-o1.d * (2 - abs(o2.d))) AS yc
        |       FROM g, so o1, so o2),
        |sl AS (SELECT r, c, CAST(sum(xc) AS BIGINT) AS gx,
        |         CAST(sum(yc) AS BIGINT) AS gy
        |       FROM sn WHERE r BETWEEN 0 AND 99 AND c BETWEEN 0 AND 99
        |       GROUP BY 1, 2 HAVING count(*) = 9),
        |t AS (SELECT sl.r, sl.c,
        |        coalesce(acc.n_upstream, 0) + 1 AS a,
        |        sl.gx * sl.gx + sl.gy * sl.gy AS g2
        |      FROM sl LEFT JOIN acc ON acc.r = sl.r AND acc.c = sl.c)
        |SELECT r, c, CAST(a AS BIGINT) AS a, CAST(g2 AS BIGINT) AS g2,
        |  CAST((CASE WHEN a * a * 1000000 >= g2 * 10000 THEN 1 ELSE 0 END) +
        |       (CASE WHEN a * a * 1000000 >= g2 * 100000 THEN 1 ELSE 0 END) +
        |       (CASE WHEN a * a * 1000000 >= g2 * 1000000 THEN 1 ELSE 0 END)
        |       AS INT) AS wet_class
        |FROM t""".stripMargin,
    // both depth-counted walks in one WITH RECURSIVE; the inner join
    // is the both-reachable intersection
    "wro_corridor" ->
      s"""WITH RECURSIVE $classedGridSql,
        |o(dr, dc, w) AS (VALUES (-1,-1,4),(-1,0,3),(-1,1,4),(0,-1,3),
        |  (0,1,3),(1,-1,4),(1,0,3),(1,1,4)),
        |wa(i, r, c, d) AS (
        |  SELECT 0, r, c, CAST(0 AS BIGINT) FROM g WHERE cls = 4
        |  UNION
        |  SELECT w.i + 1, g.r, g.c, w.d + o.w
        |  FROM wa w, o, g
        |  WHERE w.i < 10 AND g.r = w.r + o.dr AND g.c = w.c + o.dc),
        |wb(i, r, c, d) AS (
        |  SELECT 0, r, c, CAST(0 AS BIGINT) FROM g WHERE cls = 0
        |  UNION
        |  SELECT w.i + 1, g.r, g.c, w.d + o.w
        |  FROM wb w, o, g
        |  WHERE w.i < 10 AND g.r = w.r + o.dr AND g.c = w.c + o.dc),
        |ca AS (SELECT r, c, CAST(min(d) AS BIGINT) AS cost_a
        |       FROM wa GROUP BY 1, 2),
        |cb AS (SELECT r, c, CAST(min(d) AS BIGINT) AS cost_b
        |       FROM wb GROUP BY 1, 2)
        |SELECT ca.r, ca.c, cost_a, cost_b, cost_a + cost_b AS total34
        |FROM ca JOIN cb ON cb.r = ca.r AND cb.c = ca.c""".stripMargin,
    // the k-round Bellman-Ford replayed as a depth-counted recursive
    // walk: the recursive set holds every (≤10-edge path cost, cell)
    // state, so min(d) per cell = min over ≤10-edge paths — exactly
    // what k relaxation rounds compute; the g join enforces both
    // in-grid and PRESENT (NoData barrier)
    "wro_cost_distance" ->
      s"""WITH RECURSIVE $classedGridSql,
        |o(dr, dc, w) AS (VALUES (-1,-1,4),(-1,0,3),(-1,1,4),(0,-1,3),
        |  (0,1,3),(1,-1,4),(1,0,3),(1,1,4)),
        |walk(i, r, c, d) AS (
        |  SELECT 0, r, c, CAST(0 AS BIGINT) FROM g WHERE cls = 4
        |  UNION
        |  SELECT w.i + 1, g.r, g.c, w.d + o.w
        |  FROM walk w, o, g
        |  WHERE w.i < 10 AND g.r = w.r + o.dr AND g.c = w.c + o.dc)
        |SELECT r, c, CAST(min(d) AS BIGINT) AS cost34
        |FROM walk GROUP BY 1, 2""".stripMargin,
    // the cost field from the same depth-counted walk; the predecessor
    // function as a rank-1 window over valid (y, x) steps (independent
    // of Spark's min-packed aggregate — same total order), then a
    // linear recursive backtrace from the same argmax destination
    "wro_least_cost_path" ->
      s"""WITH RECURSIVE $classedGridSql,
        |o(dr, dc, w) AS (VALUES (-1,-1,4),(-1,0,3),(-1,1,4),(0,-1,3),
        |  (0,1,3),(1,-1,4),(1,0,3),(1,1,4)),
        |walk(i, r, c, d) AS (
        |  SELECT 0, r, c, CAST(0 AS BIGINT) FROM g WHERE cls = 4
        |  UNION
        |  SELECT w.i + 1, g.r, g.c, w.d + o.w
        |  FROM walk w, o, g
        |  WHERE w.i < 10 AND g.r = w.r + o.dr AND g.c = w.c + o.dc),
        |cost AS (SELECT r, c, CAST(min(d) AS BIGINT) AS d
        |         FROM walk GROUP BY 1, 2),
        |dest AS (SELECT r, c FROM cost
        |         ORDER BY d DESC, r * 100 + c ASC LIMIT 1),
        |pr AS (
        |  SELECT x.r, x.c, y.r AS yr, y.c AS yc,
        |    row_number() OVER (PARTITION BY x.r, x.c
        |      ORDER BY y.d * 10000 + y.r * 100 + y.c) AS rn
        |  FROM cost x CROSS JOIN o JOIN cost y
        |    ON y.r = x.r + o.dr AND y.c = x.c + o.dc AND y.d + o.w = x.d),
        |p1 AS (SELECT r, c, yr, yc FROM pr WHERE rn = 1),
        |pth(seq, r, c) AS (
        |  SELECT CAST(0 AS BIGINT), r, c FROM dest
        |  UNION ALL
        |  SELECT pth.seq + 1, p1.yr, p1.yc
        |  FROM pth JOIN p1 ON p1.r = pth.r AND p1.c = pth.c
        |  WHERE pth.seq < 14)
        |SELECT pth.seq, pth.r, pth.c, cost.d AS cost34
        |FROM pth JOIN cost ON cost.r = pth.r AND cost.c = pth.c"""
        .stripMargin,
    // the same depth-counted walk carrying the packed d·10^4+src key;
    // min(key) = min distance, ties to the smallest source id — the
    // identical total order the Spark side folds
    "wro_allocation" ->
      s"""WITH RECURSIVE $classedGridSql,
        |o(dr, dc, w) AS (VALUES (-1,-1,4),(-1,0,3),(-1,1,4),(0,-1,3),
        |  (0,1,3),(1,-1,4),(1,0,3),(1,1,4)),
        |walk(i, r, c, key) AS (
        |  SELECT 0, r, c, CAST(r * 100 + c AS BIGINT) FROM g WHERE cls = 4
        |  UNION
        |  SELECT w.i + 1, g.r, g.c, w.key + o.w * 10000
        |  FROM walk w, o, g
        |  WHERE w.i < 10 AND g.r = w.r + o.dr AND g.c = w.c + o.dc),
        |m AS (SELECT r, c, min(key) AS key FROM walk GROUP BY 1, 2)
        |SELECT r, c, key // 10000 AS cost34,
        |  (key % 10000) // 100 AS src_r, key % 100 AS src_c
        |FROM m""".stripMargin,
    // same integer even-odd ray cast; the edge list is pre-expanded
    // from the SAME shared polygon literal into plain integer VALUES
    // (DuckDB 1.0's LATERAL-over-struct-list path hits an internal
    // assertion). The oracle omits the bbox prefilter (pure pruning —
    // outside-bbox cells have even parity by construction), an
    // independent check that the prefilter drops nothing it shouldn't
    "wro_polygon_zonal" ->
      s"""WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |pts AS (SELECT cell_id % 100 AS px, cell_id // 100 AS py, cents
        |        FROM pc),
        |edges(poly_id, ax, ay, bx, by) AS (VALUES
        |  ${polys.flatMap { case (id, vs) =>
             vs.indices.map { i =>
               val a = vs(i); val b = vs((i + 1) % vs.size)
               s"($id, ${a._1}, ${a._2}, ${b._1}, ${b._2})" } }
             .mkString(",\n  ")}),
        |cr AS (
        |  SELECT poly_id, px, py, cents,
        |    sum(CASE WHEN (ay > py) <> (by > py) THEN
        |      CASE WHEN by > ay THEN
        |        CASE WHEN (px - ax) * (by - ay)
        |                 < (py - ay) * (bx - ax) THEN 1 ELSE 0 END
        |      ELSE
        |        CASE WHEN (px - ax) * (by - ay)
        |                 > (py - ay) * (bx - ax) THEN 1 ELSE 0 END
        |      END ELSE 0 END) AS k
        |  FROM pts, edges
        |  GROUP BY 1, 2, 3, 4)
        |SELECT poly_id, count(*) AS n_cells,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM cr WHERE k % 2 = 1 GROUP BY 1""".stripMargin,
    // the slope CTE + the same 29/70 cross-multiplied sector CASE
    "wro_aspect" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |n AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c,
        |        g.cents * (-o2.d * (2 - abs(o1.d))) AS xc,
        |        g.cents * (-o1.d * (2 - abs(o2.d))) AS yc
        |      FROM g, o o1, o o2),
        |sl AS (
        |  SELECT r, c, CAST(sum(xc) AS BIGINT) AS gx,
        |         CAST(sum(yc) AS BIGINT) AS gy
        |  FROM n WHERE r BETWEEN 0 AND 99 AND c BETWEEN 0 AND 99
        |  GROUP BY 1, 2 HAVING count(*) = 9)
        |SELECT r, c,
        |  CASE
        |    WHEN gx = 0 AND gy = 0 THEN 8
        |    WHEN abs(gy) * 70 <= abs(gx) * 29 THEN
        |      CASE WHEN gx > 0 THEN 0 ELSE 4 END
        |    WHEN abs(gx) * 70 <= abs(gy) * 29 THEN
        |      CASE WHEN gy > 0 THEN 6 ELSE 2 END
        |    WHEN gx > 0 THEN CASE WHEN gy > 0 THEN 7 ELSE 1 END
        |    ELSE CASE WHEN gy > 0 THEN 5 ELSE 3 END
        |  END AS octant
        |FROM sl""".stripMargin,
    // the same ray decomposition: gcd by bounded divisor filter,
    // primitive-vector ray key, p/g angle (identical int64 inputs →
    // identical binary64 quotient), per-ray running-max window
    "wro_viewshed" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |z AS (SELECT cents AS z0 FROM g WHERE r = 50 AND c = 50),
        |q AS (
        |  SELECT r, c, cents,
        |    list_max(list_filter(range(1, 100),
        |      k -> abs(r - 50) % k = 0 AND abs(c - 50) % k = 0)) AS gd
        |  FROM g WHERE NOT (r = 50 AND c = 50)),
        |a AS (
        |  SELECT r, c, (r - 50) // gd AS udr, (c - 50) // gd AS udc, gd,
        |    CAST(cents - z.z0 AS DOUBLE) / gd AS ang
        |  FROM q, z)
        |SELECT r, c, CAST(gd AS BIGINT) AS m,
        |  CAST(CASE WHEN ang > coalesce(max(ang) OVER (
        |    PARTITION BY udr, udc ORDER BY gd
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1e308)
        |    THEN 1 ELSE 0 END AS INT) AS vis
        |FROM a""".stripMargin,
    // the same per-offset weight triples over the 3x3 stencil
    "wro_curvature" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |n AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c,
        |        g.cents * (CASE WHEN o1.d = 0 AND o2.d != 0 THEN 1
        |                   WHEN o1.d = 0 AND o2.d = 0 THEN -2
        |                   ELSE 0 END) AS xc,
        |        g.cents * (CASE WHEN o2.d = 0 AND o1.d != 0 THEN 1
        |                   WHEN o1.d = 0 AND o2.d = 0 THEN -2
        |                   ELSE 0 END) AS yc,
        |        g.cents * (CASE WHEN o1.d != 0 AND o2.d != 0
        |                   THEN -(-o1.d) * (-o2.d) ELSE 0 END) AS xyc
        |      FROM g, o o1, o o2),
        |cv AS (
        |  SELECT r, c, CAST(sum(xc) AS BIGINT) AS d2x,
        |    CAST(sum(yc) AS BIGINT) AS d2y,
        |    CAST(sum(xyc) AS BIGINT) AS dxy4
        |  FROM n WHERE r BETWEEN 0 AND 99 AND c BETWEEN 0 AND 99
        |  GROUP BY 1, 2 HAVING count(*) = 9)
        |SELECT r, c, d2x, d2y, dxy4,
        |  CAST(CASE WHEN d2x + d2y > 0 THEN 1
        |       WHEN d2x + d2y < 0 THEN -1 ELSE 0 END AS INT) AS concavity
        |FROM cv""".stripMargin,
    // the additive doubling replayed as a LINEAR 16-step accumulating
    // walk over the same weighted self-looped pointer table
    "wro_flow_length" ->
      s"""WITH RECURSIVE $d8OracleCtes,
        |fd AS (SELECT r, c, code AS d8 FROM rk WHERE rn = 1 AND nn = 8),
        |off(code, dr, dc, w) AS (VALUES (1,0,1,3),(2,1,1,4),(4,1,0,3),
        |  (8,1,-1,4),(16,0,-1,3),(32,-1,-1,4),(64,-1,0,3),(128,-1,1,4)),
        |e AS (SELECT fd.r * 100 + fd.c AS u,
        |        (fd.r + off.dr) * 100 + (fd.c + off.dc) AS v,
        |        CAST(off.w AS BIGINT) AS d
        |      FROM fd JOIN off ON fd.d8 = off.code),
        |cells AS (SELECT r * 100 + c AS u FROM g),
        |p0 AS (SELECT cells.u, coalesce(e.v, cells.u) AS v,
        |         coalesce(e.d, 0) AS d
        |       FROM cells LEFT JOIN e USING (u)),
        |sinks AS (SELECT u AS s FROM p0 WHERE u = v),
        |walk(i, u, cur, acc) AS (
        |  SELECT 0, u, u, CAST(0 AS BIGINT) FROM cells
        |  UNION ALL
        |  SELECT w.i + 1, w.u, p0.v, w.acc + p0.d
        |  FROM walk w JOIN p0 ON p0.u = w.cur WHERE w.i < 16),
        |f AS (SELECT u, cur, acc FROM walk WHERE i = 16)
        |SELECT u // 100 AS r, u % 100 AS c, CAST(acc AS BIGINT) AS len34
        |FROM f JOIN sinks ON sinks.s = f.cur""".stripMargin,
    // the 4-round doubling replayed as a LINEAR 16-step walk over the
    // same self-looped pointer table — next^16 two different ways
    "wro_watershed" ->
      s"""WITH RECURSIVE $d8OracleCtes,
        |fd AS (SELECT r, c, code AS d8 FROM rk WHERE rn = 1 AND nn = 8),
        |off(code, dr, dc) AS (VALUES (1,0,1),(2,1,1),(4,1,0),(8,1,-1),
        |  (16,0,-1),(32,-1,-1),(64,-1,0),(128,-1,1)),
        |e AS (SELECT fd.r * 100 + fd.c AS u,
        |        (fd.r + off.dr) * 100 + (fd.c + off.dc) AS v
        |      FROM fd JOIN off ON fd.d8 = off.code),
        |cells AS (SELECT r * 100 + c AS u FROM g),
        |p0 AS (SELECT cells.u, coalesce(e.v, cells.u) AS v
        |       FROM cells LEFT JOIN e USING (u)),
        |sinks AS (SELECT u AS s FROM p0 WHERE u = v),
        |walk(i, u, cur) AS (
        |  SELECT 0, u, u FROM cells
        |  UNION ALL
        |  SELECT w.i + 1, w.u, p0.v
        |  FROM walk w JOIN p0 ON p0.u = w.cur WHERE w.i < 16),
        |f AS (SELECT u, cur FROM walk WHERE i = 16)
        |SELECT u // 100 AS r, u % 100 AS c,
        |  cur // 100 AS ws_r, cur % 100 AS ws_c
        |FROM f JOIN sinks ON sinks.s = f.cur""".stripMargin,
    // the slope CTE + the same squared cross-multiplied class CASE
    "wro_hillshade" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |n AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c,
        |        g.cents * (-o2.d * (2 - abs(o1.d))) AS xc,
        |        g.cents * (-o1.d * (2 - abs(o2.d))) AS yc
        |      FROM g, o o1, o o2),
        |sl AS (
        |  SELECT r, c, CAST(sum(xc) AS BIGINT) AS gx,
        |         CAST(sum(yc) AS BIGINT) AS gy
        |  FROM n WHERE r BETWEEN 0 AND 99 AND c BETWEEN 0 AND 99
        |  GROUP BY 1, 2 HAVING count(*) = 9),
        |d AS (SELECT r, c, 7 * gx + 7 * gy + 8000 AS dot,
        |        gx * gx + gy * gy + 640000 AS n2
        |      FROM sl)
        |SELECT r, c,
        |  CASE WHEN dot < 0 THEN -1
        |       WHEN 16 * dot * dot >= 198 * 9 * n2 THEN 3
        |       WHEN 16 * dot * dot >= 198 * 4 * n2 THEN 2
        |       WHEN 16 * dot * dot >= 198 * n2 THEN 1
        |       ELSE 0 END AS shade_class
        |FROM d""".stripMargin,
    // 5-point stencil replayed with a VALUES offset join; min/max over
    // contributed classes is the any-different predicate on both sides
    "wro_class_boundaries" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    max(CAST(l_quantity AS DOUBLE)) AS q
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT min(q) AS mn, max(q) AS mx FROM pc),
        |cl AS (
        |  SELECT cell_id // 100 AS r, cell_id % 100 AS c,
        |    CAST(least(floor((q - mn) / ((mx - mn) / 5.0)), 4) AS INT) AS cls
        |  FROM pc, s),
        |o(dr, dc, is_self) AS (VALUES (0, 0, 1), (-1, 0, 0), (1, 0, 0),
        |                              (0, -1, 0), (0, 1, 0)),
        |n AS (SELECT cl.r + o.dr AS r, cl.c + o.dc AS c, cls, is_self
        |      FROM cl, o)
        |SELECT r, c,
        |  min(CASE WHEN is_self = 1 THEN cls END) AS cls,
        |  CAST(min(cls) <> max(cls) AS INT) AS is_boundary
        |FROM n WHERE r BETWEEN 0 AND 99 AND c BETWEEN 0 AND 99
        |GROUP BY 1, 2 HAVING max(is_self) = 1""".stripMargin,
    // Horn kernel replayed as the same 3×3 weighted offset cross join;
    // HAVING count(*)=9 is the complete-neighborhood contract
    "wro_slope" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    CAST(CAST(max(CAST(l_quantity AS DOUBLE)) AS DECIMAL(18,2)) * 100
        |         AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT cell_id // 100 AS r, cell_id % 100 AS c, cents FROM pc),
        |o AS (SELECT unnest([-1, 0, 1]) AS d),
        |n AS (SELECT g.r + o1.d AS r, g.c + o2.d AS c,
        |        g.cents * (-o2.d * (2 - abs(o1.d))) AS xc,
        |        g.cents * (-o1.d * (2 - abs(o2.d))) AS yc
        |      FROM g, o o1, o o2)
        |SELECT r, c, CAST(sum(xc) AS BIGINT) AS gx,
        |       CAST(sum(yc) AS BIGINT) AS gy
        |FROM n WHERE r BETWEEN 0 AND 99 AND c BETWEEN 0 AND 99
        |GROUP BY 1, 2 HAVING count(*) = 9""".stripMargin,
    // same break formula as a9 (gate-proven floor-division binning);
    // cents snapped per-row BEFORE aggregation on both sides
    "wro_zonal_stats" ->
      """WITH pc AS (
        |  SELECT l_orderkey % 10000 AS cell_id,
        |    max(CAST(l_quantity AS DOUBLE)) AS q,
        |    CAST(CAST(max(CAST(l_extendedprice AS DOUBLE)) AS DECIMAL(18,2))
        |         * 100 AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT min(q) AS mn, max(q) AS mx FROM pc)
        |SELECT
        |  CAST(least(floor((q - mn) / ((mx - mn) / 5.0)), 4) AS INT) AS zone,
        |  count(*) AS n_cells, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM pc, s GROUP BY 1""".stripMargin,
    // the same pushed-down selection: only input cells at (4R+2, 4C+2)
    // survive into the aggregate
    "wro_resample_nearest" ->
      s"""WITH pc AS (
         |  SELECT l_orderkey % 10000 AS cell_id,
         |    ${layers.map { case (n, src, _) =>
                 s"max(CAST($src AS DOUBLE)) AS $n" }.mkString(", ")}
         |  FROM lineitem
         |  WHERE ((l_orderkey % 10000) // 100) % 4 = 2
         |    AND ((l_orderkey % 10000) % 100) % 4 = 2
         |  GROUP BY 1),
         |cells AS (${layers.map { case (n, _, _) =>
               s"SELECT cell_id, '$n' AS layer, $n AS value FROM pc" }
               .mkString(" UNION ALL ")})
         |SELECT layer, (cell_id // 100) // 4 AS out_r,
         |  (cell_id % 100) // 4 AS out_c,
         |  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4
         |FROM cells""".stripMargin,
    "a9_histogram" ->
      s"""WITH cells AS ($cellsSql),
         |stats AS (SELECT layer, min(value) AS mn, max(value) AS mx
         |          FROM cells GROUP BY layer)
         |SELECT c.layer,
         |  CAST(least(floor((c.value - s.mn) / ((s.mx - s.mn) / 5.0)), 4) AS INT) AS bin,
         |  count(*) AS n
         |FROM cells c JOIN stats s ON c.layer = s.layer
         |GROUP BY 1, 2""".stripMargin,
    "wro_overlay_nodata" ->
      s"""$rangesSql,
         |weights AS (${layers.map { case (n, _, w) => s"SELECT '$n' AS layer, $w AS w10" }.mkString(" UNION ALL ")}),
         |masked AS (
         |  SELECT * FROM cells
         |  WHERE NOT (layer = 'quantity' AND value >= 10.0 AND value < 20.0)
         |    AND NOT (layer = 'discount' AND value >= 0.0 AND value < 0.02)),
         |remapped AS (
         |  SELECT c.cell_id, c.layer, r.out
         |  FROM masked c JOIN ranges r ON c.layer = r.layer AND c.value >= r.lo AND c.value < r.hi)
         |SELECT m.cell_id, CAST(sum(m.out * w.w10) AS BIGINT) AS score10, count(*) AS n_layers
         |FROM remapped m JOIN weights w ON m.layer = w.layer
         |GROUP BY m.cell_id""".stripMargin,
    // plain-join replay of the salted plan — proves salt invariance
    // (and, under the _aqe key, that the adaptive skew split is
    // result-invariant too: both executions gate on the same replay)
    "wro_overlay_skewed" -> skewedOracleSql,
    "wro_overlay_skewed_aqe" -> skewedOracleSql,
    "wro_overlay_flagship" ->
      s"""$rangesSql,
         |weights AS (${layers.map { case (n, _, w) => s"SELECT '$n' AS layer, $w AS w10" }.mkString(" UNION ALL ")}),
         |remapped AS (
         |  SELECT c.cell_id, c.layer, r.out
         |  FROM cells c JOIN ranges r ON c.layer = r.layer AND c.value >= r.lo AND c.value < r.hi)
         |SELECT m.cell_id, CAST(sum(m.out * w.w10) AS BIGINT) AS score10, count(*) AS n_layers
         |FROM remapped m JOIN weights w ON m.layer = w.layer
         |GROUP BY m.cell_id ORDER BY m.cell_id""".stripMargin,
    "wro_layer_filter" ->
      """WITH layers(layer_id, name, long_name, is_raster, visible, is_web,
        |            dataset_type, datasource) AS (VALUES
        |  (1, 'elev', 'grp\elev', true, true, false, 'RasterDataset', 'd1'),
        |  (2, 'table1', 'grp\table1', false, true, false, 'Table', 'd2'),
        |  (3, 'hidden', 'grp\hidden', true, false, false, 'RasterDataset', 'd3'),
        |  (4, 'mosaic1', 'grp\mosaic1', true, true, false, 'MosaicDataset', 'd4'),
        |  (5, 'web1', 'grp\web1', true, true, true, 'RasterDataset', 'd5'),
        |  (6, 'nods', 'grp\nods', true, true, false, 'RasterDataset', NULL),
        |  (7, 'bnd', 'grp\Boundary\bnd', true, true, false, 'RasterDataset', 'd7'),
        |  (8, 'bndstart', '\Boundary\c', true, true, false, 'RasterDataset', 'd8'),
        |  (9, 'elev', 'grp2\elev', true, true, false, 'RasterDataset', 'd9'),
        |  (10, 'slope', 'grp\slope', true, true, false, 'RasterDataset', 'd10'),
        |  (11, 'notype', 'grp\notype', true, true, false, NULL, 'd11'))
        |SELECT CAST(layer_id AS BIGINT) AS layer_id, name, long_name
        |FROM layers
        |WHERE is_raster AND visible
        |  AND (dataset_type IS NULL OR dataset_type != 'MosaicDataset')
        |  AND NOT is_web AND datasource IS NOT NULL
        |  AND instr(long_name, '\Boundary') <= 1
        |  AND instr(long_name, '\Footprint') <= 1
        |  AND instr(long_name, '\Image') <= 1
        |QUALIFY row_number() OVER (PARTITION BY name ORDER BY layer_id) = 1""".stripMargin,
    "f9_remap_expr" ->
      s"""$rangesSql
         |SELECT c.cell_id, c.layer, r.out
         |FROM cells c JOIN ranges r
         |  ON c.layer = r.layer AND c.value >= r.lo AND c.value < r.hi""".stripMargin,
    "wro_classify_equal_interval" ->
      s"""$rangesSql
         |SELECT layer, class_idx, label, lo, hi, out FROM ranges
         |ORDER BY layer, class_idx""".stripMargin,
    "wro_classify_unique" ->
      """WITH v AS (SELECT DISTINCT CAST(l_linenumber AS DOUBLE) AS v FROM lineitem),
        |ordered AS (
        |  SELECT v, row_number() OVER (ORDER BY v) - 1 AS idx,
        |         lead(v) OVER (ORDER BY v) AS nxt
        |  FROM v)
        |SELECT CAST(idx AS INT) AS class_idx, CAST(v AS VARCHAR) AS label,
        |       v AS lo, coalesce(nxt, v + 1) AS hi, 5 AS out
        |FROM ordered""".stripMargin,
    "wro_classify_breaks" ->
      """WITH stats AS (
        |  SELECT min(CAST(l_quantity AS DOUBLE)) AS mn,
        |         max(CAST(l_quantity AS DOUBLE)) AS mx FROM lineitem),
        |bounds AS (
        |  SELECT * FROM (
        |    SELECT 0 AS idx, mn AS b FROM stats
        |    UNION ALL SELECT 1, mn + (mx - mn) * 0.25 FROM stats
        |    UNION ALL SELECT 2, mn + (mx - mn) * 0.5 FROM stats
        |    UNION ALL SELECT 3, mn + (mx - mn) * 1.0 FROM stats)),
        |ranges AS (
        |  SELECT idx AS class_idx, b AS lo,
        |    CASE WHEN idx = 2 THEN (SELECT max(b) FROM bounds) + 1.0
        |         ELSE lead(b) OVER (ORDER BY idx) END AS hi
        |  FROM bounds QUALIFY idx < 3)
        |SELECT CAST(class_idx AS INT) AS class_idx,
        |  CAST(lo AS VARCHAR) || ' to ' || CAST(hi AS VARCHAR) AS label,
        |  lo, hi, 5 AS out
        |FROM ranges""".stripMargin,
    "wro_classify_locale" ->
      """WITH items AS (
        |  SELECT DISTINCT
        |    '1,00' || CAST(l_linenumber AS VARCHAR) || '.5' AS value_str,
        |    'elev 1,00' || CAST(l_linenumber AS VARCHAR) || '.5 m' AS label_str
        |  FROM lineitem),
        |parsed AS (
        |  SELECT CAST(regexp_replace(value_str, '[^0-9.]', '', 'g') AS DOUBLE) AS v,
        |         regexp_replace(label_str, '[^0-9.]', '', 'g') AS l
        |  FROM items),
        |ordered AS (
        |  SELECT v, l, row_number() OVER (ORDER BY v) - 1 AS idx,
        |         lead(v) OVER (ORDER BY v) AS nxt
        |  FROM parsed)
        |SELECT CAST(idx AS INT) AS class_idx, l AS label, v AS lo,
        |       coalesce(nxt, v + 1) AS hi, 5 AS out
        |FROM ordered""".stripMargin,
    "wro_classify_labeljoin" ->
      """WITH rat AS (
        |  SELECT DISTINCT CAST(l_linenumber AS DOUBLE) AS v,
        |         'cls' || CAST(l_linenumber AS VARCHAR) AS field
        |  FROM lineitem),
        |colorizer AS (
        |  SELECT * FROM (VALUES ('CLS1','One'), ('CLS2','Two'), ('CLS3','Three'),
        |    ('CLS4','Four'), ('CLS5','Five'), ('CLS6','Six'), ('CLS7','Seven'))
        |    AS t(cval, clabel)),
        |joined AS (
        |  SELECT r.v, c.clabel
        |  FROM rat r JOIN colorizer c ON lower(r.field) = lower(c.cval)),
        |ordered AS (
        |  SELECT v, clabel, row_number() OVER (ORDER BY v) - 1 AS idx,
        |         lead(v) OVER (ORDER BY v) AS nxt
        |  FROM joined)
        |SELECT CAST(idx AS INT) AS class_idx, clabel AS label,
        |       v AS lo, coalesce(nxt, v + 1) AS hi, 5 AS out
        |FROM ordered""".stripMargin
  )
}
