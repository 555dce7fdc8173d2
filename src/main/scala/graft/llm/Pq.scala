package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the MEMORY half of IVF-PQ, completing the
  * ANN family (D3: brute / sign-LSH / IVF / trained-IVF): each vector is
  * split into `m` subvectors and every subvector replaced by the id of
  * its nearest subspace centroid, so a stored vector is m small codes
  * (m bytes at 256 centroids) instead of 4·dim bytes — the compression
  * that lets a 100 TB vector corpus sit in executor memory. Queries
  * score by ADC (asymmetric distance computation): one per-subspace
  * distance table from the query to the codebook, then a vector's
  * approximate distance is m table lookups summed — no original vectors
  * touched at probe time.
  *
  * Everything runs on [[KMeans.Scale]]'s 2^20 integer grid, so subspace
  * distances, code assignment, and ADC sums are EXACT integers —
  * order-independent and oracle-reproducible (the [[KMeans]] policy).
  *
  * Plan shape: the codebook is a stride sample (a trained
  * [[KMeans.codebook2]] per subspace drops in the same way the IVF
  * coarse quantizer does) and is BROADCAST everywhere it appears; code
  * assignment is a map-side min_by reduced on (vec_id, subspace); the
  * probe is a broadcast lookup-table join plus one keyed sum. Nothing
  * shuffles vector payloads except the one assignment reduce.
  */
object Pq {

  /** Explode a quantized vector into its `m` subvectors:
    * (…, j, subv) for j in 0..m-1. A dimension not divisible by m
    * ERRORS in-plan (raise_error) — integer-dividing would silently
    * drop the trailing dimensions from every code and distance. */
  private def subspaces(df: DataFrame, qvCol: String, m: Int): DataFrame = {
    val sz = size(col(qvCol))
    val subdim = when(pmod(sz, lit(m)) === 0, (sz / m).cast("int"))
      .otherwise(raise_error(concat(
        lit(s"pq: embedding dim "), sz.cast("string"),
        lit(s" not divisible by m=$m"))).cast("int"))
    df.withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("subv", slice(col(qvCol), col("j") * subdim + 1, subdim))
  }

  /** PQ-encode the corpus against a stride-sampled codebook and return
    * the approximate (ADC) top-k nearest to the single query vector:
    * (vec_id, approx, rank) with `approx` the exact integer ADC score. */
  def pqTopK(corpus: DataFrame, id: Column, emb: Column,
             query: DataFrame, queryEmb: Column, k: Int,
             m: Int = 8, stride: Long = 31): DataFrame = {
    // materialize the quantized corpus ONCE: q0 feeds the code
    // assignment AND the sampled codebook (which itself appears twice —
    // assignment and ADC table), so without truncation the parquet scan
    // + quantize transform runs three times per probe; byId partitions
    // it for the ×codebook assignment expansion (see KMeans.byId)
    val q0 = KMeans.byId(
        corpus.select(id.as("vec_id"), KMeans.quantize(emb).as("qv")))
      .localCheckpoint()
    // `stride` is a FLOOR: the effective stride grows with the corpus
    // so the codebook CAPS at ~256 centroids per subspace (the PQ
    // standard). A fixed stride makes the codebook n/stride — code
    // assignment then costs n²·m/stride, and the sf1 soak measured
    // exactly that: 48× wall for 10× vectors. The cap restores the
    // linear n·256·m assignment; the count is one cached-checkpoint
    // action, and the oracle replays the same greatest(floor, n/256).
    val effStride = math.max(stride, q0.count() / 256)
    val sampled = q0.filter(col("vec_id") % effStride === 0)
    // an id space with no multiple of `stride` would yield an empty
    // codebook and a silent 0-row answer — fail loudly instead (the
    // same contract as subspaces' non-divisible-dimension raise_error)
    require(!sampled.isEmpty,
      s"pq: stride=$stride selects no codebook vectors from the corpus")
    val corpSub = subspaces(q0, "qv", m).select("vec_id", "j", "subv")
    val cents = subspaces(
        sampled.select(col("vec_id").as("cid"), col("qv")), "qv", m)
      .select(col("cid"), col("j"), col("subv").as("csub"))
    // code assignment: nearest subspace centroid, ties to the lowest cid
    // — map-side partial min_by, one (vec_id, j) reduce
    val codes = corpSub.join(broadcast(cents), "j")
      .select(col("vec_id"), col("j"), col("cid"),
              KMeans.sqDist(col("subv"), col("csub")).as("d"))
      .groupBy("vec_id", "j")
      .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("code"))
    // ADC distance table: query subvector -> every subspace centroid
    val qSub = subspaces(
        query.select(KMeans.quantize(queryEmb).as("qv")).limit(1), "qv", m)
      .select(col("j"), col("subv").as("qsub"))
    val dt = cents.join(broadcast(qSub), "j")
      .select(col("j"), col("cid"),
              KMeans.sqDist(col("qsub"), col("csub")).as("dq"))
    // probe: m lookups + one keyed sum per vector, then the top-k cut
    codes.join(broadcast(dt),
        codes("j") === dt("j") && codes("code") === dt("cid"))
      .groupBy("vec_id")
      .agg(sum(col("dq")).as("approx"))
      .orderBy(col("approx").asc, col("vec_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("approx").asc, col("vec_id").asc)))
  }

  /** IVF-PQ — the production ANN index, composing the two halves this
    * family built separately: a TRAINED coarse quantizer
    * ([[KMeans.codebook2Q]], two Lloyd iterations) ROUTES every vector
    * to an inverted list, and TRAINED per-subspace codebooks
    * ([[KMeans.codebook2By]] — all m subspace k-means problems in ONE
    * grouped-Lloyd plan, no per-subspace driver loop) COMPRESS it to m
    * codes scored by ADC. A query probes its `nprobe` nearest coarse
    * centroids and ADC-scores only those lists' codes.
    *
    * Everything — routing, training, codes, distance table — is exact
    * integer L2 on the 2^20 grid, so the oracle replays bit-identically.
    * Codes encode the RAW vector (FAISS's by_residual=false flavor):
    * routing and compression stay independent, which is what lets the
    * subspace training share one grouped plan.
    *
    * Plan shape at scale: both codebooks are tiny and BROADCAST; code
    * assignment is one (vec_id, j) reduce; routing one (vec_id) reduce.
    * At 100 TB the coarse cid is the vector store's partition column and
    * codes are precomputed at ingest — a probe prunes to nprobe
    * partitions and reads m-byte codes, never raw vectors. Nothing here
    * is all-pairs and no corpus-sized side is ever collected. */
  def ivfPqTopK(corpus: DataFrame, id: Column, emb: Column,
                query: DataFrame, queryEmb: Column, k: Int,
                kc: Int = 8, ksub: Int = 16, m: Int = 8,
                nprobe: Int = 2): DataFrame = {
    // byId: both materialized views below feed ×codebook expansions
    // (coarse routing, subspace code assignment) — see KMeans.byId
    val q0 = KMeans.byId(
        corpus.select(id.as("vec_id"), KMeans.quantize(emb).as("qv")))
      .localCheckpoint()
    // coarse quantizer: trained on the full vectors, integer grid
    val coarse = KMeans.codebook2Q(q0, kc).cache()
    // route every vector to its nearest coarse centroid (ties lowest cid)
    val routed = q0.crossJoin(broadcast(coarse))
      .select(col("vec_id"), col("cid"),
              KMeans.sqDist(col("qv"), col("cv")).as("d"))
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("ccid"))
    // subspace split, materialized once: it feeds seeding, two Lloyd
    // iterations, and code assignment
    val subs = KMeans.byId(subspaces(q0, "qv", m)
        .select(col("vec_id"), col("j"), col("subv").as("qv")))
      .localCheckpoint()
    val sb = KMeans.codebook2By(subs, ksub, "j").cache()
    // m codes per vector: nearest trained subspace centroid
    val codes = subs.join(broadcast(sb), "j")
      .select(col("vec_id"), col("j"), col("cid"),
              KMeans.sqDist(col("qv"), col("cv")).as("d"))
      .groupBy("vec_id", "j")
      .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("code"))
    // query: probe list + per-subspace ADC distance table
    val qq = query.select(KMeans.quantize(queryEmb).as("qv")).limit(1)
    val probes = coarse.crossJoin(broadcast(qq))
      .select(col("cid"), KMeans.sqDist(col("cv"), col("qv")).as("d"))
      .orderBy(col("d").asc, col("cid").asc)
      .limit(nprobe)
    val qSub = subspaces(qq, "qv", m).select(col("j"), col("subv").as("qsub"))
    val dt = sb.join(broadcast(qSub), "j")
      .select(col("j"), col("cid"), KMeans.sqDist(col("qsub"), col("cv")).as("dq"))
    // probe: keep only vectors routed to a probed list, then m table
    // lookups + one keyed sum each — the ADC scan of nprobe lists
    val inList = routed
      .join(broadcast(probes.select(col("cid").as("ccid"))), "ccid")
      .select("vec_id")
    codes.join(inList, Seq("vec_id"), "left_semi")
      .join(broadcast(dt),
        codes("j") === dt("j") && codes("code") === dt("cid"))
      .groupBy("vec_id")
      .agg(sum(col("dq")).as("approx"))
      .orderBy(col("approx").asc, col("vec_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("approx").asc, col("vec_id").asc)))
  }
}
