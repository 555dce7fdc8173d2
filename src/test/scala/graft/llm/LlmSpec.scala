package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LLM-pipeline operator unit tests on tiny in-memory corpora. */
class LlmSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("Dedup.exact groups identical content, keeps min id") {
    val d = docsDf((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val out = Dedup.exact(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("Dedup.shingles: word 3-grams, distinct, short docs yield none") {
    val d = docsDf((1L, "a b c d"), (2L, "a b"))
    val sh = Dedup.shingles(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("Dedup.minhashLsh finds a near-dup pair and reports exact Jaccard") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docsDf((1L, base), (2L, base + " extra"), (3L, "p q r s t u v w"))
    val pairs = Dedup.minhashLsh(d, col("doc_id"), col("text"), threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc1 has 28 shingles, doc2 those plus 1 new -> J = 28/29
    assert(pairs.toSeq == Seq((1L, 2L, 28.0 / 29.0)))
  }

  test("ingestLsh maintains the index: ingest 2 catches a batch1-batch2 " +
       "pair that only the appended batch-1 signatures could surface") {
    val idxPath = java.nio.file.Files
      .createTempDirectory("lsh-ingest").toString + "/idx"
    // base corpus: mutually dissimilar docs
    val base = docsDf((1 to 20).map(i =>
      (i.toLong, (1 to 12).map(w => s"b${i}w$w").mkString(" "))): _*)
    Dedup.bandSignatures(base, col("doc_id"), col("text"))
      .write.parquet(idxPath)
    // batch 1: a BRAND-NEW doc, unrelated to base — ingest 1 must
    // report nothing, but must still index it
    val t1 = (1 to 12).map(w => s"nw$w").mkString(" ")
    val b1 = docsDf((1000L, t1))
    val all1 = base.unionByName(b1)
    val p1 = Dedup.ingestLsh(idxPath, b1, col("doc_id"), col("text"),
      all1, col("doc_id"), col("text"))
    assert(p1.count() === 0L)
    // batch 2: a near-dup of the batch-1 doc only. The resulting pair
    // can ONLY come from b1's signatures appended by ingest 1.
    val b2 = docsDf((2000L, t1 + " tail"))
    val p2 = Dedup.ingestLsh(idxPath, b2, col("doc_id"), col("text"),
      all1.unionByName(b2), col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // t1 has 10 shingles; b2 those plus 1 -> J = 10/11
    assert(p2.toSeq == Seq((1000L, 2000L, 10.0 / 11.0)))
  }

  test("simhash16 equal for identical docs, in 16-bit range") {
    val d = docsDf((1L, "a b c d e"), (2L, "a b c d e"), (3L, "zz yy xx"))
    val m = Dedup.simhash16(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m.values.forall(v => v >= 0 && v < 65536))
  }

  test("Similarity.cosine: orthogonal -> 0, identical -> 1") {
    val row = spark.range(1).select(
      Similarity.cosine(typedLit(Seq(1.0, 0.0)), typedLit(Seq(0.0, 1.0))).as("o"),
      Similarity.cosine(typedLit(Seq(0.5, 0.5)), typedLit(Seq(0.5, 0.5))).as("i"))
      .head()
    assert(row.getDouble(0) == 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }

  test("CosineSim is bit-exact with the declarative zip_with formulation " +
       "(property), and null on length mismatch / null element") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val genVecs = for {
      n <- Gen.choose(1, 64)
      a <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
      b <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
    } yield (a, b)
    graft.PropCheck.checkProp(Prop.forAll(genVecs) { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(Similarity.cosine(col("a"), col("b")).as("fused"),
                Similarity.cosineDeclarative(col("a"), col("b")).as("decl"))
        .head()
      java.lang.Double.doubleToRawLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(row.getDouble(1))
    }, minTests = 50)
    val edge = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).head()
    assert(edge.isNullAt(0), "length mismatch must be NULL")
    val withNull = Seq(1).toDF("one")
      .select(Similarity.cosine(
        array(lit(1.0), lit(null).cast("double")),
        array(lit(1.0), lit(2.0)))).head()
    assert(withNull.isNullAt(0), "null element must be NULL")
  }

  test("SqDistL2 equals the declarative zip_with fold (property), " +
       "null on length mismatch / null element") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val genVecs = for {
      n <- Gen.choose(1, 64)
      a <- Gen.listOfN(n, Gen.choose(-2097152L, 2097152L))
      b <- Gen.listOfN(n, Gen.choose(-2097152L, 2097152L))
    } yield (a, b)
    graft.PropCheck.checkProp(Prop.forAll(genVecs) { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(KMeans.sqDist(col("a"), col("b")).as("fused"),
                KMeans.sqDistDeclarative(col("a"), col("b")).as("decl"))
        .head()
      row.getLong(0) == row.getLong(1)
    }, minTests = 50)
    val edge = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
      .select(KMeans.sqDist(col("a"), col("b"))).head()
    assert(edge.isNullAt(0), "length mismatch must be NULL")
    val withNull = Seq(1).toDF("one")
      .select(KMeans.sqDist(
        array(lit(1L), lit(null).cast("long")),
        array(lit(1L), lit(2L)))).head()
    assert(withNull.isNullAt(0), "null element must be NULL")
  }

  test("Similarity.topK ranks by cosine desc with id tie-break") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
                     (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.topK(corpus, col("vec_id"), col("embedding"),
        q, col("embedding"), 2)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L))
  }

  test("ivfTopK assigns EVERY vector exactly once, bucket hit or miss") {
    import spark.implicits._
    // stride=2 -> centroids are the even ids. Centroid vectors all start
    // positive (bucket 1); corpus ids 5 and 7 start negative (bucket 0,
    // which holds NO centroid) -> they must take the full-codebook
    // fallback rather than silently dropping out of the index.
    val corpus = Seq(
      (2L, Seq(1.0f, 0.5f)), (4L, Seq(0.8f, 0.6f)), (6L, Seq(0.9f, -0.1f)),
      (3L, Seq(0.7f, 0.7f)), (5L, Seq(-0.9f, 0.2f)), (7L, Seq(-0.8f, -0.4f)))
      .toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    // k = corpus size and nprobe = codebook size: every vector that made
    // it into SOME inverted list must appear in the result
    val got = Similarity.ivfTopK(corpus, col("vec_id"), col("embedding"),
        q, col("embedding"), k = 6, stride = 2, nprobe = 3, coarseBits = 1)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 4L, 5L, 6L, 7L),
      s"fallback-assigned vectors must stay searchable, got $got")
  }

  test("vocabOov: tokens outside the top-V vocabulary count as OOV") {
    import spark.implicits._
    // corpus frequencies: a=4, b=3, c=2, z=1 -> vocab(2) = {a, b}
    val d = docsDf(
      (1L, "a a b c"), (2L, "a b b z"), (3L, "a c"))
    val got = TextAnalysis.vocabOov(d, col("doc_id"), col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getDouble(3))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 1L, 0.25), (2L, 4L, 1L, 0.25),
                      (3L, 2L, 1L, 0.5)))
  }

  test("TextAnalysis.langId recovers the dominant-vocabulary language") {
    import spark.implicits._
    val d = Seq(
      (1L, "hello world hello there", "en"),
      (2L, "hello world again today", "en"),
      (3L, "hola mundo hola amigo", "es"),
      (4L, "hola mundo bueno dia", "es"))
      .toDF("doc_id", "text", "lang")
    val pred = TextAnalysis.langId(d, col("doc_id"), col("text"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "en", 2L -> "en", 3L -> "es", 4L -> "es"))
  }

  test("Multimodal decodeFeature: REAL BMP decode + nearest-neighbor " +
       "resize matches the arithmetic replay through the sampling map") {
    import Multimodal._
    val id = 77L
    val row = MediaRow(id, MediaCodec.encodeBmp(8, 4, bmpPixels(id, 8, 4)),
      MediaMeta("en", "s"), 3)
    // replay: output pixel (ox,oy) samples source s = oy*16 + ox*2
    var want = 0L
    for (oy <- 0 until 2; ox <- 0 until 4) {
      val s = oy * 16 + ox * 2
      val v = (id * 31 + s * 7) % 256 + (id * 17 + s * 11) % 256 +
              (id * 13 + s * 3) % 256
      want += (1L + oy * 4 + ox) * v
    }
    assert(decodeFeature(row) == MediaFeature(id, "en", 3, want))
  }

  test("Multimodal resizeNearest is a genuine sampling map, not a " +
       "byte truncation: downscale picks every second pixel") {
    import Multimodal._
    // 4x2 image with distinct pixels; resize to 2x1 keeps (0,0),(2,0)
    val bgr = Array.tabulate[Byte](4 * 2 * 3)(_.toByte)
    val out = resizeNearest(MediaCodec.BmpImage(4, 2, bgr), 2, 1)
    assert(out.bgr.toSeq == Seq[Byte](0, 1, 2, 6, 7, 8))
  }

  test("Multimodal frame sampling: REAL AVI decode, stride-2 keeps " +
       "original frame numbers 0,2,4 of the 5-frame container") {
    import Multimodal._
    import spark.implicits._
    val id = 9L
    val rows = Seq(MediaRow(id,
      MediaCodec.encodeAviDib(6, 2, 25,
        (0 until 5).map(f => aviFramePixels(id, f, 6, 2))),
      MediaMeta("en", "s"), 0)).toDS()
    val frames = sampleFrames(spark, rows, stride = 2).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    val want = frames.map { fr =>
      var sum = 0L; var wsum = 0L
      for (i <- 0 until 12) {
        val v = (id * 31 + fr.frame_idx * 19 + i * 7) % 256 +
                (id * 17 + fr.frame_idx * 23 + i * 11) % 256 +
                (id * 13 + fr.frame_idx * 29 + i * 3) % 256
        sum += v; wsum += i.toLong * v
      }
      (sum, wsum)
    }
    assert(frames.map(f => (f.sum_ch, f.wsum_ch)).toSeq == want.toSeq)
  }

  test("Multimodal.featuresByLangLabel end-to-end on a tiny corpus") {
    import spark.implicits._
    val docs = Seq((1L, "ab", "en", "s0", 2L), (2L, "cd", "fr", "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val embs = Seq((1L, 5), (2L, 5)).toDF("vec_id", "label")
    def feat(id: Long): Long = {
      var w = 0L
      for (oy <- 0 until 2; ox <- 0 until 4) {
        val s = oy * 16 + ox * 2
        w += (1L + oy * 4 + ox) * ((id * 31 + s * 7) % 256 +
          (id * 17 + s * 11) % 256 + (id * 13 + s * 3) % 256)
      }
      w
    }
    val out = Multimodal.featuresByLangLabel(spark, docs, embs)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(("en", 5, 1L, feat(1L)), ("fr", 5, 1L, feat(2L))))
  }

  test("minhashLsh recall: generated pairs with exact J >= 0.8 are all " +
       "found, with the exact Jaccard reported (property)") {
    import graft.PropCheck.checkProp
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    // With (k=32, b=16, r=2) a J>=0.8 pair is missed with probability
    // <= (1-0.8^2)^16 ~= 8e-8 (Dedup.scala band bound) — across the
    // handful of generated corpora here, expected misses ~0, so the
    // property can assert EXACT recall (a single failure would signal a
    // real banding bug, not bad luck).
    val pairGen = for {
      len <- Gen.chooseNum(25, 40)
      drop <- Gen.chooseNum(0, 4)
    } yield (len, drop)
    checkProp(Prop.forAll(Gen.listOfN(4, pairGen)) { specs =>
      val docs = specs.zipWithIndex.flatMap { case ((len, drop), i) =>
        // pair i: a base doc and a variant with `drop` tail words swapped
        // for fresh ones; vocabularies are disjoint across pairs, so
        // cross-pair Jaccard is 0 and the only true pairs are (2i, 2i+1)
        val base = (0 until len).map(j => s"p${i}w$j")
        val variant = base.dropRight(drop) ++
          (0 until drop).map(j => s"p${i}x$j")
        Seq((2L * i, base.mkString(" ")),
            (2L * i + 1, variant.mkString(" ")))
      } :+ ((1000L, (0 until 30).map(j => s"noise$j").mkString(" ")))
      def sh3(s: String): Set[String] = s.split(" ").toSeq.sliding(3)
        .filter(_.size == 3).map(_.mkString(" ")).toSet
      val byId = docs.toMap
      val expected = specs.indices.flatMap { i =>
        val a = sh3(byId(2L * i)); val b = sh3(byId(2L * i + 1))
        val j = (a & b).size.toDouble / (a | b).size
        if (j >= 0.8) Some(((2L * i, 2L * i + 1), j)) else None
      }.toMap
      val df = docs.toDF("doc_id", "text")
      val found = Dedup.minhashLsh(df, col("doc_id"), col("text"),
          threshold = 0.8)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // the exact inverted-index path must agree with both the expected
      // set and the LSH path — approximate-candidates vs exact-index
      // cross-validation on the same corpus
      val exact = Dedup.ngramJaccard(df, col("doc_id"), col("text"),
          threshold = 0.8)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      found.keySet == expected.keySet &&
        exact.keySet == expected.keySet &&
        expected.forall { case (k, j) =>
          math.abs(found(k) - j) < 1e-9 && math.abs(exact(k) - j) < 1e-9 }
    }, minTests = 5)
  }

  test("containmentPairs is asymmetric: a quoted half scores 1.0 one way, " +
       "below threshold the other, and Jaccard misses the pair entirely") {
    val full = (1 to 20).map(i => s"w$i").mkString(" ")       // 18 shingles
    val half = (1 to 10).map(i => s"w$i").mkString(" ")       // 8, all ⊂ full
    val d = docsDf((1L, full), (2L, half), (3L, "p q r s t u v x"))
    val got = Dedup.containmentPairs(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(2), r.getLong(3))).toSet
    // only half→full: C(2→1) = 8/8; C(1→2) = 8/18 < 0.9 is absent
    assert(got == Set((2L, 1L, 8L, 8L)))
    // the symmetric gate is blind to the same pair: J = 8/18 < 0.8
    assert(Dedup.ngramJaccard(d, col("doc_id"), col("text"),
      threshold = 0.8).collect().isEmpty)
  }

  test("containmentPairs prefix length survives the ceil(0.9·20) ulp trap") {
    // |A| = 20 shingles: binary-double ceil(0.9·20) = 19 would shrink the
    // prefix to 2 probes; integer arithmetic keeps the safe 3. A doc
    // missing exactly A's 2 rarest shingles (out of 22 words = 20
    // shingles) still reaches C = 18/20 = 0.9 and MUST be found.
    val a = (1 to 22).map(i => s"w$i").mkString(" ")
    // b drops a's first 2 words -> loses exactly the 2 shingles starting
    // at w1 and w2 (df = 1, so they are a's 2 RAREST probes); with the
    // buggy prefix of 2 those are the only probes and the pair is missed
    val b = (3 to 22).map(i => s"w$i").mkString(" ")
    val d = docsDf((1L, a), (2L, b))
    val got = Dedup.containmentPairs(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(2), r.getLong(3))).toSet
    // C(1→2) = 18/20 = 0.9 exactly (boundary); C(2→1) = 18/18 = 1.0
    assert(got == Set((1L, 2L, 20L, 18L), (2L, 1L, 18L, 18L)))
  }

  test("lineDedup keeps the lowest (doc_id, pos) copy of a duplicated " +
       "line, including intra-doc repeats, and rewrites the rest") {
    val d = docsDf(
      (1L, "a b\nc d\na b"),     // intra-doc repeat: pos 3 removed
      (2L, "c d\nx y"),          // "c d" removed (keeper is doc 1 pos 2)
      (3L, "x y\nz z"))          // "x y" removed (keeper is doc 2 pos 2)
    val got = Dedup.lineDedup(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getString(3))).toSet
    assert(got == Set(
      (1L, 3L, 1L, "a b\nc d"),
      (2L, 2L, 1L, "x y"),
      (3L, 2L, 1L, "z z")))
  }

  test("dedupClusters: chain, triangle, and pair all collapse to min id") {
    import spark.implicits._
    // chain 1-2-3 (1 and 3 NOT directly paired), triangle 10-11-12,
    // isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
                    (10L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val got = Dedup.dedupClusters(pairs, col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L),
                      (10L, 10L), (11L, 10L), (12L, 10L),
                      (20L, 20L), (21L, 20L)))
  }

  test("dedupClusters converges past maxIter-bounded long chains") {
    import spark.implicits._
    // a 40-node path: diameter 39 EXCEEDS the default maxIter=25, so
    // plain one-hop propagation would exit with silently-wrong labels on
    // nodes 26..39 — pointer jumping must converge in ~log2(39) rounds
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = Dedup.dedupClusters(pairs, col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L to 39L).map(i => (i, 0L)).toSet)
  }

  test("redactPii replaces email/phone/IP with sentinels and counts them") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a.b+c@x-y.org now"),
      (2L, "call 555-123-4567 or 555.987.6543"),
      (3L, "host 192.168.0.1 up"),
      (4L, "clean text, no pii 12345")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("mail <EMAIL> now", 1L)))
    assert(got(2L) == (("call <PHONE> or <PHONE>", 2L)))
    assert(got(3L) == (("host <IP> up", 1L)))
    assert(got(4L) == (("clean text, no pii 12345", 0L)))
  }

  test("redactPii property: k planted PII items -> k redactions, none left") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    // words are pure lowercase alpha, so no accidental pattern hits: the
    // expected redaction count is exactly the number of planted items
    val word = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val email = for { a <- word; b <- word } yield s"$a@$b.com"
    val d3 = Gen.listOfN(3, Gen.numChar).map(_.mkString)
    val phone = for { a <- d3; b <- d3; c <- Gen.listOfN(4, Gen.numChar) }
      yield s"$a-$b-${c.mkString}"
    val ip = Gen.listOfN(4, Gen.choose(1, 255)).map(_.mkString("."))
    val gen = for {
      ws <- Gen.nonEmptyListOf(word)
      ps <- Gen.listOf(Gen.oneOf(email, phone, ip))
    } yield (ws, ps)
    graft.PropCheck.checkProp(Prop.forAll(gen) { case (ws, ps) =>
      // interleave deterministically: word, pii, word, pii, ...
      val txt = ws.zipAll(ps.map(Option(_)), "pad", None)
        .flatMap { case (w, p) => w +: p.toSeq }.mkString(" ")
      val r = TextAnalysis.redactPii(
          Seq((1L, txt)).toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .collect().head
      r.getLong(2) == ps.length &&
        r.getString(1).count(_ == '<') == ps.length &&
        !r.getString(1).contains("@")
    }, minTests = 10)
  }

  test("redactPii counts overlapping PII once, matching replacements made") {
    import spark.implicits._
    // the email consumes the IP-shaped local part: ONE replacement
    val d = Seq((1L, "reach me at 1.2.3.4@corp.com")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(d, col("doc_id"), col("text"))
      .collect().head
    assert(r.getString(1) == "reach me at <EMAIL>")
    assert(r.getLong(2) == 1L)
  }

  test("repetition emits a row for NULL-text docs instead of dropping it") {
    import spark.implicits._
    val d = Seq((1L, Some("a b a b")), (2L, None))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetition(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(2L) == ((0.0, 0.0)))
  }

  test("repetition: top-word and duplicate-bigram fractions per doc") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e"),        // all distinct: top 1/5, dup bigrams 0
      (2L, "x x x x"),          // one word: top 1.0; bigrams all "x x" -> 1 - 1/3
      (3L, "w")                 // single token: dup 0, top 1.0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((0.2, 0.0)))
    assert(got(2L) == ((1.0, math.rint((1.0 - 1.0 / 3) * 1e6) / 1e6)))
    assert(got(3L) == ((1.0, 0.0)))
  }

  test("decontaminate drops docs sharing any benchmark n-gram, keeps rest") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox appears"),        // shares "quick brown fox"
      (3L, "entirely unrelated words here"),
      (4L, "short doc")                          // < n words: never flagged
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("benchmark text quick brown fox etc"))
      .toDF("text")
    val kept = Dedup.decontaminate(corpus, col("doc_id"), col("text"),
        bench, col("text"), n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
  }

  test("dedupClusters fails loudly when maxIter cannot reach convergence") {
    import spark.implicits._
    // maxIter=1 on a 12-node chain: one propagate+jump round cannot reach
    // the fixpoint, and the exit must be an error, not wrong labels
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupClusters(pairs, col("a_id"), col("b_id"), maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("sequencePack: windows fill in id order, straddlers spill forward") {
    import spark.implicits._
    // source a: 6+3+4 tokens into ctx=8 -> doc2 starts at pos 6 and
    // straddles into pack 1; doc3 starts at pos 1 of pack 1
    val d = Seq((1L, "t t t t t t", "a"), (2L, "t t t", "a"),
                (3L, "t t t t", "a"), (9L, "t t", "b"))
      .toDF("doc_id", "text", "source")
    val got = Packing.sequencePack(d, col("doc_id"), col("text"),
        col("source"), ctx = 8)
      .collect()
      .map(r => (r.getLong(1), (r.getString(0), r.getInt(2), r.getInt(3),
                                r.getInt(4)))).toMap
    assert(got(1L) == (("a", 6, 0, 0)))
    assert(got(2L) == (("a", 3, 0, 6)))
    assert(got(3L) == (("a", 4, 1, 1)))
    assert(got(9L) == (("b", 2, 0, 0)), "strata pack independently")
  }

  test("sequencePack chain invariant on random corpora (property)") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    // per source, walking docs in id order: the first doc starts at
    // (pack 0, pos 0) and each next doc starts exactly where the
    // previous one ended (pos_next == (pos + n) % ctx, pack advances by
    // the tokens consumed) — catches window mis-partitioning/mis-ordering
    val genDocs = Gen.nonEmptyListOf(for {
      src <- Gen.oneOf("a", "b", "c")
      n <- Gen.choose(1, 12)
    } yield (src, n))
    graft.PropCheck.checkProp(Prop.forAll(genDocs) { ds =>
      val ctx = 8
      val rows = ds.zipWithIndex.map { case ((src, n), i) =>
        (i.toLong, Seq.fill(n)("t").mkString(" "), src) }
      val got = Packing.sequencePack(rows.toDF("doc_id", "text", "source"),
          col("doc_id"), col("text"), col("source"), ctx)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
                   r.getInt(4)))
        .groupBy(_._1).values.forall { perSrc =>
          val docs = perSrc.sortBy(_._2)
          docs.head._4 == 0 && docs.head._5 == 0 &&
          docs.sliding(2).forall {
            case Array((_, _, n, pk, pos), (_, _, _, pk2, pos2)) =>
              val cum = pk.toLong * ctx + pos + n
              pk2 == cum / ctx && pos2 == cum % ctx
            case _ => true
          }
        }
      got
    }, minTests = 30)
  }

  test("dedupClusters equals union-find on random graphs (property)") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val genEdges = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    graft.PropCheck.checkProp(Prop.forAll(genEdges) { es =>
      // reference: plain union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(k => k -> find(k)).toMap
      val got = Dedup.dedupClusters(es.toDF("a_id", "b_id"),
          col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      got == expected
    }, minTests = 10)
  }

  test("stratified sampling is deterministic, disjoint, and rate-accurate") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i, s"src${i % 4}"))
    val df = rows.toDF("doc_id", "source")
    val rates = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0)
    def run() = Sampling.stratified(df, col("doc_id"), col("source"),
        rates, defaultRate = 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s1 = run()
    assert(s1 == run(), "must be a pure function of the row")
    val bySrc = s1.groupBy(_._2).view.mapValues(_.size).toMap
    // 1000 candidates per stratum; binomial 4-sigma tolerance
    assert(math.abs(bySrc.getOrElse("src0", 0) - 500) < 64)
    assert(math.abs(bySrc.getOrElse("src1", 0) - 250) < 55)
    assert(bySrc.getOrElse("src2", 0) == 0, "rate 0 keeps nothing")
    assert(bySrc.getOrElse("src3", 0) == 1000, "default rate 1 keeps all")
    // sampling never invents rows and respects the stratum partition
    assert(s1.forall { case (id, src) => src == s"src${id % 4}" })
  }

  test("semDedup contract: drops are a subset of exact all-pairs near-dups " +
       "with identical keeper cosines, and survivors plus drops = corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // filter, not limit: limit without orderBy has no guaranteed row
    // selection under multi-partition scans, and the twin count below
    // is asserted exactly
    val corpus = graft.table(spark, dir, "embeddings")
      .filter(col("vec_id") < 120)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      // plant twins of every 10th vector so clusters genuinely dedup
      .unionByName(graft.table(spark, dir, "embeddings")
        .filter(col("vec_id") < 120 && col("vec_id") % 10 === 0)
        .select((col("vec_id") + 5000L).as("vec_id"),
          Similarity.asDouble(col("embedding")).as("v")))
    val n = corpus.count()
    val dropped = Similarity.semDedup(corpus, col("vec_id"), col("v"),
        k = 4, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // exact all-pairs ground truth (the O(n^2) baseline)
    val exact = Similarity.cosineNearDup(corpus, col("vec_id"), col("v"),
        threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (a, b, cs) => (b, a) -> cs }.toMap
    assert(dropped.nonEmpty, "planted identical twins must be dropped")
    dropped.foreach { case (vecId, keptId, cs) =>
      assert(keptId < vecId, "keeper must be the lower id")
      assert(exact.contains((vecId, keptId)),
        s"semDedup reported ($vecId dup-of $keptId) not in the exact set")
      assert(exact((vecId, keptId)) == cs,
        "keeper cosine must equal the exact pair's cosine")
    }
    // identical twins can never be separated by a NEAREST-centroid
    // assignment ... unless an equidistant tie broke differently, which
    // the integer grid makes impossible for bit-identical vectors: all
    // 12 planted twins must be found
    assert(dropped.count(_._1 >= 5000L) == 12,
      "every planted identical twin is cluster-mates with its original")
    assert(dropped.map(_._1).distinct.length == dropped.length,
      "a vector is dropped at most once")
    assert(dropped.length < n, "dedup must keep at least the keepers")
  }

  test("split assignment: family-hash never straddles where doc-hash " +
       "provably would, and splits partition the corpus") {
    import org.apache.spark.sql.functions.{col, countDistinct, count => cnt}
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.LlmQueries.pipeSplitAssign(spark, dir).collect()
    assert(out.nonEmpty && out.forall(_.getLong(3) == 0L),
      "family-keyed assignment must have zero straddling families")
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // the contrast: assigning by DOC hash on the same corpus straddles
    // at least one planted near-dup family across splits
    val corpus = graft.ops.LlmQueries.docsWithNearDupChains(spark, dir)
    val clusters = Dedup.dedupClusters(
      Dedup.ngramJaccard(corpus, col("doc_id"), col("text")),
      col("a_id"), col("b_id"))
    val byDoc = clusters.select(col("doc_id"),
        org.apache.spark.sql.functions.least(col("doc_id"),
          col("cluster_id")).as("family"),
        graft.ops.LlmQueries.splitOf(col("doc_id")).as("split"))
      .groupBy("family").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(byDoc > 0,
      "doc-hash assignment must straddle on the planted chain corpus")
    spark.catalog.clearCache()
  }

  test("sq8TopK: codes bounded to ±127, max component saturates, " +
       "exact on axis-aligned vectors, zero vectors excluded") {
    import spark.implicits._
    // axis-aligned corpus: vector i points along axis i with length
    // varying; the query points along axis 1, so the int8 dot picks
    // exactly the axis-1 vectors, ranked by their true magnitude
    val corpus = Seq(
      (1L, Array(0.5f, 0f, 0f, 0f)),     // axis 1, mid
      (2L, Array(1.0f, 0f, 0f, 0f)),     // axis 1, long
      (3L, Array(0f, 1.0f, 0f, 0f)),     // orthogonal
      (4L, Array(-1.0f, 0f, 0f, 0f)),    // anti-parallel
      (5L, Array(0f, 0f, 0f, 0f))        // zero vector -> excluded
    ).toDF("vec_id", "embedding")
    val query = Seq((0L, Array(1.0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.sq8TopK(corpus, col("vec_id"), col("embedding"),
        query, col("embedding"), k = 4).collect()
    // ranked: both axis-1 vectors saturate to code 127 (per-vector
    // scale), so qdot ties at 127·127 and the CANDIDATE scale m breaks
    // the tie: id 2 (m = 2^20) over id 1 (m = 2^19); then orthogonal
    // (dot 0), then anti-parallel (negative). Zero vector never appears.
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L, 3L, 4L))
    val byId = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(2L) == 127L * 127L && byId(1L) == 127L * 127L)
    assert(byId(3L) == 0L && byId(4L) == -127L * 127L)
    assert(got.map(_.getInt(3)).toSeq == Seq(1, 2, 3, 4))
  }

  test("d43 sssp: hand graph — relaxation beats the greedy path, the " +
       "horizon truncates, weights must be non-negative") {
    import spark.implicits._
    // 0→1 direct costs 5; 0→2→1 costs 2 — relaxation must prefer it.
    // 3 sits one hop past 1; 5 is reachable only by a 3-hop chain.
    val edges = Seq(
      (0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 1L),
      (1L, 3L, 1L), (3L, 5L, 1L), (8L, 9L, 1L)) // 8→9 unreachable from 0
      .toDF("s", "t", "w")
    def run(rounds: Int): Map[Long, Long] =
      Graph.sssp(edges, col("s"), col("t"), col("w"), source = 0L,
          rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = run(8)
    assert(full == Map(0L -> 0L, 1L -> 2L, 2L -> 1L, 3L -> 3L, 5L -> 4L),
      s"unexpected distances: $full")
    // a 2-round horizon cannot reach node 5 (3 hops away) and still
    // must have relaxed 1 down to 2 via the cheap detour
    val cut = run(2)
    assert(!cut.contains(5L) && cut(1L) == 2L, s"horizon wrong: $cut")
    intercept[IllegalArgumentException] {
      Graph.sssp(Seq((0L, 1L, -1L)).toDF("s", "t", "w"),
        col("s"), col("t"), col("w"), 0L).collect()
    }
  }
}
