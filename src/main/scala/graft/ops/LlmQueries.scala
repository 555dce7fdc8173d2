package graft.ops

import graft._
import graft.llm.{Bpe, Dedup, Graph, HostRank, KMeans, Multimodal, Packing, Pq, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline queries (SURVEY §2.B D1–D6) over the
  * `documents` / `embeddings` fixtures, each with a DuckDB oracle.
  *
  * The fixtures contain no duplicates, so dedup queries first inject
  * deterministic duplicates/near-duplicates (a SQL-expressible
  * construction the oracle repeats verbatim): exact copies for D1,
  * one-word-appended copies for D2 (word-3-gram Jaccard ≈ s/(s+1) ≥ 0.8),
  * first-coordinate-perturbed vectors for embedding near-dup (cos ≈ 1).
  */
object LlmQueries {

  // ---------- corpora with injected duplicates ----------

  private def docs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")

  /** documents ∪ exact copies of every 7th doc (new ids +2000000). */
  private def docsWithExactDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
  }

  /** documents ∪ near-dup copies of every 10th doc: one appended word
    * (new ids +1000000). */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" qqzz")).as("text")))
  }

  /** documents ∪ the first ceil(w/2) words of every 9th doc (new ids
    * +5000000) — a PREFIX half quoted whole inside its original. The
    * planted pair's containment C(half→full) is exactly 1.0 (a prefix's
    * shingle set is a subset of the full doc's) while its Jaccard is
    * ≈ 0.5 — below every symmetric near-dup threshold in this suite, so
    * the pair is visible ONLY to the asymmetric measure. Integer word
    * arithmetic ((w+1) div 2) on both engines; halves under 3 words
    * produce no shingles and drop out identically on both sides. */
  private def docsWithContainments(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, " +
          "(size(split(text, ' ')) + 1) div 2), ' ')").as("text")))
  }

  /** documents ∪ TWO suffix generations of every 10th doc: +1000000 (one
    * appended word) and +3000000 (three appended words). For a base doc
    * of w words the 3-gram Jaccards are (w-2)/(w-1) base~A, (w-1)/(w+1)
    * A~B, (w-2)/(w+1) base~B — so docs of 10–13 words produce a CHAIN
    * (base~A and A~B pass t=0.8, base~B does not) and longer docs a
    * triangle. The chain is the case where pairwise dedup over-deletes
    * and only the transitive closure clusters correctly. */
  def docsWithNearDupChains(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val tenth = d.filter(col("doc_id") % 10 === 0)
    d.unionByName(tenth.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" qqzz")).as("text")))
      .unionByName(tenth.select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" qqzz wwoo eeyy")).as("text")))
  }

  /** embeddings (as double arrays) ∪ perturbed copies of every 20th
    * vector: first coordinate +0.05 (new ids +1000000). */
  private def embsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    e.unionByName(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(element_at(col("v"), 1) + 0.05),
               slice(col("v"), 2, 63)).as("v")))
  }

  // ---------- queries ----------

  def d1DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docsWithExactDups(s, dir), col("doc_id"), col("text"))

  def d2MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docsWithNearDups(s, dir), col("doc_id"), col("text"))

  /** Same corpus and threshold as d2_minhash_lsh, different algorithm
    * (exact inverted index vs banded LSH) — the two queries
    * cross-validate each other through the same oracle. */
  def d2NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docsWithNearDups(s, dir), col("doc_id"), col("text"))

  def d2Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash16(docs(s, dir), col("doc_id"), col("text"))

  /** PII redaction over a corpus where every 17th doc carries a planted
    * email + phone + IPv4; the rest must pass through byte-identical. */
  def d10RedactPii(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 17 === 0,
        concat(col("text"),
          lit(" contact bob@example.org or 555-123-4567 from 10.0.0.1")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.redactPii(corpus, col("doc_id"), col("text"))
  }

  /** Gopher-style repetition signals per document, over a corpus where
    * every 11th doc has its own first three words appended — planted
    * duplicate bigrams the filter must score above the originals. */
  def d6Repetition(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(col("text"), lit(" "),
          concat_ws(" ", slice(split(col("text"), " "), 1, 3))).as("text")))
    TextAnalysis.repetition(corpus, col("doc_id"), col("text"))
  }

  /** Every 13th document stands in for a benchmark/eval set; any corpus
    * doc sharing a word 5-gram with it is scrubbed. The benchmark docs
    * are themselves in the corpus, so they are dropped by construction —
    * the embedded-eval-text case the rule exists for. */
  def d9Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.decontaminate(
        d.select(col("doc_id"), col("source"), col("text")),
        col("doc_id"), col("text"),
        d.filter(col("doc_id") % 13 === 0), col("text"), n = 5)
      .select("doc_id", "source")
  }

  /** Near-dup pairs → connected-component dedup clusters (min-id
    * canonical keeper). The chain corpus makes transitivity load-bearing;
    * the oracle recomputes the closure with a recursive CTE. */
  def d2DedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupClusters(
      Dedup.ngramJaccard(docsWithNearDupChains(s, dir),
        col("doc_id"), col("text")),
      col("a_id"), col("b_id"))

  /** D26: TEMPERATURE-sampled multilingual mix (the XLM-R recipe class:
    * sample language l with probability ∝ n_l^α so high-resource
    * languages are down-weighted) at α = 0.5 — chosen because sqrt is
    * IEEE-correctly-rounded and therefore bit-identical in any engine,
    * where pow(x, 0.7) is not. Per-language keep rate =
    * min(1, C/sqrt(n_l)) quantized to a 16-bit integer threshold
    * (floor — exact both engines on a shared double), selection =
    * deterministic md5(doc_id) prefix under the threshold (the d7
    * hash-sampling scheme, rates now DATA-DERIVED instead of fixed).
    * C = 8 makes English (~40% of the corpus) sample at well under
    * half the rate of the tail languages, and sqrt(64) = 8 drives
    * French to exactly rate 1 at the gate SF (t16 = 65536 keeps all —
    * a 4-hex prefix never exceeds 65535, no special case needed). One broadcast of 5
    * thresholds against the corpus — no shuffle of document rows. */
  /** D27: duplicate-span census ([[Dedup.duplicateSpans]], word-8-gram
    * inverted index). Every 11th document re-enters the corpus with a
    * 10-word sentinel phrase appended (ids +4000000): the copy contains
    * the ENTIRE original, so the original's every position reads
    * duplicated (span dedup subsumes exact dedup — 1 span covering the
    * doc), while the copy shows TWO spans — the copied prefix and the
    * phrase interior (shared across all planted copies) — separated by
    * the boundary grams that mix each doc's unique tail into the
    * phrase and therefore occur once. The run-grouping logic is
    * load-bearing, not decorative. Natural cross-doc 8-gram repeats in
    * the word-salad fixture surface identically in both engines. */
  def d27SubstringDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(col("text"),
          lit(" spn0 spn1 spn2 spn3 spn4 spn5 spn6 spn7 spn8 spn9"))
          .as("text")))
    Dedup.duplicateSpans(corpus, col("doc_id"), col("text"), k = 8)
  }

  /** D29: duplicate-span removal ([[Dedup.removeDuplicateSpans]]) over
    * the same planted corpus as d27 — the rewrite the census motivates.
    * Originals (lowest ids) keep their text verbatim and never appear
    * in the output; each planted copy loses its copied prefix AND the
    * sentinel phrase (its keeper is the lowest planted id — which
    * uniquely KEEPS the phrase words, making the min-id rule itself
    * gate-visible), with the boundary words that occur once surviving
    * the cut. The oracle rebuilds new_text with a DuckDB list
    * comprehension over the same 1-based position list — string-exact
    * output, not just counts. Some fixture docs are FULLY covered by
    * lower-id docs' grams (word-salad text over a small vocabulary)
    * and legitimately rewrite to '' — DuckDB's array_to_string of the
    * empty list is NULL where Spark's array_join is '', so the oracle
    * coalesces. */
  def d29SpanRemoval(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(col("text"),
          lit(" spn0 spn1 spn2 spn3 spn4 spn5 spn6 spn7 spn8 spn9"))
          .as("text")))
    Dedup.removeDuplicateSpans(corpus, col("doc_id"), col("text"), k = 8)
  }

  /** D30: asymmetric containment pairs ([[Dedup.containmentPairs]]) over
    * the prefix-half corpus — every planted half is caught at C = 1.0
    * where d2's Jaccard gate would score it ≈ 0.5 and miss. The oracle
    * recomputes containment from the exact all-pairs shingle
    * intersection (no prefix filter), so the prefix-filter completeness
    * argument — missing all |A| − ceil(t·|A|) + 1 rarest probe shingles
    * caps the intersection below threshold — is itself gate-checked. */
  def d30Containment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docsWithContainments(s, dir),
      col("doc_id"), col("text"))

  /** D35: the cross-source contamination matrix over the raw corpus
    * ([[Dedup.sourceOverlap]], word 8-grams — the d27 span length). */
  def d35SourceOverlap(s: SparkSession, dir: String): DataFrame =
    Dedup.sourceOverlap(docs(s, dir), col("source"), col("text"), n = 8)

  /** D31: C4-style line dedup ([[Dedup.lineDedup]]) over a LINED view
    * of the fixture: each doc's words chunked into 4-word
    * newline-joined lines. 4 words over the fixture's ~40-word
    * vocabulary makes natural cross-doc duplicate lines common at
    * every SF — the operator is load-bearing with no planted rows, and
    * intra-doc repeats exercise the keep-first-position rule. The
    * oracle recomputes keepers by (doc_id, pos) window rank over the
    * same chunking and rebuilds new_text with a list comprehension —
    * string-exact, integer-only arithmetic. */
  def d31LineDedup(s: SparkSession, dir: String): DataFrame = {
    val lined = docs(s, dir).select(col("doc_id"),
      expr("array_join(transform(sequence(1, (size(split(text, ' ')) + 3) div 4)," +
        " i -> array_join(slice(split(text, ' '), (i - 1) * 4 + 1, 4), ' ')), " +
        "chr(10))").as("text"))
    Dedup.lineDedup(lined, col("doc_id"), col("text"))
  }

  /** PIPE8: the C4-shaped corpus-prep capstone (Raffel et al. 2020's
    * published cleaning order, re-expressed over the fixture): (1) line
    * the corpus (the d31 4-word chunking standing in for sentence
    * boundaries), (2) corpus-wide line dedup — C4's "discard duplicated
    * lines, keep one occurrence" — via [[Dedup.lineDedup]], (3) the
    * page floor: a document must RETAIN at least 3 lines after dedup
    * (C4 drops pages under 5 sentences; the floor binds on both short
    * docs and dedup casualties, so stage 2 is load-bearing for stage
    * 3), (4) the language gate: [[TextAnalysis.langId]]'s lexicon-vote
    * prediction over the SURVIVING corpus must agree with the recorded
    * lang (C4 keeps pages langdetect calls English — here the
    * classifier and the label must concur, and the lexicon is built
    * from the post-floor corpus, not the raw one), (5) per (lang,
    * source) corpus accounting. `lined` and `floored` each feed 2+
    * plan legs — localCheckpointed, the multi-leg policy. */
  def pipeC4Corpus(s: SparkSession, dir: String): DataFrame = {
    val lined = docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
      expr("array_join(transform(sequence(1, (size(split(text, ' ')) + 3) div 4)," +
        " i -> array_join(slice(split(text, ' '), (i - 1) * 4 + 1, 4), ' ')), " +
        "chr(10))").as("text"))
      .localCheckpoint()
    val rewritten = Dedup.lineDedup(lined, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_removed"), col("new_text"))
    val spaceText = translate(col("text"), "\n", " ")
    val floored = lined.join(rewritten, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        coalesce(col("new_text"), col("text")).as("text"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .filter(size(split(col("text"), "\n")) >= 3)
      .select(col("doc_id"), col("lang"), col("source"),
        spaceText.as("text"), col("n_removed"))
      .localCheckpoint()
    val pred = TextAnalysis.langId(floored, col("doc_id"), col("text"),
      col("lang"))
    floored.join(pred, "doc_id")
      .filter(col("pred_lang") === col("lang"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " ")).cast("long")).as("sum_words"),
           sum(col("n_removed")).as("lines_removed"))
  }

  /** PIPE9: the FineWeb-shaped corpus-prep capstone (Penedo et al.
    * 2024, arXiv:2406.17557 — the published pipeline whose distinctive
    * stages vs C4/CCNet are the URL-level gates and the Gopher rule
    * set), composed in the published order: (1) URL BLOCKLIST — hosts
    * synthesize deterministically from the fixture (the d17/d18
    * machinery: scheme/case/utm/trailing-slash variants; host class =
    * (doc_id%250)%7), two blocked hosts drop their docs; (2)
    * fetch-level CANONICAL-URL dedup — lowercase host + path, query
    * and trailing slash stripped, keep the first doc_id per canonical
    * page (the same page re-crawled under URL variants); (3) language
    * gate — the lexicon-vote classifier trained on the SURVIVING
    * corpus must agree with the recorded label (FineWeb's fastText
    * ≥ 0.65 re-expressed as agreement); (4) the GOPHER rule gate —
    * this round's [[TextAnalysis.gopherRules]] composite keep, the
    * stage FineWeb adds on top of C4's filters; (5) per (lang, source)
    * accounting. Funnel at gate SF: 500 → 358 (blocklist) → 179
    * (canonical dedup) → 40 (langid ∩ gopher) — every stage
    * load-bearing with no planted rows. `kept` feeds the lexicon, the
    * gopher stats, and the final join — localCheckpointed (multi-leg
    * policy). All gates are doc_id-keyed joins; the only fact-grain
    * exchanges are the canonical window and the token aggregates. */
  def pipeFinewebCorpus(s: SparkSession, dir: String): DataFrame = {
    val hostClass = (col("doc_id") % 250) % 7
    val url = concat(
      when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("http://")),
      when(col("doc_id") % 3 === 0,
        concat(lit("H"), hostClass, lit(".Example.ORG")))
        .otherwise(concat(lit("h"), hostClass, lit(".example.org"))),
      lit("/p/"), (col("doc_id") % 250).cast("string"),
      when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit("?utm_source=feed&id="), col("doc_id").cast("string")))
        .otherwise(lit("")))
    val host = lower(parse_url(url, lit("HOST")))
    val canon = concat(host,
      regexp_replace(parse_url(url, lit("PATH")), "/$", ""))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("canon").orderBy("doc_id")
    val kept = docs(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        host.as("host"), canon.as("canon"))
      .filter(!col("host").isin("h3.example.org", "h5.example.org"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "source", "text")
      .localCheckpoint()
    val pred = TextAnalysis.langId(kept, col("doc_id"), col("text"),
      col("lang"))
    val gopherKeep = TextAnalysis.gopherRules(kept, col("doc_id"),
        col("text"), GopherStops)
      .filter(col("keep") === 1).select("doc_id")
    kept.join(pred, "doc_id")
      .filter(col("pred_lang") === col("lang"))
      .join(gopherKeep, "doc_id")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " ")).cast("long")).as("sum_words"))
  }

  /** PIPE7: the CCNet-shaped corpus-prep capstone (Wenzek et al. 2019
    * class: dedup → fastText-style quality model → language-aware
    * sampling), composed from this round's operators the way the
    * published pipeline chains them: (1) duplicate-SPAN removal over
    * the plain corpus (natural cross-doc spans are real in the
    * word-salad fixture — ~70 docs rewrite at gate SF, some to empty),
    * (2) the hashed-feature linear classifier scores the REWRITTEN
    * text (scoring before dedup would let duplicated boilerplate vote)
    * + a 5-token floor that also retires the emptied docs, (3) d26's
    * sqrt-temperature mix with thresholds derived from the SURVIVING
    * language distribution — rates must follow the corpus the earlier
    * gates produced, not the raw one, (4) per-source context-window
    * pack of the rewritten token counts. The rewritten corpus is
    * localCheckpointed where a production pipeline would materialize
    * the stage: it feeds both the classifier and the survivor join,
    * and the span-removal subplan must not run twice. */
  def pipeCcnetCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val removed = Dedup.removeDuplicateSpans(
        d.select(col("doc_id"), col("text")), col("doc_id"), col("text"),
        k = 8)
      .select(col("doc_id"), col("new_text"))
    val rewritten = d.join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        coalesce(col("new_text"), col("text")).as("text"))
      .localCheckpoint()
    val weights = s.range(256).select(col("id").cast("int").as("bucket"),
      ((col("id") * 37) % 101 - 50).as("wt"))
    val gate = TextAnalysis.hashedLinearScore(rewritten, col("doc_id"),
        col("text"), weights, nBuckets = 256)
      .filter(col("keep") && col("n_tok") >= 5)
      .select(col("doc_id"), col("n_tok"))
    val kept = rewritten.join(gate, "doc_id")
    val t16 = kept.groupBy("lang")
      .agg(least(lit(65536L),
        floor(lit(8.0) * 65536 / sqrt(count(lit(1)))).cast("long"))
        .as("t16"))
    val sampled = kept.join(broadcast(t16), "lang")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") < col("t16"))
    Packing.packByCount(sampled, col("doc_id"), col("n_tok"), col("source"),
      ctx = 1024)
  }

  /** PIPE13: the Dolma-shaped corpus-prep capstone (Soldaini et al.
    * 2024, arXiv:2402.00159 — AI2's open pipeline, whose DISTINCTIVE
    * stages vs C4/CCNet/FineWeb/DCLM are in-flight PII MASKING and
    * PARAGRAPH-granular dedup), composed in the published order:
    * (1) language gate first (Dolma runs fastText langid before
    * everything; re-expressed as lexicon-vote agreement, the
    * established fixture form) — the lexicon trains on the full
    * arriving corpus, pre-gate, unlike C4's post-dedup placement;
    * (2) PII masking (d10's email/phone/IP sentinel chain — Dolma
    * masks rather than drops; no other capstone exercises redaction
    * in-pipeline), with PII planted on every 17th doc exactly as the
    * d10 gate plants it, so the stage is non-vacuous; (3) PARAGRAPH
    * dedup — 8-word paragraphs (vs C4's 4-word lines: coarser
    * granularity is the Dolma paper's choice), corpus-wide keep-first
    * via [[Dedup.lineDedup]], then a ≥3-paragraph floor; (4) EXACT
    * document dedup AFTER the rewrite — Dolma's doc-level Bloom pass;
    * rewriting first means docs that became identical BY paragraph
    * removal also collapse; made provably load-bearing the
    * pipe_dclm/semdedup planted-twin way (every 13th surviving doc
    * mirrors at doc_id − 2·10⁶ with source='mirror'; the mirror wins
    * keep-first, moving the accounting row — delete the stage and
    * both copies double-count); (5) per-(lang, source) accounting
    * carrying the two Dolma-specific measures: paragraphs removed and
    * redactions made. Text shuffles only at the paragraph-hash and
    * doc-hash grains ((xxhash64, md5) pairs, never raw text); the
    * lexicon/votes are the langid aggregates; the mirror union is
    * fact-local. Funnel at gate SF: 500 → langid-agreeing survivors →
    * paragraph-floored → mirrors planted → deduped. */
  def pipeDolmaCorpus(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("doc_id") % 17 === 0,
          concat(col("text"), lit(" contact bob@example.org or " +
            "555-123-4567 from 10.0.0.1")))
          .otherwise(col("text")).as("text"))
      .localCheckpoint()
    val pred = TextAnalysis.langId(planted, col("doc_id"), col("text"),
      col("lang"))
    val (red, nred) = TextAnalysis.redactionOf(col("text"))
    val masked = planted.join(pred, "doc_id")
      .filter(col("pred_lang") === col("lang"))
      .select(col("doc_id"), col("lang"), col("source"),
        red.as("text"), nred.as("n_red"))
    val para = masked.select(col("doc_id"), col("lang"), col("source"),
        col("n_red"),
        expr("array_join(transform(sequence(1, (size(split(text, ' ')) + 7)" +
          " div 8), i -> array_join(slice(split(text, ' '), (i - 1) * 8 + 1," +
          " 8), ' ')), chr(10))").as("text"))
      .localCheckpoint()
    val rewritten = Dedup.lineDedup(para, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_removed"), col("new_text"))
    val flo = para.join(rewritten, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("n_red"),
        coalesce(col("new_text"), col("text")).as("text"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .filter(size(split(col("text"), "\n")) >= 3)
      .select(col("doc_id"), col("lang"), col("source"), col("n_red"),
        col("n_removed"), translate(col("text"), "\n", " ").as("text"))
    val withMirror = flo.unionByName(
        flo.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") - 2000000L).as("doc_id"), col("lang"),
            lit("mirror").as("source"), col("n_red"), col("n_removed"),
            col("text")))
      .localCheckpoint()
    val keepIds = withMirror
      .groupBy(xxhash64(col("text")).as("h"), md5(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    withMirror.join(keepIds, Seq("doc_id"), "left_semi")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("sum_words"),
        sum("n_removed").as("paras_removed"),
        sum("n_red").as("sum_redactions"))
  }

  /** PIPE10: the DCLM-Baseline-shaped corpus-prep capstone (Li et al.
    * 2024, arXiv:2406.11794) — the published pipeline whose
    * DISTINCTIVE stage vs C4/CCNet/FineWeb is model-based TOP-SLICE
    * selection: heuristic rules → dedup → classifier keeping the top
    * score quartile. Composed the way the paper chains them:
    * (1) Gopher rule gate over the raw corpus (DCLM adopts
    * RefinedWeb's heuristic stage, which carries the Gopher rules —
    * d33's predicates verbatim), (2) EXACT dedup of the survivors
    * (content-keyed min-id keep — DCLM's Bloom dedup at document
    * granularity; text shuffles as (xxhash64, md5), never as text),
    * (3) the hashed-feature linear classifier scores the DEDUPED
    * survivors (d28's inference: model-as-table → one broadcast array
    * → per-doc codegen fold), (4) keep docs AT OR ABOVE the surviving
    * corpus's 75th score percentile — the threshold derives from the
    * score HISTOGRAM (groupBy score → running-count window over
    * |distinct scores| rows, bounded by the score domain, never a
    * doc-grain global sort) with the percentile test as the BIGINT
    * cross-multiply cum·4 ≥ total·3 (percentile_disc semantics: min
    * score with cume ≥ ¾; score ties keep all, documented), (5)
    * per-(lang, source) accounting of the selected slice. The dedup
    * stage is made provably LOAD-BEARING the established planted-twin
    * way (pipe_semdedup's below-the-id-space trick): every 9th
    * surviving doc gains a `mirror` fetch copy at doc_id − 10⁶ — the
    * mirror is the keep-first keeper, so the REAL doc drops and its
    * accounting row moves to the mirror source; delete the stage and
    * both copies double-count. Funnel at gate SF: 500 → 233 (rules) →
    * 259 planted → 233 deduped → top-quartile slice. */
  def pipeDclmCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val gk = TextAnalysis.gopherRules(d, col("doc_id"), col("text"),
        GopherStops)
      .filter(col("keep") === 1).select("doc_id")
    val surv0 = d.join(gk, Seq("doc_id"), "left_semi")
    val surv = surv0
      .unionByName(surv0.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") - 1000000L).as("doc_id"), col("lang"),
          lit("mirror").as("source"), col("text"), col("n_chars")))
      .localCheckpoint()
    val keepIds = surv
      .groupBy(xxhash64(col("text")).as("h"), md5(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val dd = surv.join(keepIds, Seq("doc_id"), "left_semi")
    val weights = s.range(256).select(col("id").cast("int").as("bucket"),
      ((col("id") * 37) % 101 - 50).as("wt"))
    val scored = TextAnalysis.hashedLinearScore(dd, col("doc_id"),
        col("text"), weights, nBuckets = 256)
      .select("doc_id", "n_tok", "score").localCheckpoint()
    val hist = scored.groupBy("score").agg(count(lit(1)).as("n"))
    val total = hist.agg(sum("n").as("total"))
    val thr = hist
      .withColumn("cum", sum("n").over(
        org.apache.spark.sql.expressions.Window.orderBy("score")))
      .crossJoin(broadcast(total))
      .filter(col("cum") * 4 >= col("total") * 3)
      .agg(min("score").as("thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("score") >= col("thr"))
      .join(dd.select("doc_id", "lang", "source"), "doc_id")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"))
  }

  /** PIPE11: the RedPajama-v2 SIGNALS architecture (Together AI 2023,
    * arXiv:2411.12372 — the published counter-design to C4/CCNet-style
    * destructive filtering: compute the quality SIGNALS once, store
    * them WITH the corpus, and let every downstream consumer choose
    * its own thresholds): one wide row per document carrying the
    * gate-proven signal families side by side — the Gopher measures
    * (word count, summed word length, distinct stopwords, top-token
    * char mass, composite keep), the hashed-linear classifier score,
    * the lexicon-vote language prediction + agreement flag, and the
    * corpus-wide duplicate-line census (4-word lines, n_dup = lines
    * occurring ≥2× anywhere — symmetric, no keep-first asymmetry).
    * Every signal is integer/flag-exact; nothing is filtered — the
    * capstone's contract is that the TABLE is the product. Shape: four
    * independent signal subplans (each its own keyed aggregate over
    * tokens/lines — token rows shuffle as hashes, never text) joined
    * back on doc_id; at 100 TB each family is a map-side-combined
    * aggregate and the final join co-partitions on doc_id. */
  def pipeRpv2Signals(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val gop = TextAnalysis.gopherRules(d, col("doc_id"), col("text"),
        GopherStops)
      .select(col("doc_id"), col("n_words"), col("sum_wlen"),
        col("n_stop"), col("top_chars"), col("keep").as("gopher_keep"))
    val weights = s.range(256).select(col("id").cast("int").as("bucket"),
      ((col("id") * 37) % 101 - 50).as("wt"))
    val cls = TextAnalysis.hashedLinearScore(d, col("doc_id"), col("text"),
        weights, nBuckets = 256)
      .select(col("doc_id"), col("n_tok"), col("score"))
    val pred = TextAnalysis.langId(d, col("doc_id"), col("text"),
      col("lang"))
    val ex = d.select(col("doc_id"),
        explode(expr("transform(sequence(1, (size(split(text, ' ')) + 3)" +
          " div 4), i -> array_join(slice(split(text, ' ')," +
          " (i - 1) * 4 + 1, 4), ' '))")).as("line"))
      .select(col("doc_id"), xxhash64(col("line")).as("lh"),
        md5(col("line")).as("lf"))
    val occ = ex.groupBy("lh", "lf").agg(count(lit(1)).as("n_occ"))
    val lineSig = ex.join(occ, Seq("lh", "lf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum((col("n_occ") >= 2).cast("long")).as("n_dup_lines"))
    d.select("doc_id", "lang", "source")
      .join(gop, "doc_id").join(cls, "doc_id")
      // LEFT: a doc with zero lexicon votes has no prediction — it
      // surfaces as 'und' (signals tables carry every doc)
      .join(pred, Seq("doc_id"), "left")
      .join(lineSig, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_words"),
        col("sum_wlen"), col("n_stop"), col("top_chars"),
        col("gopher_keep"), col("n_tok"), col("score"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        (coalesce(col("pred_lang"), lit("und")) === col("lang"))
          .cast("int").as("lang_agree"),
        col("n_lines"), col("n_dup_lines"))
  }

  /** PIPE12: DEDUP-AWARE train/val/test SPLIT assignment — the
    * leakage guard the dedup literature warns about (Lee et al. 2022
    * §6: near-duplicate train/test crossover inflates eval):
    * documents are assigned to splits BY NEAR-DUP FAMILY, never by
    * doc — the family key is the d2/d25 transitive-closure component
    * minimum (singletons: the doc itself) and the split is a
    * deterministic hash of the FAMILY (80/10/10 via the 16-bit md5
    * prefix, d26's quantized-hash idiom), so every variant of a
    * document lands in the SAME split by construction. The output
    * carries the audit the guarantee implies — families_straddling
    * (families seen in >1 split), structurally zero — and the spec
    * pins the CONTRAST: on the planted chain corpus, doc-hash
    * assignment DOES straddle. At 100 TB the closure is the d2
    * machinery (banded LSH + pointer jumping) and the assignment is
    * one hash projection — the split column costs nothing beyond the
    * dedup pass a corpus already runs. */
  def pipeSplitAssign(s: SparkSession, dir: String): DataFrame = {
    val corpus = docsWithNearDupChains(s, dir)
    val clusters = Dedup.dedupClusters(
      Dedup.ngramJaccard(corpus, col("doc_id"), col("text")),
      col("a_id"), col("b_id"))
    val fam = corpus.select("doc_id")
      .join(clusters.select(col("doc_id"),
        least(col("doc_id"), col("cluster_id")).as("fam0")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("fam0"), col("doc_id")).as("family"))
      .localCheckpoint()
    val asg = fam.select(col("doc_id"), col("family"),
      splitOf(col("family")).as("split"))
    val audit = asg.groupBy("family")
      .agg(countDistinct("split").as("ns"))
      .agg(count(when(col("ns") > 1, 1)).as("families_straddling"))
    asg.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("family").as("n_families"))
      .crossJoin(broadcast(audit))
  }

  /** 80/10/10 split of a BIGINT key by its 16-bit md5 prefix. */
  private[graft] def splitOf(key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hv = conv(substring(md5(key.cast("string")), 1, 4), 16, 10)
      .cast("long") % 10
    when(hv <= 7, lit("train")).when(hv === 8, lit("val"))
      .otherwise(lit("test"))
  }

  /** D28: hashed-feature linear classifier over every document
    * ([[TextAnalysis.hashedLinearScore]], 256 buckets). The weight
    * table is generated arithmetically ((b·37) mod 101 − 50 — integer,
    * full [-50,50] coverage, SQL-replayable) where a trained fastText
    * export would land; the operator under test is the INFERENCE:
    * model-as-table → one broadcast array row → per-doc codegen fold,
    * corpus never exploded, never shuffled. */
  def d28QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val weights = s.range(256).select(col("id").cast("int").as("bucket"),
      ((col("id") * 37) % 101 - 50).as("wt"))
    TextAnalysis.hashedLinearScore(docs(s, dir), col("doc_id"), col("text"),
      weights, nBuckets = 256)
  }

  def d26TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val t16 = d.groupBy("lang")
      .agg(least(lit(65536L),
        floor(lit(8.0) * 65536 / sqrt(count(lit(1)))).cast("long"))
        .as("t16"))
    // no keep-all special case needed: a 4-hex-digit prefix is at most
    // 65535, so `hv < 65536` already keeps every row at rate 1
    d.join(broadcast(t16), "lang")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") < col("t16"))
      .select(col("doc_id"), col("lang"), col("t16"))
  }

  /** PIPE6: the SemDeDup corpus-prep capstone — the published pipeline
    * shape end to end: semantic dedup over embeddings (D23's trained
    * k-means cells), drop the flagged docs from the document corpus,
    * token-count quality floor, then pack the survivors into context
    * windows per source (D8's manifest). Twins are planted BELOW the id
    * space (vec_id − 10⁶), so the planted twin is the keeper and the
    * REAL doc drops — every 20th document genuinely leaves the corpus,
    * making the dedup step provably load-bearing (the rag-index
    * capstone's zero-chunk argument, semantic edition). */
  def pipeSemdedupCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val planted = e.unionByName(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") - 1000000L).as("vec_id"),
        concat(array(element_at(col("v"), 1) + 0.05),
               expr("slice(v, 2, size(v) - 1)")).as("v")))
    val dropped = Similarity.semDedup(planted, col("vec_id"), col("v"),
        k = 8, threshold = 0.95)
      .filter(col("vec_id") >= 0) // only real docs can drop
      .select(col("vec_id").as("doc_id"))
    val kept = docs(s, dir)
      .join(dropped, Seq("doc_id"), "left_anti")
      .withColumn("n_tok", size(split(col("text"), " ")))
      .filter(col("n_tok") >= 5)
    Packing.packByCount(kept, col("doc_id"), col("n_tok"), col("source"),
      ctx = 1024)
  }

  /** D25: KEEP-BEST dedup — the near-dup family closure with a QUALITY
    * representative rule: each family keeps its longest member (ties to
    * the lowest id), not the lowest id — the production rule when
    * near-dup variants differ in completeness (the planted chain
    * variants are strict text supersets, so keep-best provably inverts
    * min-id). Family key = least(doc_id, cluster_id): the closure
    * labels each doc with its minimum reachable OTHER member, so the
    * least() is the component minimum for every member. */
  def d25DedupKeepbest(s: SparkSession, dir: String): DataFrame = {
    val corpus = docsWithNearDupChains(s, dir)
    val clusters = Dedup.dedupClusters(
      Dedup.ngramJaccard(corpus, col("doc_id"), col("text")),
      col("a_id"), col("b_id"))
    clusters
      .select(col("doc_id"),
              least(col("doc_id"), col("cluster_id")).as("family"))
      .join(corpus, "doc_id")
      .groupBy("family")
      .agg(count(lit(1)).as("n_members"),
           max_by(col("doc_id"),
             struct(length(col("text")), -col("doc_id"))).as("kept_id"),
           max(length(col("text")).cast("long")).as("kept_len"))
  }

  /** Concat-and-chunk sequence packing into 2048-token context windows,
    * one deterministic stream per source. */
  def d8SequencePack(s: SparkSession, dir: String): DataFrame =
    Packing.sequencePack(docs(s, dir), col("doc_id"), col("text"),
      col("source"), ctx = 2048)

  /** Deterministic per-source sampling for training-mix re-weighting:
    * md5-threshold keep decision, reproducible by the oracle bit-exact. */
  def d7StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratified(docs(s, dir), col("doc_id"), col("source"),
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125),
        defaultRate = 0.0625)
      .select("doc_id", "source")

  def d2CosineNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupBucketed(embsWithNearDups(s, dir),
      col("vec_id"), col("v"), 0.95, bits = 6)

  /** D23: SemDeDup — cluster-then-dedup over the SAME planted near-dup
    * corpus and threshold as d2_cosine_neardup, different bucketing
    * (trained k-means cells instead of fixed sign hyperplanes): the two
    * queries cross-validate through their independent oracles. */
  def d23SemDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(embsWithNearDups(s, dir), col("vec_id"), col("v"),
      k = 8, threshold = 0.95)

  /** D34: the kNN graph over the raw embeddings table — trained cells
    * route, within-cell directed top-3 ([[Similarity.knnGraph]]). */
  def d34KnnGraph(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Similarity.knnGraph(e, col("vec_id"),
      Similarity.asDouble(col("embedding")), k = 8, kNbr = 3)
  }

  /** D17: URL canonicalization + canonical-key dedup — the crawl-corpus
    * hygiene step (the same page arrives as http/https, with tracking
    * params, case-varied hosts, trailing slashes): canonical key =
    * lowercase host + path with any trailing slash stripped, query and
    * fragment dropped. URLs synthesize deterministically from the
    * fixture (scheme/host-case/utm/trailing-slash variants decided by
    * doc_id bits), so both engines rebuild the identical corpus; Spark
    * canonicalizes with parse_url (codegen'd), the oracle with regexes. */
  def d17UrlCanon(s: SparkSession, dir: String): DataFrame = {
    val url = concat(
      when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("http://")),
      when(col("doc_id") % 3 === 0, lit("WWW.Example.ORG"))
        .otherwise(lit("www.example.org")),
      lit("/p/"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit("?utm_source=feed&id="), col("doc_id").cast("string")))
        .otherwise(lit("")))
    val canon = concat(
      lower(parse_url(url, lit("HOST"))),
      regexp_replace(parse_url(url, lit("PATH")), "/$", ""))
    docs(s, dir)
      .select(col("doc_id"), canon.as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_variants"),
           min(col("doc_id")).as("keep_id"))
  }

  /** D18b: per-HOST crawl quota — the politeness/diversity cap every
    * crawl pipeline applies before anything else: canonicalize the
    * host ([[d17UrlCanon]]'s parse_url machinery, 14 synthesized
    * hosts), rank each host's documents deterministically (doc_id
    * order), keep the first 20. One keyed window; the quota decision is
    * reported per host so the gate stays scalar. */
  def d18HostQuota(s: SparkSession, dir: String): DataFrame = {
    val url = concat(
      when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("http://")),
      lit("H"), (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 3 === 0, lit(".Example.ORG"))
        .otherwise(lit(".example.com")),
      lit("/p/"), col("doc_id").cast("string"))
    val host = lower(parse_url(url, lit("HOST")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("doc_id")
    docs(s, dir)
      .select(col("doc_id"), host.as("host"))
      .withColumn("rn", row_number().over(w))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("rn") <= 20, 1L).otherwise(0L)).as("n_kept"),
           min(col("doc_id")).as("first_id"))
  }

  /** D21: embedding OUTLIER scoring — the data-quality gate that drops
    * documents whose embedding sits far from their source's centroid
    * (mislabeled/garbage content clusters away from its stratum). Per
    * source: integer-grid centroid (per-position sum div n — the
    * [[KMeans.reduceToCodebook]] convention), then each member's exact
    * [[graft.functions.SqDistL2]] distance, top-3 reported per source
    * with full tie-break. One fact join (vec→doc metadata), one
    * centroid aggregate, broadcast centroids, one window. */
  def d21EmbedOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("qv"))
    val d = docs(s, dir).select(col("doc_id"), col("source"))
    val j = e.join(d, col("vec_id") === col("doc_id"))
      .select(col("source"), col("doc_id"), col("qv"))
    val cent = j
      .select(col("source"), posexplode(col("qv")).as(Seq("pos0", "q")))
      .groupBy(col("source"), col("pos0"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
      .select(col("source"), col("pos0"), expr("sum_q div n").as("c"))
      .groupBy("source")
      .agg(array_sort(collect_list(struct(col("pos0"), col("c")))).as("pc"))
      .select(col("source"),
              transform(col("pc"), _.getField("c")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("dist").desc, col("doc_id").asc)
    j.join(broadcast(cent), "source")
      .select(col("source"), col("doc_id"),
              KMeans.sqDist(col("qv"), col("cv")).as("dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("source"), col("rank"), col("doc_id"), col("dist"))
  }

  /** D20: CONTENT-DEFINED chunking — boundaries where a rolling
    * content predicate fires (here: md5 of the trailing 4-gram starts
    * with '0' or '1', a 1/8 boundary rate), so an insertion early in a
    * document only reshapes chunks up to the next boundary instead of
    * shifting every fixed window (the CDC property that makes
    * chunk-level dedup robust to edits; [[Packing.chunkOverlap]] is the
    * fixed-window sibling). Pure per-row array expressions — zero
    * exchange until the final per-doc projection; md5-on-substring is
    * the engine-portable boundary hash. */
  def d20CdcChunks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      // boundary AFTER position i when the trailing 4-gram's md5 starts
      // '0'/'1' — only INTERIOR positions (i < n): a boundary at the
      // last char would fabricate a zero-length trailing chunk.
      // sequence(4, n-1) DESCENDS for n < 5 — guard to empty
      .select(col("doc_id"), col("n"),
        when(col("n") >= 5,
          filter(sequence(lit(4), col("n") - 1), i =>
            substring(md5(col("text").substr(i - 3, lit(4))), 1, 1)
              .isin("0", "1")))
          .otherwise(array().cast("array<int>")).as("bpos"))
      // implicit bounds at 0 and n; chunk lengths are adjacent diffs
      .select(col("doc_id"), col("n"),
        concat(array(lit(0)), col("bpos"), array(col("n"))).as("bounds"))
      .select(col("doc_id"),
        (size(col("bounds")) - 1).cast("long").as("n_chunks"),
        array_max(zip_with(
          slice(col("bounds"), lit(2), size(col("bounds")) - 1),
          slice(col("bounds"), lit(1), size(col("bounds")) - 1),
          (b, a) => b - a)).cast("long").as("max_chunk_len"),
        col("n").cast("long").as("n_chars"))

  /** D19: host-graph PageRank ([[HostRank.ranks]]) — 3 weighted power
    * iterations over the deterministic 7-host link graph the documents
    * fixture induces: src = doc_id mod 7, dst = (doc_id mod 13) mod 7.
    * 13 and 7 are coprime, so dst is NOT a function of src (each src
    * fans out to many dsts with varying weights) and the mod-13
    * folding gives dsts 0–5 roughly double host 6's in-weight — the
    * ranks are genuinely non-uniform, so a transposed join, dropped
    * weight, or wrong denominator CHANGES the answer (a dst that was a
    * bijection of src would make the gate blind to all of those).
    * Integer fixed-point throughout; the oracle replays the rounds
    * bit-exactly. */
  def d19HostRank(s: SparkSession, dir: String): DataFrame =
    HostRank.ranks(hostEdges(docs(s, dir)), nNodes = 7, iters = 3)

  /** D24: triangle count on a derived link graph ([[Graph.triangles]]:
    * degree-oriented wedge enumeration + one closure semi-join). The
    * graph is orders folded onto 499 nodes — hundreds of nodes,
    * thousands of distinct edges, growing denser with SF. The oracle
    * recounts with plain id-ordering; the count's orientation-
    * invariance makes the two formulations independent. */
  def d24Triangles(s: SparkSession, dir: String): DataFrame =
    Graph.triangles(table(s, dir, "orders"),
      col("o_custkey") % 499, col("o_orderkey") % 499)

  /** D43: bounded Bellman-Ford SSSP over a 1000-node weighted digraph
    * synthesized from lineitem with PURE integer arithmetic (a
    * double→BIGINT cast would round in DuckDB and truncate in Spark —
    * the known cross-engine trap, avoided by deriving weights from the
    * integer keys). Source node 0, 8 relaxation rounds; the oracle is
    * the depth-counted recursive walk (UNION-deduped states), the
    * wro_cost_distance oracle pattern on an arbitrary graph. */
  def d43Sssp(s: SparkSession, dir: String): DataFrame =
    Graph.sssp(table(s, dir, "lineitem"),
      col("l_orderkey") % 1000,
      (col("l_orderkey") * 7 + col("l_linenumber")) % 1000,
      (col("l_orderkey") * 3 + col("l_linenumber")) % 50 + 1,
      source = 0L, rounds = 8)

  /** The deterministic 7-host link graph shared by [[d19HostRank]] and
    * [[pipeCrawlFrontier]] — ONE definition, so the de-degeneracy
    * argument (coprime mod-13 folding) cannot drift between them. */
  private def hostEdges(d: DataFrame): DataFrame =
    d.select((col("doc_id") % 7).as("src"),
             ((col("doc_id") % 13) % 7).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** PIPE5: the CRAWL-FRONTIER capstone — D17+D18b+D19 composed end to
    * end the way a crawler's scheduler actually runs them: canonicalize
    * URLs (scheme/case/tracking/slash variants collapse), keep one doc
    * per canonical URL (min id), apply the per-host politeness quota
    * (first 20 by id), and PRIORITIZE hosts by the trained PageRank —
    * the output is the per-host frontier budget (kept docs + rank). */
  def pipeCrawlFrontier(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val url = concat(
      when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("http://")),
      lit("h"), (col("doc_id") % 7).cast("string"),
      when(col("doc_id") % 3 === 0, lit(".Example.ORG"))
        .otherwise(lit(".example.org")),
      lit("/p/"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit("?utm_source=feed&id="), col("doc_id").cast("string")))
        .otherwise(lit("")))
    val canon = concat(
      lower(parse_url(url, lit("HOST"))),
      regexp_replace(parse_url(url, lit("PATH")), "/$", ""))
    val kept = d.select(col("doc_id"), canon.as("canon_url"))
      .groupBy("canon_url").agg(min(col("doc_id")).as("doc_id"))
      .select(col("canon_url"), col("doc_id"),
              (col("doc_id") % 7).as("hostn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("hostn").orderBy("doc_id")
    val quota = kept.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .groupBy("hostn")
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_id"))
    quota
      .join(broadcast(HostRank.ranks(hostEdges(d), nNodes = 7, iters = 3)),
        col("hostn") === col("host"))
      .select(col("hostn").as("host"), col("n_kept"), col("first_id"),
              col("rank").as("host_rank"))
  }

  /** D2f: the incremental-ingest form of near-dup detection — the base
    * corpus's band signatures are built once and PERSISTED (parquet —
    * the stored index is the point), then a new batch (the d2 fixture's
    * one-word-appended copies) probes the stored table: only the batch
    * pays shingling, and candidates are one (band, bsig) equi-join. */
  def d2IncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select("doc_id", "text")
    val idxPath = ioDir(dir, "lshidx")
    Dedup.bandSignatures(base, col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(idxPath)
    val batch = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" qqzz")).as("text"))
    Dedup.incrementalLsh(s.read.parquet(idxPath), batch,
      col("doc_id"), col("text"),
      base.unionByName(batch), col("doc_id"), col("text"))
  }

  /** D2g: TWO successive ingests through a MAINTAINED index — the
    * [[Dedup.ingestLsh]] loop: the index starts from the base corpus,
    * ingest 1 probes batch 1 (base↔b1 pairs) and APPENDS b1's
    * signatures, ingest 2 probes batch 2 against the grown index — its
    * b1↔b2 pairs exist ONLY because ingest 1 maintained the index.
    * Output is both ingests' pairs (disjoint classes by id range). */
  def d2LshIngest(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select("doc_id", "text")
    val idxPath = ioDir(dir, "lshidx-ing")
    Dedup.bandSignatures(base, col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(idxPath)
    val b1 = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" qqzz")).as("text"))
    val b2 = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" qqzz ww")).as("text"))
    val all1 = base.unionByName(b1)
    val p1 = Dedup.ingestLsh(idxPath, b1, col("doc_id"), col("text"),
      all1, col("doc_id"), col("text"))
    val p2 = Dedup.ingestLsh(idxPath, b2, col("doc_id"), col("text"),
      all1.unionByName(b2), col("doc_id"), col("text"))
    p1.unionByName(p2)
  }

  def d3CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Similarity.topK(e.filter(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), e.filter(col("vec_id") === 0), col("embedding"), 10)
  }

  def d3AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Similarity.annTopK(e.filter(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), e.filter(col("vec_id") === 0), col("embedding"),
      k = 5, bits = 4)
  }

  def d3IvfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Similarity.ivfTopK(e.filter(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), e.filter(col("vec_id") === 0), col("embedding"),
      k = 5, stride = 31, nprobe = 2)
  }

  /** D3d: the IVF loop CLOSED — the coarse quantizer is TRAINED
    * ([[KMeans.codebook2]]: two Lloyd iterations on the 2^20 integer
    * grid, seeded from the k lowest vec_ids) instead of stride-sampled,
    * then fed into the same broadcast-codebook + coarse-prefilter probe
    * plan ([[Similarity.ivfTopKWith]]). Training runs over the corpus
    * (the query vector is excluded — an index never trains on probes). */
  def d3IvfTrained(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") =!= 0)
    // cache the trained codebook: the probe references it from four
    // places (bucketed centroids, empty-bucket fallback, probes,
    // assignment), and without the cache each reference repeats the
    // whole two-iteration training lineage in the plan tree. At scale
    // this materialization IS the "index build" step.
    val codebook = KMeans.codebook2(corpus, k = 8)
      .select(col("cid"),
        transform(col("cv"), c => c.cast("double") / KMeans.Scale).as("cv"))
      .cache()
    Similarity.ivfTopKWith(corpus, col("vec_id"), col("embedding"),
      codebook, e.filter(col("vec_id") === 0), col("embedding"),
      k = 5, nprobe = 2)
  }

  /** D37: two-stage retrieve-then-rerank ([[Similarity.rerankTopK]]):
    * SQ8 integer pool cut, exact cosine rerank of the pool. */
  def d37RerankTopK(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Similarity.rerankTopK(e.filter(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), e.filter(col("vec_id") === 0), col("embedding"),
      k = 5, pool = 50)
  }

  /** D38: the query batch = every 50th vector (10 at gate SF);
    * corpus = the rest. Per query: exact top-3 by cosine. */
  def d38BatchTopK(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Similarity.batchTopK(
      e.filter(col("vec_id") % 50 =!= 0), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") % 50 === 0), col("vec_id"), col("embedding"),
      k = 3)
  }

  def d36Sq8TopK(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Similarity.sq8TopK(e.filter(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), e.filter(col("vec_id") === 0), col("embedding"),
      k = 10)
  }

  /** D16: product quantization + ADC probe ([[Pq.pqTopK]]) — the
    * memory half of IVF-PQ: m codes per vector, query scored by m
    * table lookups, integer-exact on the 2^20 grid. */
  def d16PqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Pq.pqTopK(e.filter(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), e.filter(col("vec_id") === 0), col("embedding"),
      k = 5, m = 8, stride = 31)
  }

  /** D18: IVF-PQ — the production ANN composition ([[Pq.ivfPqTopK]]):
    * trained coarse quantizer routes (two Lloyd iterations, the D3d
    * loop), trained per-subspace codebooks compress (all 8 subspace
    * k-means problems in one grouped-Lloyd plan), ADC scores only the
    * probed lists. Query vector held out of all training, as in D3d. */
  def d3IvfpqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    Pq.ivfPqTopK(e.filter(col("vec_id") =!= 0), col("vec_id"),
      col("embedding"), e.filter(col("vec_id") === 0), col("embedding"),
      k = 5, kc = 8, ksub = 16, m = 8, nprobe = 2)
  }

  /** A15: two-pass Misra-Gries heavy hitters (k=32 counters → exact
    * recount of the ≤ 32 broadcast candidates → integer threshold
    * cnt·33 > n). See [[graft.llm.HeavyHitters]]. */
  def a15HeavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.llm.HeavyHitters.heavyHitters(docs(s, dir), col("text"), k = 32)

  def d4TopTokens(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topTokens(docs(s, dir), col("doc_id"), col("text"), 20)

  def d4TfIdf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfIdfTopTerms(docs(s, dir).filter(col("doc_id") < 50),
      col("doc_id"), col("text"), 3)

  /** D32: BM25 top-10 over the corpus for a fixed 4-term query drawn
    * from the fixture vocabulary ([[TextAnalysis.bm25TopK]]). The terms
    * are corpus-common, so the classic negative-idf trap is live and
    * the Lucene-form idf is load-bearing, and ranking discriminates on
    * real length normalization (every doc matches some terms). */
  def d32Bm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(docs(s, dir), col("doc_id"), col("text"),
      Seq("table", "scan", "merge", "stream"))

  /** D33: the Gopher quality-rule gate ([[TextAnalysis.gopherRules]]),
    * stop list = the fixture vocabulary's function words. */
  def d33GopherRules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(docs(s, dir), col("doc_id"), col("text"),
      GopherStops)

  private val GopherStops =
    Seq("the", "a", "of", "to", "and", "in", "is", "be")

  def d4LangId(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextAnalysis.langId(d, col("doc_id"), col("text"), col("lang"))
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang").as("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  def d4Fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(docs(s, dir), col("doc_id"), col("text"))

  /** D5 multimodal features — REAL bytes end to end: the binary media
    * column holds an actual 24-bpp BMP per doc, decoded with
    * [[graft.llm.MediaCodec.decodeBmp]] and nearest-neighbor-resized
    * 8×4 → 4×2 before featurizing; the per-(lang,label) aggregate's
    * feature weights each RESIZED pixel by its position, so the oracle
    * (which replays the pixel rule through the resize sampling map
    * arithmetically) gates decode layout AND the resize. */
  def d5Multimodal(s: SparkSession, dir: String): DataFrame =
    Multimodal.featuresByLangLabel(s, docs(s, dir),
      table(s, dir, "embeddings"))

  /** D5 frame fan-out — REAL container in the column: a 5-frame 6×2
    * uncompressed-DIB AVI per doc (width 6 forces DIB row padding),
    * decoded from the binary column and stride-2 sampled — frames
    * 0, 2, 4 emerge as typed rows with position-weighted stats, the
    * original frame numbers kept oracle-visible. */
  def d5Frames(s: SparkSession, dir: String): DataFrame = {
    val rows = Multimodal.assembleVideo(s, docs(s, dir),
      table(s, dir, "embeddings"))
    Multimodal.sampleFrames(s, rows, stride = 2)
      .select(col("doc_id"), col("frame_idx"), col("sum_ch"), col("wsum_ch"))
  }

  /** D5 REAL decode — BMP: per doc, synthesize the SQL-replayable
    * pixel field, encode it as an actual 24-bpp BMP (bottom-up padded
    * rows), decode with [[graft.llm.MediaCodec.decodeBmp]], and emit
    * position-weighted channel statistics the oracle recomputes from
    * the pixel rule alone — a decoder that misreads padding or the
    * row flip fails the weighted sum. */
  def d5DecodeBmp(s: SparkSession, dir: String): DataFrame =
    Multimodal.bmpRoundtripStats(s, docs(s, dir)).toDF()

  /** D5 REAL decode — WAV: PCM-16 mono through the RIFF chunk walk;
    * samples span the full signed range so sign decoding is gated. */
  def d5DecodeWav(s: SparkSession, dir: String): DataFrame =
    Multimodal.wavRoundtripStats(s, docs(s, dir)).toDF()

  /** D5 REAL frame fan-out — AVI: a 4-frame uncompressed-DIB AVI per
    * doc, decoded by walking the RIFF tree to the movi LIST; one row
    * per decoded frame with position-weighted stats. */
  def d5FramesAvi(s: SparkSession, dir: String): DataFrame =
    Multimodal.aviFrameStats(s, docs(s, dir)).toDF()

  /** D5 REAL decode — PNG: the entropy-coded tier. Per doc the 9×3
    * pixel field encodes through [[graft.llm.MediaCodec.encodePng]]
    * (Sub/Paeth-filtered scanlines, zlib DEFLATE, chunk CRCs) and
    * decodes back through the full inflate + five-filter unfiltering
    * pass; the oracle replays the pixel rule arithmetically, so a
    * filter or inflate misread fails the position-weighted sum. */
  def d5DecodePng(s: SparkSession, dir: String): DataFrame =
    Multimodal.pngRoundtripStats(s, docs(s, dir)).toDF()

  def d6Quality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityBySource(docs(s, dir), Seq("the", "data", "value"))

  /** D22: per-source PERCENTILE normalization of a quality signal —
    * a global threshold over raw scores silently biases the mix toward
    * verbose sources; rank-normalizing within each source first (the
    * standard mix-building practice) keeps every stratum's top half.
    * percent_rank over a fully tie-broken order is an exact rational,
    * identical in both engines; one window + one aggregate reusing the
    * same source partitioning. */
  def d22QualityPercentile(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_tok"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("pr", percent_rank().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("pr") >= 0.5, 1L).otherwise(0L)).as("n_kept"),
           min(when(col("pr") >= 0.5, col("n_tok"))).as("min_kept_tok"))
  }

  /** D11: OOV rate against a 16-token vocabulary — the fixture lexicon
    * has 31 distinct tokens, so roughly half of each doc's tokens are
    * out-of-vocabulary and the rate genuinely varies per doc. */
  def d11VocabOov(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabOov(docs(s, dir), col("doc_id"), col("text"),
      vocabSize = 16)

  /** D14: sliding-window chunking for embedding/RAG indexing — window 64
    * tokens, stride 48, md5 chunk ids ([[Packing.chunkOverlap]]). */
  def d14ChunkOverlap(s: SparkSession, dir: String): DataFrame =
    Packing.chunkOverlap(docs(s, dir), col("doc_id"), col("text"))

  /** Capstone 3: RAG indexing pipeline — chunk every doc into overlapping
    * windows (D14), dedup at CHUNK granularity on the md5 identity (the
    * step that keeps an embedding index from paying for repeated
    * boilerplate), keep the min-(doc,chunk) copy, and report per doc how
    * many of its chunks survive as keepers. The corpus carries injected
    * full-document copies, so every copied doc's chunks lose to the
    * original's — n_kept is 0 for the copies, n_chunks for originals. */
  def pipeRagIndex(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L))
    val chunks = Packing.chunkOverlap(corpus, col("doc_id"), col("text"))
    val keepers = chunks
      .groupBy("chunk_md5")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.chunk_id").as("chunk_id"))
    chunks.select("doc_id", "chunk_id")
      .join(keepers.withColumn("kept", lit(1)),
            Seq("doc_id", "chunk_id"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(coalesce(col("kept"), lit(0))).cast("long").as("n_kept"))
  }

  /** D15: the BPE tokenizer-training statistic — top adjacent symbol
    * pairs over the word histogram ([[Bpe.pairWeights]]; the full merge
    * loop is [[Bpe.train]], exercised in the spec). */
  def d15BpePairs(s: SparkSession, dir: String): DataFrame =
    Bpe.pairWeights(Bpe.symbolized(
        Bpe.wordHistogram(docs(s, dir), col("text"))))
      .orderBy(col("weight").desc, col("a").asc, col("b").asc)
      .limit(10)

  /** D15b: the tokenizer loop CLOSED — train nMerges BPE merges on the
    * corpus ([[Bpe.train]]), then ENCODE every document with them
    * ([[Bpe.encode]]): the trained merge table feeds straight into the
    * per-document substitution fold, and the query reports per-doc token
    * counts before/after — the compression the tokenizer actually buys. */
  private val bpeEncodeMerges = 6

  def d15BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir)
    // trainBatched produces the IDENTICAL merge table (spec-proven) in
    // fewer scheduler rounds; the oracle replays the naive loop
    val merges = Bpe.trainBatched(
      Bpe.wordHistogram(corpus, col("text")), bpeEncodeMerges)
    Bpe.encode(corpus, col("doc_id"), col("text"), merges)
  }

  /** D40: tokenizer FERTILITY / compression by language — the metric
    * every tokenizer paper reports (tokens-per-word and
    * chars-per-token; high fertility on a language means the vocab
    * under-serves it — the multilingual-equity measure): the trained
    * BPE's per-doc encode counts ([[Bpe.encode]] — the gate-proven
    * kernel) aggregated per language as EXACT sums; the two ratios are
    * the caller's monotone post-divides. One doc-keyed join + one
    * keyed aggregate past the proven encode plan. */
  def d40Fertility(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir)
    val merges = Bpe.trainBatched(
      Bpe.wordHistogram(corpus, col("text")), bpeEncodeMerges)
    Bpe.encode(corpus, col("doc_id"), col("text"), merges)
      .join(corpus.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("sum_words"),
        sum("n_sym0").as("sum_chars"), sum("n_tok").as("sum_tok"))
  }

  /** D15d: the tokenizer's OUTPUT side — per-document token-ID
    * sequences under the trained merge table and its induced vocabulary
    * ([[Bpe.vocab]] + [[Bpe.encodeIds]] / the [[graft.functions.BpeDocIds]]
    * kernel): the loader-ready artifact, not just counts. */
  def d15BpeTokens(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir)
    val merges = Bpe.trainBatched(
      Bpe.wordHistogram(corpus, col("text")), bpeEncodeMerges)
    // the API emits real array<int> sequences; the GATE serializes them
    // to one csv string per doc because the driver's comparator hashes
    // scalar cells (DuckDB lists are unhashable on its pandas path)
    Bpe.encodeIds(corpus, col("doc_id"), col("text"), merges)
      .select(col("doc_id"), col("n_tok"),
        array_join(col("token_ids"), ",").as("token_ids"))
  }

  /** PIPE4: the tokenizer composed END-TO-END into the loader artifact —
    * train BPE on the corpus, tokenize every document to REAL id
    * sequences ([[Bpe.encodeIds]]), and pack the id streams into
    * 1024-token context windows by their true token counts
    * ([[Packing.packByCount]] — the d8 concat-and-chunk shape, no
    * whitespace proxy). Closes the gap the round-5 verdict named: the
    * pack manifest now describes tokenized sequences, not word counts. */
  def pipeTokenizedPack(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir)
    val merges = Bpe.trainBatched(
      Bpe.wordHistogram(corpus, col("text")), bpeEncodeMerges)
    val ids = Bpe.encodeIds(corpus, col("doc_id"), col("text"), merges)
    val tagged = ids.join(corpus.select("doc_id", "source"), "doc_id")
    Packing.packByCount(tagged, col("doc_id"), col("n_tok"),
        col("source"), ctx = 1024)
      .select(col("source"), col("doc_id"), col("n_tokens").as("n_tok"),
              col("pack_id"), col("pos"))
  }

  /** D13: corpus-self-trained char-bigram LM surprise (integer
    * floor-log2 — see [[TextAnalysis.bigramSurprise]]). */
  def d13LmSurprise(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramSurprise(docs(s, dir), col("doc_id"), col("text"))

  /** D41: batch-perceptron training of the d28-style hashed linear
    * classifier, target = English documents — the in-engine trainer
    * whose exported weight table d28's inference consumes. */
  def d41Perceptron(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.perceptron(docs(s, dir), col("doc_id"), col("text"),
      col("lang") === "en")

  /** D42: classifier CALIBRATION — the evaluate leg closing the d41 →
    * d28 loop, composed EXACTLY as the two operators' contracts
    * promise: [[TextAnalysis.perceptron]]'s exported weight table is
    * fed verbatim into [[TextAnalysis.hashedLinearScore]]'s inference
    * (the d28 kernel — trainer exports, inference consumes), and the
    * scored corpus is cut into score deciles with the per-decile
    * target fraction — the calibration/precision curve an ML pipeline
    * reads before trusting a threshold. Decile assignment is a
    * doc-grain ntile ordered by (score, doc_id) — deterministic, and
    * at 100 TB the w5_quantile_buckets percentile-threshold path
    * replaces the global window (documented, not hidden). */
  def d42Calibration(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir)
    val w = TextAnalysis.perceptron(corpus, col("doc_id"), col("text"),
        col("lang") === "en")
      .select(col("b").cast("int").as("bucket"), col("w").as("wt"))
    val scored = TextAnalysis.hashedLinearScore(corpus, col("doc_id"),
      col("text"), w, nBuckets = 256)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy("score", "doc_id")
    scored.join(corpus.select("doc_id", "lang"), "doc_id")
      .withColumn("decile", ntile(10).over(win))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_target"),
        min("score").as("lo_score"), max("score").as("hi_score"))
  }

  /** D39: DSIR importance weights with the English documents as the
    * target corpus — see [[TextAnalysis.dsirWeights]]. */
  def d39Dsir(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirWeights(docs(s, dir), col("doc_id"), col("text"),
      col("lang") === "en")

  /** D12: one distributed Lloyd iteration over the embeddings fixture —
    * K=8 seeds, fixed-point-exact assignment + centroid accumulators
    * (see [[graft.llm.KMeans]]). */
  def d12Kmeans(s: SparkSession, dir: String): DataFrame =
    KMeans.lloydQuery(table(s, dir, "embeddings"), k = 8)

  /** D12b: TWO chained Lloyd iterations in one plan — membership moves
    * between the assignments, so this gates the iterate, not one step. */
  def d12Kmeans2(s: SparkSession, dir: String): DataFrame =
    KMeans.lloydTwice(table(s, dir, "embeddings"), k = 8)

  /** Composite training-data pipeline — D1+D4+D6 composing end to end,
    * the mix-building query a 100 TB corpus run actually looks like:
    * inject dups → exact dedup (keep the min-id copy) → lexicon langid
    * gate (predicted 'en') → length quality gate → per-source token
    * budget. Every stage is a keyed shuffle or broadcast; the corpus is
    * scanned once per independent aggregate (dedup keys, lexicon, final
    * stats). */
  def pipeTrainingMix(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L))
    val keep = Dedup.exact(corpus, col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    val pred = TextAnalysis.langId(corpus, col("doc_id"), col("text"),
      col("lang"))
    corpus
      .join(keep, "doc_id")
      .join(pred, "doc_id")
      .filter(col("pred_lang") === "en" && col("n_chars") >= 100)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " "))).cast("long").as("sum_toks"),
           sum(TextAnalysis.bpeishCount(col("text"))).cast("long")
             .as("sum_bpe"))
  }

  /** Capstone composite: the full pretraining-corpus assembly —
    * plant PII → inject dups → exact dedup → length gate → repetition
    * gate (duplicate-bigram fraction ≤ 0.1, per-row expression) →
    * test-set decontamination (every 13th doc stands in for the
    * benchmark; the embedded copies scrub themselves out) → PII
    * redaction (emails/phones/IPv4s → typed sentinels; observable in the
    * manifest through the per-doc text fingerprint and redaction count)
    * → deterministic stratified sampling (source re-weighting) →
    * sequence packing into 2048-token context windows.
    * D1+D6+D9+D10+D7+D8 composing end-to-end; the output is the pack
    * manifest a training loader would consume.
    *
    * PII is planted on every 17th doc EXCEPT benchmark (%13) docs — a
    * planted benchmark doc would share the planted suffix's 5-grams with
    * every other planted doc and decontamination would scrub them all,
    * leaving the redaction stage nothing to do. */
  def pipePretrainCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val planted = d.select(col("doc_id"),
      when(col("doc_id") % 17 === 0 && col("doc_id") % 13 =!= 0,
        concat(col("text"),
          lit(" contact bob@example.org or 555-123-4567 from 10.0.0.1")))
        .otherwise(col("text")).as("text"),
      col("source"), col("n_chars"))
    val corpus = planted.unionByName(
      planted.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L))
    val keep = Dedup.exact(corpus, col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    val kept = corpus.join(keep, "doc_id").filter(col("n_chars") >= 100)
    // per-row repetition gate: raw (unrounded) duplicate-bigram fraction,
    // an integer-derived IEEE double — bit-identical in any engine
    val nW = size(split(col("text"), " "))
    val dupFrac = when(nW >= 2,
      lit(1.0) - size(Dedup.shingleArray(col("text"), 2)).cast("double")
        / (nW - 1))
      .otherwise(lit(0.0))
    val lowRep = kept.filter(dupFrac <= 0.1)
    val clean = Dedup.decontaminate(lowRep, col("doc_id"), col("text"),
      d.filter(col("doc_id") % 13 === 0), col("text"), n = 5)
    // D10: redact AFTER decontamination (the scrub must see the corpus
    // text as-ingested), BEFORE sampling/packing (nothing downstream may
    // observe raw PII); count on pre-redaction text, fingerprint on post
    val (redTxt, redCnt) = TextAnalysis.redactionOf(col("text"))
    val redacted = clean
      .select(col("doc_id"), redTxt.as("text"), col("source"),
              redCnt.as("n_redactions"))
      .withColumn("fp", md5(col("text")))
    val sampled = Sampling.stratified(redacted, col("doc_id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25)
    Packing.sequencePack(sampled, col("doc_id"), col("text"),
      col("source"), ctx = 2048, carry = Seq("fp", "n_redactions"))
  }

  // ---------- registry ----------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_dedup_exact" -> d1DedupExact,
    "d2_minhash_lsh" -> d2MinhashLsh,
    "d2_incremental_lsh" -> d2IncrementalLsh,
    "d2_lsh_ingest" -> d2LshIngest,
    "d17_url_canon" -> d17UrlCanon,
    "d18_host_quota" -> d18HostQuota,
    "d19_host_rank" -> d19HostRank,
    "d24_triangles" -> d24Triangles,
    "d43_sssp" -> d43Sssp,
    "d20_cdc_chunks" -> d20CdcChunks,
    "d21_embed_outliers" -> d21EmbedOutliers,
    "d22_quality_percentile" -> d22QualityPercentile,
    "d2_ngram_jaccard" -> d2NgramJaccard,
    "d2_dedup_clusters" -> d2DedupClusters,
    "d25_dedup_keepbest" -> d25DedupKeepbest,
    "d2_simhash" -> d2Simhash,
    "d9_decontaminate" -> d9Decontaminate,
    "d7_stratified_sample" -> d7StratifiedSample,
    "d8_sequence_pack" -> d8SequencePack,
    "d2_cosine_neardup" -> d2CosineNearDup,
    "d23_semdedup" -> d23SemDedup,
    "d34_knn_graph" -> d34KnnGraph,
    "d3_cosine_topk" -> d3CosineTopK,
    "d3_ann_lsh" -> d3AnnLsh,
    "d3_ivf_topk" -> d3IvfTopK,
    "d3_ivf_trained" -> d3IvfTrained,
    "d3_ivfpq_topk" -> d3IvfpqTopK,
    "d16_pq_topk" -> d16PqTopK,
    "d36_sq8_topk" -> d36Sq8TopK,
    "d37_rerank_topk" -> d37RerankTopK,
    "d38_batch_topk" -> d38BatchTopK,
    "a15_heavy_hitters" -> a15HeavyHitters,
    "d4_top_tokens" -> d4TopTokens,
    "d4_tfidf" -> d4TfIdf,
    "d32_bm25" -> d32Bm25,
    "d33_gopher_rules" -> d33GopherRules,
    "d35_source_overlap" -> d35SourceOverlap,
    "d4_langid" -> d4LangId,
    "d4_fingerprint" -> d4Fingerprint,
    "d5_multimodal" -> d5Multimodal,
    "d5_frames" -> d5Frames,
    "d5_decode_bmp" -> d5DecodeBmp,
    "d5_decode_wav" -> d5DecodeWav,
    "d5_frames_avi" -> d5FramesAvi,
    "d5_decode_png" -> d5DecodePng,
    "d6_quality" -> d6Quality,
    "d6_repetition" -> d6Repetition,
    "d11_vocab_oov" -> d11VocabOov,
    "d12_kmeans" -> d12Kmeans,
    "d12_kmeans2" -> d12Kmeans2,
    "d13_lm_surprise" -> d13LmSurprise,
    "d39_dsir" -> d39Dsir,
    "d41_perceptron" -> d41Perceptron,
    "d42_calibration" -> d42Calibration,
    "d14_chunk_overlap" -> d14ChunkOverlap,
    "d15_bpe_pairs" -> d15BpePairs,
    "d15_bpe_encode" -> d15BpeEncode,
    "d40_fertility" -> d40Fertility,
    "d15_bpe_tokens" -> d15BpeTokens,
    "d10_redact_pii" -> d10RedactPii,
    "pipe_training_mix" -> pipeTrainingMix,
    "pipe_rag_index" -> pipeRagIndex,
    "pipe_pretrain_corpus" -> pipePretrainCorpus,
    "pipe_tokenized_pack" -> pipeTokenizedPack,
    "pipe_crawl_frontier" -> pipeCrawlFrontier,
    "pipe_semdedup_corpus" -> pipeSemdedupCorpus,
    "d26_temperature_mix" -> d26TemperatureMix,
    "d27_substring_dedup" -> d27SubstringDedup,
    "d28_quality_classifier" -> d28QualityClassifier,
    "d29_span_removal" -> d29SpanRemoval,
    "d30_containment" -> d30Containment,
    "d31_line_dedup" -> d31LineDedup,
    "pipe_ccnet_corpus" -> pipeCcnetCorpus,
    "pipe_c4_corpus" -> pipeC4Corpus,
    "pipe_dolma_corpus" -> pipeDolmaCorpus,
    "pipe_fineweb_corpus" -> pipeFinewebCorpus,
    "pipe_dclm_corpus" -> pipeDclmCorpus,
    "pipe_rpv2_signals" -> pipeRpv2Signals,
    "pipe_split_assign" -> pipeSplitAssign
  )

  // ---------- oracle SQL (DuckDB dialect) ----------

  /** DuckDB replay of [[Bpe.train]] + [[Bpe.encode]] at `k` merges,
    * built round by round as plain (non-recursive) CTEs — one
    * (pairs, winner, substitute) block per merge rank, mechanically
    * generated. Symbol arrays replay as chr(1)-delimited strings (each
    * symbol wrapped \x01sym\x01, so adjacent symbols meet as \x01\x01):
    * DuckDB's left-to-right non-overlapping replace() of
    * \x01a\x01\x01b\x01 with \x01ab\x01 IS the greedy BPE pair
    * substitution, symbol-boundary-safe by construction (fixture text
    * never contains \x01), and because the whole match is consumed the
    * scan resumes AFTER the merged token — the same one-pending-symbol
    * semantics as [[Bpe.mergePair]]'s fold ("aaaa" -> "aa","aa").
    * If pairs run dry before rank k, the round's winner falls back to
    * the unmatchable sentinel pair (chr(2), chr(2)) — a no-op replace —
    * instead of an EMPTY CTE whose cross join would annihilate every
    * downstream round; mirrors [[Bpe.train]]'s exhaustion stop. */
  private val bpeD = "chr(1)"        // symbol delimiter
  private val bpeD2 = s"$bpeD||$bpeD" // inter-symbol boundary
  private val bpeToSyms =            // word -> \x01c\x01\x01c\x01...
    s"regexp_replace(tok, '(.)', $bpeD||'\\1'||$bpeD, 'g')"

  /** The per-rank (pairs, winner, substitute) training CTEs shared by
    * the BPE oracles — see [[bpeEncodeOracle]] for the replay notes. */
  private def bpeRounds(k: Int): Seq[String] = {
    val (d, d2) = (bpeD, bpeD2)
    (1 to k).map { r =>
      s"""p$r AS (
         |  SELECT z[1] AS a, z[2] AS b, CAST(sum(c) AS BIGINT) AS weight
         |  FROM (SELECT c, unnest(list_zip(l, l[2:])) AS z FROM (
         |          SELECT c, string_split(trim(str, $d), $d2) AS l
         |          FROM s${r - 1}))
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         |win$r AS (
         |  (SELECT a AS a$r, b AS b$r FROM p$r
         |   ORDER BY weight DESC, a ASC, b ASC LIMIT 1)
         |  UNION ALL
         |  SELECT chr(2), chr(2) WHERE NOT EXISTS (SELECT 1 FROM p$r)),
         |s$r AS (
         |  SELECT c, replace(str, $d||a$r||$d2||b$r||$d,
         |                    $d||a$r||b$r||$d) AS str
         |  FROM s${r - 1}, win$r)""".stripMargin
    }
  }

  /** A word's full merge chain as one nested replace expression. */
  private def bpeEncChain(k: Int): String =
    (1 to k).foldLeft(bpeToSyms) { (acc, r) =>
      s"replace($acc, $bpeD||a$r||$bpeD2||b$r||$bpeD, $bpeD||a$r||b$r||$bpeD)"
    }

  private def bpeEncodeOracle(k: Int): String = {
    val (d, d2, toSyms) = (bpeD, bpeD2, bpeToSyms)
    val rounds = bpeRounds(k)
    val encChain = bpeEncChain(k)
    s"""WITH w0 AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE length(tok) >= 2 GROUP BY tok),
       |s0 AS (SELECT c, $toSyms AS str FROM w0),
       |${rounds.mkString(",\n")},
       |dw AS (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents)
       |  WHERE length(tok) >= 1),
       |es AS (
       |  SELECT doc_id, tok, $encChain AS str
       |  FROM dw, ${(1 to k).map("win" + _).mkString(", ")})
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(length(tok)) AS BIGINT) AS n_sym0,
       |  CAST(sum(len(string_split(trim(str, $d), $d2))) AS BIGINT)
       |    AS n_tok
       |FROM es GROUP BY doc_id""".stripMargin
  }

  /** [[bpeEncodeOracle]] generalized to TOKEN-ID sequences: the same
    * training replay, plus the induced vocabulary (base code points at
    * tier 0, merge concats by rank, ids by (tier, sym) order — exactly
    * [[graft.llm.Bpe.vocab]]) and per-(doc, word-position) token
    * explosion joined to it. Sentinel (chr(2)) exhaustion rounds are
    * excluded from the vocab, mirroring the Spark merge table simply
    * not having those rows. */
  /** PageRank replay prefix shared by the d19 and pipe5 oracles: the
    * deterministic host graph + out-weights + uniform r0 — ONE
    * definition, matching the Scala-side [[hostEdges]]. */
  private val hostRankPrefixSql: String =
    """edges AS (
      |  SELECT doc_id % 7 AS src, (doc_id % 13) % 7 AS dst,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM documents GROUP BY 1, 2),
      |outw AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
      |e AS (SELECT edges.src, edges.dst, edges.w, outw.outw
      |      FROM edges JOIN outw USING (src)),
      |hosts AS (SELECT unnest(range(0, 7)) AS host),
      |r0 AS (SELECT host, 1048576 // 7 AS rank FROM hosts)""".stripMargin

  /** Generated power-iteration rounds INCLUDING the dangling-mass
    * redistribution term [[graft.llm.HostRank.ranks]] carries — the
    * replay must encode the function's full contract even though the
    * fixture graph has no dangling residues (dmass is 0 there), or a
    * corpus missing a mod-7 class would split the engines. */
  private def hostRankRounds(iters: Int): String =
    (1 to iters).map { i =>
      s"""dg$i AS (
         |  SELECT coalesce(sum(r.rank), 0) AS dmass
         |  FROM r${i - 1} r WHERE r.host NOT IN (SELECT src FROM e)),
         |c$i AS (
         |  SELECT e.dst, sum((r.rank * e.w) // e.outw) AS sc
         |  FROM e JOIN r${i - 1} r ON e.src = r.host GROUP BY 1),
         |r$i AS (
         |  SELECT h.host,
         |    ((1048576 * 15 // 100) // 7) +
         |    (85 * (coalesce(c.sc, 0) + (SELECT dmass FROM dg$i) // 7)
         |       // 100) AS rank
         |  FROM hosts h LEFT JOIN c$i c ON h.host = c.dst)""".stripMargin
    }.mkString(",\n")

  /** D40 oracle: the d15 encode oracle's per-doc counts wrapped as a
    * CTE and aggregated per language — the identical replay one
    * aggregate deeper. */
  private def bpeFertilityOracle(k: Int): String = {
    val base = bpeEncodeOracle(k)
    val i = base.lastIndexOf("SELECT doc_id, CAST(count(*) AS BIGINT)")
    require(i > 0, "encode oracle shape changed")
    base.substring(0, i).stripSuffix("\n").stripSuffix(",") + ",\n" +
      "enc AS (\n" + base.substring(i) + ")\n" +
      """SELECT d.lang, count(*) AS n_docs,
        |  CAST(sum(enc.n_words) AS BIGINT) AS sum_words,
        |  CAST(sum(enc.n_sym0) AS BIGINT) AS sum_chars,
        |  CAST(sum(enc.n_tok) AS BIGINT) AS sum_tok
        |FROM enc JOIN documents d USING (doc_id)
        |GROUP BY 1""".stripMargin
  }

  /** The WITH-clause prefix shared by [[bpeTokensOracle]] and the
    * tokenized-pack oracle: training replay + vocabulary + per-(doc,
    * word-ordinality, position) token ids (the `ids` CTE). */
  private def bpeIdsCtes(k: Int): String = {
    val (d, d2) = (bpeD, bpeD2)
    val rounds = bpeRounds(k)
    val encChain = bpeEncChain(k)
    val mergeSyms = (1 to k)
      .map(r => s"SELECT a$r || b$r AS sym, $r AS r FROM win$r WHERE a$r != chr(2)")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH w0 AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE length(tok) >= 2 GROUP BY tok),
       |s0 AS (SELECT c, $bpeToSyms AS str FROM w0),
       |${rounds.mkString(",\n")},
       |allw AS (
       |  SELECT doc_id, i.x AS widx, l[i.x] AS tok FROM (
       |    SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |    LATERAL (SELECT unnest(range(1, len(l) + 1)) AS x) i
       |  WHERE length(l[i.x]) >= 1),
       |basesyms AS (
       |  SELECT DISTINCT substr(tok, i.x, 1) AS sym, 0 AS r
       |  FROM allw, LATERAL (SELECT unnest(range(1, len(tok) + 1)) AS x) i),
       |mergesyms AS (
       |  $mergeSyms),
       |vocab AS (
       |  SELECT sym, min(r) AS r FROM (
       |    SELECT * FROM basesyms UNION ALL SELECT * FROM mergesyms)
       |  GROUP BY sym),
       |vids AS (
       |  SELECT sym,
       |    CAST(row_number() OVER (ORDER BY r, sym) - 1 AS INT) AS vocab_id
       |  FROM vocab),
       |es AS (
       |  SELECT doc_id, widx, $encChain AS str
       |  FROM allw, ${(1 to k).map("win" + _).mkString(", ")}),
       |toks AS (
       |  SELECT doc_id, widx, p.x AS pos, tl[p.x] AS tsym FROM (
       |    SELECT doc_id, widx, string_split(trim(str, $d), $d2) AS tl
       |    FROM es),
       |    LATERAL (SELECT unnest(range(1, len(tl) + 1)) AS x) p),
       |ids AS (
       |  SELECT t.doc_id, t.widx, t.pos, v.vocab_id
       |  FROM toks t JOIN vids v ON t.tsym = v.sym)""".stripMargin
  }

  private def bpeTokensOracle(k: Int): String =
    s"""${bpeIdsCtes(k)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |  array_to_string(list(vocab_id ORDER BY widx, pos), ',') AS token_ids
       |FROM ids GROUP BY doc_id""".stripMargin

  /** Tokenized-pack replay: real per-doc BPE token counts from the
    * `ids` CTE, then the concat-and-chunk window arithmetic per source
    * stratum (the d8 shape over REAL counts, ctx = 1024). */
  private def pipeTokenizedPackOracle(k: Int): String =
    s"""${bpeIdsCtes(k)},
       |counts AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
       |  FROM ids GROUP BY doc_id),
       |tagged AS (
       |  SELECT d.source, c.doc_id, c.n_tok
       |  FROM counts c JOIN documents d USING (doc_id)),
       |cums AS (
       |  SELECT source, doc_id, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |                     ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM tagged)
       |SELECT source, doc_id, n_tok,
       |  CAST(floor((cum - n_tok) / 1024.0) AS INT) AS pack_id,
       |  CAST((cum - n_tok) % 1024 AS INT) AS pos
       |FROM cums""".stripMargin

  /** Shared CTE: word-3-gram distinct shingles of a `corpus(doc_id, text)`. */
  private val shingleCtes =
    """words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
      |sh AS (SELECT DISTINCT doc_id, w[i.x] || ' ' || w[i.x+1] || ' ' || w[i.x+2] AS s
      |       FROM words, LATERAL (SELECT unnest(range(1, len(w)-1)) AS x) i
      |       WHERE len(w) >= 3)""".stripMargin

  /** Shared recursive-closure CTE chain for the near-dup-chain corpus:
    * planted corpus -> shingles -> exact Jaccard pairs (>= 0.8) ->
    * symmetric edges -> transitive reach. Used by the d2_dedup_clusters
    * and d25_dedup_keepbest oracles (one definition, no drift). */
  private val closureCtes =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' qqzz'
       |  FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 3000000, text || ' qqzz wwoo eeyy'
       |  FROM documents WHERE doc_id % 10 = 0),
       |$shingleCtes,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a_id, b_id FROM inter
       |  JOIN sizes sa ON sa.doc_id = a_id
       |  JOIN sizes sb ON sb.doc_id = b_id
       |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)""".stripMargin

  /** Shared SemDeDup replay CTEs (corp → two-Lloyd → third assignment
    * → within-cluster pairs → sims at the 0.95 threshold). `shift` is
    * the planted-twin id arithmetic: "+ 1000000" plants twins ABOVE the
    * corpus (originals keep — the d23 gate), "- 1000000" plants them
    * BELOW (the planted twin keeps, the REAL doc drops — the capstone's
    * load-bearing form). */
  /** The planted-twin SemDeDup corpus CTE body (see [[semDedupCtes]]). */
  private def semDedupCorp(shift: String): String =
    s"""  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id $shift,
       |    [CAST(embedding[1] AS DOUBLE) + 0.05] ||
       |      list_transform(embedding[2:], x -> CAST(x AS DOUBLE)),
       |    [CAST(round((CAST(embedding[1] AS DOUBLE) + 0.05) * 1048576)
       |          AS BIGINT)] ||
       |      list_transform(embedding[2:],
       |        x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT))
       |  FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  /** The plain (unplanted) corpus CTE body — the d34 kNN graph runs on
    * the raw embeddings table. */
  private val plainCorp: String =
    """  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
      |  FROM embeddings""".stripMargin

  /** Two-Lloyd-round trained-cell assignment CTEs (corp → a3: the
    * [[graft.llm.KMeans.codebook2Q]] replay) over the given corpus CTE
    * body — shared by the SemDeDup family and the d34 kNN graph. */
  private def lloydA3Ctes(corpSql: String): String =
      s"""WITH corp AS (
         |$corpSql),
         |seeds0 AS (
         |  SELECT cid, cv FROM (
         |    SELECT vec_id AS cid, qv AS cv,
         |      row_number() OVER (
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
         |      count(*) OVER () AS nn
         |    FROM corp)
         |  WHERE rn <= greatest(8, nn // 64)),
         |d1 AS (
         |  SELECT t.vec_id, s.cid,
         |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
         |  FROM corp t, seeds0 s,
         |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
         |  GROUP BY 1, 2),
         |a1 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d1) WHERE rn = 1),
         |c1 AS (
         |  SELECT a1.cid, i.x AS pos, sum(t.qv[i.x]) // count(*) AS cc
         |  FROM a1 JOIN corp t USING (vec_id),
         |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
         |  GROUP BY 1, 2),
         |seeds1 AS (SELECT cid, list(cc ORDER BY pos) AS cv FROM c1 GROUP BY 1),
         |d2 AS (
         |  SELECT t.vec_id, s.cid,
         |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
         |  FROM corp t, seeds1 s,
         |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
         |  GROUP BY 1, 2),
         |a2 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d2) WHERE rn = 1),
         |c2 AS (
         |  SELECT a2.cid, i.x AS pos, sum(t.qv[i.x]) // count(*) AS cc
         |  FROM a2 JOIN corp t USING (vec_id),
         |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
         |  GROUP BY 1, 2),
         |cents AS (SELECT cid, list(cc ORDER BY pos) AS cv FROM c2 GROUP BY 1),
         |d3 AS (
         |  SELECT t.vec_id, s.cid,
         |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
         |  FROM corp t, cents s,
         |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
         |  GROUP BY 1, 2),
         |a3 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d3) WHERE rn = 1)""".stripMargin

  private def semDedupCtes(shift: String): String =
    cosPairSql(
      lloydA3Ctes(semDedupCorp(shift)) +
      """,
        |pairs AS (
        |  SELECT a.vec_id AS a_id, ta.v AS va, b.vec_id AS b_id, tb.v AS vb
        |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  JOIN corp ta ON ta.vec_id = a.vec_id
        |  JOIN corp tb ON tb.vec_id = b.vec_id)""".stripMargin) +
    """,
      |sims AS (
      |  SELECT a_id, b_id, round(dot / (na * nb), 6) AS cs
      |  FROM dots WHERE round(dot / (na * nb), 6) >= 0.95)""".stripMargin

  /** D34 oracle: same trained cells over the PLAIN corpus, DIRECTED
    * within-cell pairs, per-source top-kNbr by (cs DESC, nbr_id). */
  private val knnGraphSql: String =
    cosPairSql(
      lloydA3Ctes(plainCorp) +
      """,
        |pairs AS (
        |  SELECT a.vec_id AS a_id, ta.v AS va, b.vec_id AS b_id, tb.v AS vb
        |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id <> b.vec_id
        |  JOIN corp ta ON ta.vec_id = a.vec_id
        |  JOIN corp tb ON tb.vec_id = b.vec_id)""".stripMargin) +
    """
      |SELECT vec_id, rank, nbr_id, cs AS cos_sim FROM (
      |  SELECT a_id AS vec_id, b_id AS nbr_id,
      |    round(dot / (na * nb), 6) AS cs,
      |    row_number() OVER (PARTITION BY a_id
      |      ORDER BY round(dot / (na * nb), 6) DESC, b_id) AS rank
      |  FROM dots)
      |WHERE rank <= 3""".stripMargin

  /** Cosine of doc pairs `(a_id, va, b_id, vb)` via explicit position sum. */
  private def cosPairSql(pairsCte: String): String =
    s"""$pairsCte,
       |dots AS (
       |  SELECT a_id, b_id,
       |    sum(va[i.x] * vb[i.x]) AS dot,
       |    sqrt(sum(va[i.x] * va[i.x])) AS na,
       |    sqrt(sum(vb[i.x] * vb[i.x])) AS nb
       |  FROM pairs, LATERAL (SELECT unnest(range(1, len(va) + 1)) AS x) i
       |  GROUP BY 1, 2)""".stripMargin

  private val simhashVotes = (1 to 16)
    .map(j => s"sum(CASE WHEN substr(md5(tok), $j, 1) >= '8' THEN 1 ELSE -1 END) AS v$j")
    .mkString(",\n  ")
  private val simhashBits = (1 to 16)
    .map(j => s"CASE WHEN v$j > 0 THEN ${1L << (j - 1)} ELSE 0 END")
    .mkString(" + ")

  /** Exact all-pairs shingle-Jaccard over the near-dup corpus — the shared
    * oracle for BOTH d2_minhash_lsh (whose banding miss probability at
    * J>=0.8 is ~8e-8, below the gate's resolution) and d2_ngram_jaccard
    * (exact by construction). */
  private val exactJaccardSql =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' qqzz' FROM documents WHERE doc_id % 10 = 0),
       |$shingleCtes,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id,
       |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = a_id
       |JOIN sizes sb ON sb.doc_id = b_id
       |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8""".stripMargin

  /** The d41 batch-epoch replay CTE chain (tk/t/w0..w3), shared by
    * the perceptron oracle and the d42 calibration oracle. */
  private val perceptronCtes: String =
    """WITH tk AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, y,
        |    (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS b,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM tk GROUP BY 1, 2, 3),
        |w0 AS (SELECT unnest(range(0, 256)) AS b, CAST(0 AS BIGINT) AS w),
        |s1 AS (
        |  SELECT d.doc_id, d.y, sum(d.cnt * w0.w) AS sc
        |  FROM t d JOIN w0 USING (b) GROUP BY 1, 2),
        |m1 AS (SELECT doc_id, y FROM s1 WHERE y * sc <= 0),
        |g1 AS (SELECT d.b, sum(d.y * d.cnt) AS g
        |       FROM t d JOIN (SELECT doc_id FROM m1) USING (doc_id)
        |       GROUP BY 1),
        |w1 AS (SELECT w0.b, w0.w + coalesce(g1.g, 0) AS w
        |       FROM w0 LEFT JOIN g1 USING (b)),
        |s2 AS (
        |  SELECT d.doc_id, d.y, sum(d.cnt * w1.w) AS sc
        |  FROM t d JOIN w1 USING (b) GROUP BY 1, 2),
        |m2 AS (SELECT doc_id, y FROM s2 WHERE y * sc <= 0),
        |g2 AS (SELECT d.b, sum(d.y * d.cnt) AS g
        |       FROM t d JOIN (SELECT doc_id FROM m2) USING (doc_id)
        |       GROUP BY 1),
        |w2 AS (SELECT w1.b, w1.w + coalesce(g2.g, 0) AS w
        |       FROM w1 LEFT JOIN g2 USING (b)),
        |s3 AS (
        |  SELECT d.doc_id, d.y, sum(d.cnt * w2.w) AS sc
        |  FROM t d JOIN w2 USING (b) GROUP BY 1, 2),
        |m3 AS (SELECT doc_id, y FROM s3 WHERE y * sc <= 0),
        |g3 AS (SELECT d.b, sum(d.y * d.cnt) AS g
        |       FROM t d JOIN (SELECT doc_id FROM m3) USING (doc_id)
        |       GROUP BY 1),
        |w3 AS (SELECT w2.b, w2.w + coalesce(g3.g, 0) AS w
        |       FROM w2 LEFT JOIN g3 USING (b)),
        """.stripMargin

  val oracle: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 7 = 0)
        |SELECT max(md5(text)) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM corpus GROUP BY text""".stripMargin,
    "d2_minhash_lsh" -> exactJaccardSql,
    "d2_ngram_jaccard" -> exactJaccardSql,
    // the incremental probe reports only index-vs-batch pairs (old id
    // < 1e6, batch id >= 1e6); batch-internal pairs are the NEXT
    // ingest's job (see Dedup.incrementalLsh)
    "d2_incremental_lsh" ->
      (exactJaccardSql + "\n  AND a_id < 1000000 AND b_id >= 1000000"),
    // the maintained-index replay: three-part corpus; ingest-1 pairs are
    // base↔b1, ingest-2 pairs are (base ∪ b1)↔b2 — each ingest reports
    // index-vs-batch only (batch-internal pairs land on the next ingest)
    "d2_lsh_ingest" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' qqzz'
         |  FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text || ' qqzz ww'
         |  FROM documents WHERE doc_id % 10 = 0),
         |$shingleCtes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id,
         |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a_id
         |JOIN sizes sb ON sb.doc_id = b_id
         |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
         |  AND ((a_id < 1000000 AND b_id >= 1000000 AND b_id < 2000000)
         |       OR (a_id < 2000000 AND b_id >= 2000000))""".stripMargin,
    "d22_quality_percentile" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (
        |  SELECT *, percent_rank() OVER (PARTITION BY source
        |    ORDER BY n_tok, doc_id) AS pr FROM t)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN pr >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  min(CASE WHEN pr >= 0.5 THEN n_tok END) AS min_kept_tok
        |FROM p GROUP BY 1""".stripMargin,
    // outlier replay: per-source integer centroid (sum // n per
    // position), exact integer L2, top-3 per source with tie-break
    "d21_embed_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |j AS (
        |  SELECT d.source, d.doc_id, e.qv
        |  FROM e JOIN documents d ON e.vec_id = d.doc_id),
        |cp AS (
        |  SELECT source, i.x AS pos, sum(qv[i.x]) // count(*) AS c
        |  FROM j, LATERAL (SELECT unnest(range(1, len(qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |cent AS (SELECT source, list(c ORDER BY pos) AS cv FROM cp GROUP BY 1),
        |scored AS (
        |  SELECT j.source, j.doc_id,
        |    CAST(sum((j.qv[i.x] - c.cv[i.x]) * (j.qv[i.x] - c.cv[i.x]))
        |         AS BIGINT) AS dist
        |  FROM j JOIN cent c ON j.source = c.source,
        |       LATERAL (SELECT unnest(range(1, len(j.qv) + 1)) AS x) i
        |  GROUP BY 1, 2)
        |SELECT source, CAST(rank AS INT) AS rank, doc_id, dist FROM (
        |  SELECT source, doc_id, dist,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY dist DESC, doc_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 3""".stripMargin,
    // crawl-frontier replay: canon regex + min-keeper + quota window +
    // the SHARED generated PageRank rounds (hostRankPrefixSql/Rounds)
    "pipe_crawl_frontier" -> {
      s"""WITH u AS (
         |  SELECT doc_id,
         |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
         |    'h' || CAST(doc_id % 7 AS VARCHAR) ||
         |    (CASE WHEN doc_id % 3 = 0 THEN '.Example.ORG'
         |          ELSE '.example.org' END) ||
         |    '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
         |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
         |    (CASE WHEN doc_id % 4 = 0
         |          THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
         |          ELSE '' END) AS url
         |  FROM documents),
         |cn AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) ||
         |    regexp_replace(
         |      regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1), '/$$', '')
         |    AS canon_url
         |  FROM u),
         |kept AS (
         |  SELECT canon_url, min(doc_id) AS doc_id FROM cn GROUP BY 1),
         |q AS (
         |  SELECT doc_id % 7 AS hostn, doc_id,
         |    row_number() OVER (PARTITION BY doc_id % 7 ORDER BY doc_id)
         |      AS rn
         |  FROM kept),
         |agg AS (
         |  SELECT hostn, count(*) AS n_kept, min(doc_id) AS first_id
         |  FROM q WHERE rn <= 20 GROUP BY 1),
         |$hostRankPrefixSql,
         |${hostRankRounds(3)}
         |SELECT a.hostn AS host, a.n_kept, a.first_id,
         |  CAST(r.rank AS BIGINT) AS host_rank
         |FROM agg a JOIN r3 r ON a.hostn = r.host""".stripMargin
    },
    // CDC replay: list_filter boundary positions (same md5-prefix
    // predicate), implicit 0/n bounds, adjacent-diff chunk lengths
    "d20_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |d2 AS (
        |  SELECT doc_id, n,
        |    list_filter(range(4, n), x ->
        |      substr(md5(substr(text, x - 3, 4)), 1, 1) IN ('0', '1'))
        |      AS bpos
        |  FROM d),
        |b AS (SELECT doc_id, n, [0] || bpos || [n] AS bounds FROM d2)
        |SELECT doc_id, CAST(len(bounds) - 1 AS BIGINT) AS n_chunks,
        |  CAST(list_max(list_transform(range(2, len(bounds) + 1),
        |    i -> bounds[i] - bounds[i - 1])) AS BIGINT) AS max_chunk_len,
        |  CAST(n AS BIGINT) AS n_chars
        |FROM b""".stripMargin,
    // depth-counted recursive walk with UNION-deduped states: min(d)
    // per node over all <=8-edge paths == 8 relaxation rounds
    "d43_sssp" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT l_orderkey % 1000 AS src,
        |    (l_orderkey * 7 + l_linenumber) % 1000 AS dst,
        |    (l_orderkey * 3 + l_linenumber) % 50 + 1 AS w
        |  FROM lineitem),
        |walk(node, d, depth) AS (
        |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
        |  UNION
        |  SELECT e.dst, walk.d + e.w, walk.depth + 1
        |  FROM walk JOIN edges e ON e.src = walk.node
        |  WHERE walk.depth < 8)
        |SELECT node, CAST(min(d) AS BIGINT) AS dist
        |FROM walk GROUP BY 1""".stripMargin,
    // id-ordered triangle enumeration — deliberately NOT the Spark
    // side's degree orientation; the count must agree anyway
    "d24_triangles" ->
      """WITH raw AS (
        |  SELECT least(o_custkey % 499, o_orderkey % 499) AS a,
        |         greatest(o_custkey % 499, o_orderkey % 499) AS b
        |  FROM orders),
        |und AS (SELECT DISTINCT a, b FROM raw WHERE a <> b),
        |nodes AS (SELECT DISTINCT v FROM (
        |  SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)),
        |tri AS (
        |  SELECT count(*) AS n
        |  FROM und e1
        |  JOIN und e2 ON e1.b = e2.a
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
        |       (SELECT count(*) FROM und) AS n_edges,
        |       (SELECT n FROM tri) AS n_triangles""".stripMargin,
    // PageRank replay: generated power-iteration rounds (the lloyd-CTE
    // pattern) — all integer fixed-point, same truncation both engines
    "d19_host_rank" ->
      s"""WITH $hostRankPrefixSql,
         |${hostRankRounds(3)}
         |SELECT host, CAST(rank AS BIGINT) AS rank FROM r3""".stripMargin,
    // host-quota replay: same deterministic host synthesis; host via
    // regex between :// and /, lowered; quota = row_number per host
    "d18_host_quota" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
        |    'H' || CAST(doc_id % 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN '.Example.ORG'
        |          ELSE '.example.com' END) ||
        |    '/p/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) AS host
        |  FROM u),
        |r AS (
        |  SELECT doc_id, host,
        |    row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
        |  FROM h)
        |SELECT host, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  min(doc_id) AS first_id
        |FROM r GROUP BY 1""".stripMargin,
    // same deterministic URL synthesis; canonicalization via regex
    // (host between :// and /, lowered; path up to ?/#, trailing slash
    // stripped) — the Spark side uses parse_url for the same pieces
    "d17_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.ORG'
        |          ELSE 'www.example.org' END) ||
        |    '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0
        |          THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
        |          ELSE '' END) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) ||
        |    regexp_replace(
        |      regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1), '/$', '')
        |    AS canon_url
        |  FROM u)
        |SELECT canon_url, count(*) AS n_variants,
        |       min(doc_id) AS keep_id
        |FROM c GROUP BY 1""".stripMargin,
    "d10_redact_pii" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0
        |      THEN text || ' contact bob@example.org or 555-123-4567 from 10.0.0.1'
        |      ELSE text END AS text
        |  FROM documents),
        |r1 AS (
        |  SELECT doc_id,
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c
        |  FROM corpus),
        |r2 AS (
        |  SELECT doc_id,
        |    regexp_replace(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t,
        |    c + len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS c
        |  FROM r1)
        |SELECT doc_id,
        |  regexp_replace(t,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text,
        |  CAST(c + len(regexp_extract_all(t,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_redactions
        |FROM r2""".stripMargin,
    "d6_repetition" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000,
        |    text || ' ' || array_to_string((string_split(text, ' '))[1:3], ' ')
        |  FROM documents WHERE doc_id % 11 = 0),
        |words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
        |toks AS (SELECT doc_id, unnest(w) AS tok FROM words),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |tw AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6)
        |         AS top_word_frac FROM tc GROUP BY 1),
        |b2 AS (SELECT doc_id, w[i.x] || ' ' || w[i.x+1] AS s, len(w) AS nw
        |       FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS x) i
        |       WHERE len(w) >= 2),
        |bi AS (SELECT doc_id,
        |         round(1.0 - CAST(count(DISTINCT s) AS DOUBLE)
        |               / (any_value(nw) - 1), 6) AS dup_bigram_frac
        |       FROM b2 GROUP BY doc_id)
        |SELECT tw.doc_id, tw.top_word_frac,
        |  coalesce(bi.dup_bigram_frac, 0.0) AS dup_bigram_frac
        |FROM tw LEFT JOIN bi ON tw.doc_id = bi.doc_id""".stripMargin,
    "d9_decontaminate" ->
      """WITH bwords AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |  WHERE doc_id % 13 = 0),
        |bsh AS (
        |  SELECT DISTINCT w[i.x] || ' ' || w[i.x+1] || ' ' || w[i.x+2]
        |    || ' ' || w[i.x+3] || ' ' || w[i.x+4] AS s
        |  FROM bwords, LATERAL (SELECT unnest(range(1, len(w)-3)) AS x) i
        |  WHERE len(w) >= 5),
        |words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |csh AS (
        |  SELECT DISTINCT doc_id, w[i.x] || ' ' || w[i.x+1] || ' ' || w[i.x+2]
        |    || ' ' || w[i.x+3] || ' ' || w[i.x+4] AS s
        |  FROM words, LATERAL (SELECT unnest(range(1, len(w)-3)) AS x) i
        |  WHERE len(w) >= 5),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM csh JOIN bsh ON csh.s = bsh.s)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin,
    "d2_dedup_clusters" ->
      s"""$closureCtes
         |SELECT src AS doc_id, min(dst) AS cluster_id
         |FROM reach GROUP BY src""".stripMargin,
    // the same closure; family = component min (singleton: self), split
    // = 16-bit md5 prefix of the FAMILY mod 10 — per-family by
    // construction, so the straddle audit is structurally zero
    "pipe_split_assign" ->
      s"""$closureCtes,
         |fam AS (
         |  SELECT c.doc_id,
         |    coalesce(least(c.doc_id, r.mn), c.doc_id) AS family
         |  FROM corpus c LEFT JOIN
         |    (SELECT src, min(dst) AS mn FROM reach GROUP BY 1) r
         |    ON r.src = c.doc_id),
         |hv AS (
         |  SELECT doc_id, family,
         |    ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096 +
         |     (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256 +
         |     (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 +
         |     (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 10 AS h
         |  FROM (SELECT doc_id, family,
         |          substr(md5(CAST(family AS VARCHAR)), 1, 4) AS hx
         |        FROM fam)),
         |asg AS (
         |  SELECT doc_id, family,
         |    CASE WHEN h <= 7 THEN 'train' WHEN h = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM hv),
         |aud AS (
         |  SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS families_straddling
         |  FROM (SELECT family, count(DISTINCT split) AS ns
         |        FROM asg GROUP BY 1))
         |SELECT split, count(*) AS n_docs,
         |  count(DISTINCT family) AS n_families, a.families_straddling
         |FROM asg CROSS JOIN aud a
         |GROUP BY 1, 4""".stripMargin,
    // same recursive closure; family = least(self, min-reachable) = the
    // component minimum, then the longest-text (ties: lowest id) pick
    "d25_dedup_keepbest" ->
      s"""$closureCtes,
         |fam AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS family
         |  FROM reach GROUP BY src),
         |sel AS (
         |  SELECT f.family, f.doc_id, length(c.text) AS l,
         |    row_number() OVER (PARTITION BY f.family
         |      ORDER BY length(c.text) DESC, f.doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY f.family) AS nm
         |  FROM fam f JOIN corpus c ON c.doc_id = f.doc_id)
         |SELECT family, CAST(nm AS BIGINT) AS n_members, doc_id AS kept_id,
         |  CAST(l AS BIGINT) AS kept_len
         |FROM sel WHERE rn = 1""".stripMargin,
    "d8_sequence_pack" ->
      """WITH t AS (
        |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(floor((cum - n_tokens) / 2048.0) AS INT) AS pack_id,
        |  CAST((cum - n_tokens) % 2048 AS INT) AS pos
        |FROM c""".stripMargin,
    "d7_stratified_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) <
        |  CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '4000'
        |              WHEN 'src2' THEN '2000' ELSE '1000' END""".stripMargin,
    "d2_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |votes AS (SELECT doc_id,
         |  $simhashVotes
         |  FROM toks GROUP BY 1)
         |SELECT doc_id, CAST($simhashBits AS BIGINT) AS sh16 FROM votes""".stripMargin,
    "d2_cosine_neardup" -> (
      cosPairSql(
        """WITH corpus AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |  FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 1000000,
          |    [CAST(embedding[1] AS DOUBLE) + 0.05] ||
          |    list_transform(embedding[2:], x -> CAST(x AS DOUBLE))
          |  FROM embeddings WHERE vec_id % 20 = 0),
          |bucketed AS (
          |  SELECT vec_id, v,
          |    (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END +
          |     CASE WHEN v[2] > 0 THEN 2 ELSE 0 END +
          |     CASE WHEN v[3] > 0 THEN 4 ELSE 0 END +
          |     CASE WHEN v[4] > 0 THEN 8 ELSE 0 END +
          |     CASE WHEN v[5] > 0 THEN 16 ELSE 0 END +
          |     CASE WHEN v[6] > 0 THEN 32 ELSE 0 END) AS bucket
          |  FROM corpus),
          |pairs AS (
          |  SELECT a.vec_id AS a_id, a.v AS va, b.vec_id AS b_id, b.v AS vb
          |  FROM bucketed a JOIN bucketed b
          |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin) +
      """
        |SELECT a_id, b_id, round(dot / (na * nb), 6) AS cos_sim
        |FROM dots WHERE round(dot / (na * nb), 6) >= 0.95""".stripMargin),
    // data-derived per-lang thresholds; hex prefix decoded by nibble
    "d26_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
        |th AS (
        |  SELECT lang, least(65536,
        |    CAST(floor(8.0 * 65536 / sqrt(n_l)) AS BIGINT)) AS t16
        |  FROM counts),
        |h AS (
        |  SELECT d.doc_id, d.lang, t.t16,
        |    substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS hx
        |  FROM documents d JOIN th t ON d.lang = t.lang),
        |v AS (
        |  SELECT doc_id, lang, t16,
        |    (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096 +
        |    (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256 +
        |    (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS hv
        |  FROM h)
        |SELECT doc_id, lang, CAST(t16 AS BIGINT) AS t16
        |FROM v WHERE hv < t16""".stripMargin,
    // gram-string inverted index + the same pos - row_number() run
    // grouping (Spark groups by the (xxhash64, md5) pair of the gram —
    // the D1 hash-vs-string count-equality policy)
    "d27_substring_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000,
        |    text || ' spn0 spn1 spn2 spn3 spn4 spn5 spn6 spn7 spn8 spn9'
        |  FROM documents WHERE doc_id % 11 = 0),
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
        |g AS (
        |  SELECT doc_id, i.x AS pos,
        |    ws[i.x] || ' ' || ws[i.x+1] || ' ' || ws[i.x+2] || ' ' ||
        |    ws[i.x+3] || ' ' || ws[i.x+4] || ' ' || ws[i.x+5] || ' ' ||
        |    ws[i.x+6] || ' ' || ws[i.x+7] AS gram
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 6)) AS x) i
        |  WHERE len(ws) >= 8),
        |d AS (SELECT gram FROM g GROUP BY gram
        |      HAVING count(DISTINCT doc_id) >= 2),
        |m AS (SELECT g.doc_id, g.pos, d.gram AS dg
        |      FROM g LEFT JOIN d ON g.gram = d.gram),
        |r AS (SELECT doc_id, pos, dg,
        |        CASE WHEN dg IS NOT NULL THEN
        |          pos - row_number() OVER (
        |            PARTITION BY doc_id, dg IS NOT NULL ORDER BY pos)
        |        END AS grp
        |      FROM m)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_pos,
        |  CAST(count(dg) AS BIGINT) AS dup_pos,
        |  CAST(count(DISTINCT grp) AS BIGINT) AS n_spans
        |FROM r GROUP BY doc_id HAVING count(dg) > 0""".stripMargin,
    // the four stage replays chained: d29's rebuild (no plants, CASE
    // keeps unaffected docs' text verbatim — split+rejoin must not be
    // trusted to round-trip), d28's classifier inlined on the rewritten
    // text, d26's thresholds over the SURVIVORS, d8's pack windows
    "pipe_ccnet_corpus" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, i.x AS pos,
        |    ws[i.x] || ' ' || ws[i.x+1] || ' ' || ws[i.x+2] || ' ' ||
        |    ws[i.x+3] || ' ' || ws[i.x+4] || ' ' || ws[i.x+5] || ' ' ||
        |    ws[i.x+6] || ' ' || ws[i.x+7] AS gram
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 6)) AS x) i
        |  WHERE len(ws) >= 8),
        |ks AS (SELECT gram, min(doc_id) AS keeper FROM g GROUP BY gram
        |       HAVING min(doc_id) <> max(doc_id)),
        |cv AS (SELECT DISTINCT g.doc_id, g.pos + i.x AS wpos
        |       FROM g JOIN ks ON g.gram = ks.gram
        |       CROSS JOIN LATERAL (SELECT unnest(range(0, 8)) AS x) i
        |       WHERE g.doc_id <> ks.keeper),
        |cl AS (SELECT doc_id, list(wpos) AS cov FROM cv GROUP BY doc_id),
        |rw AS (
        |  SELECT d.doc_id, d.lang, d.source,
        |    CASE WHEN cl.doc_id IS NULL THEN d.text
        |         ELSE coalesce(array_to_string(
        |           [w.ws[i] FOR i IN range(1, len(w.ws) + 1)
        |            IF NOT list_contains(cl.cov, i)], ' '), '') END AS text
        |  FROM documents d JOIN w ON d.doc_id = w.doc_id
        |  LEFT JOIN cl ON d.doc_id = cl.doc_id),
        |tb AS (
        |  SELECT doc_id,
        |    (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS b
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM rw)),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |    sum((b * 37) % 101 - 50) AS score
        |  FROM tb GROUP BY doc_id),
        |keptd AS (
        |  SELECT r.doc_id, r.lang, r.source, s.n_tok
        |  FROM rw r JOIN sc s USING (doc_id)
        |  WHERE s.score >= 0 AND s.n_tok >= 5),
        |th AS (
        |  SELECT lang, least(65536,
        |    CAST(floor(8.0 * 65536 / sqrt(count(*))) AS BIGINT)) AS t16
        |  FROM keptd GROUP BY lang),
        |samp AS (
        |  SELECT k.doc_id, k.source, k.n_tok
        |  FROM keptd k JOIN th t USING (lang)
        |  WHERE (strpos('0123456789abcdef',
        |           substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
        |        (strpos('0123456789abcdef',
        |           substr(md5(CAST(k.doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
        |        (strpos('0123456789abcdef',
        |           substr(md5(CAST(k.doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
        |        (strpos('0123456789abcdef',
        |           substr(md5(CAST(k.doc_id AS VARCHAR)), 4, 1)) - 1) < t.t16),
        |cums AS (
        |  SELECT source, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |                     ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM samp)
        |SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
        |  CAST(floor((cum - n_tok) / 1024.0) AS INT) AS pack_id,
        |  CAST((cum - n_tok) % 1024 AS INT) AS pos
        |FROM cums""".stripMargin,
    // same gram index; keeper = min doc_id per duplicated gram; the
    // rebuild walks the same 1-based position list as a comprehension
    "d29_span_removal" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000,
        |    text || ' spn0 spn1 spn2 spn3 spn4 spn5 spn6 spn7 spn8 spn9'
        |  FROM documents WHERE doc_id % 11 = 0),
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
        |g AS (
        |  SELECT doc_id, i.x AS pos,
        |    ws[i.x] || ' ' || ws[i.x+1] || ' ' || ws[i.x+2] || ' ' ||
        |    ws[i.x+3] || ' ' || ws[i.x+4] || ' ' || ws[i.x+5] || ' ' ||
        |    ws[i.x+6] || ' ' || ws[i.x+7] AS gram
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 6)) AS x) i
        |  WHERE len(ws) >= 8),
        |ks AS (SELECT gram, min(doc_id) AS keeper FROM g GROUP BY gram
        |       HAVING min(doc_id) <> max(doc_id)),
        |cv AS (SELECT DISTINCT g.doc_id, g.pos + i.x AS wpos
        |       FROM g JOIN ks ON g.gram = ks.gram
        |       CROSS JOIN LATERAL (SELECT unnest(range(0, 8)) AS x) i
        |       WHERE g.doc_id <> ks.keeper),
        |cl AS (SELECT doc_id, list(wpos) AS cov FROM cv GROUP BY doc_id)
        |SELECT w.doc_id,
        |  CAST(len(w.ws) AS BIGINT) AS n_words,
        |  CAST(len(cl.cov) AS BIGINT) AS n_removed,
        |  coalesce(array_to_string(
        |    [w.ws[i] FOR i IN range(1, len(w.ws) + 1)
        |     IF NOT list_contains(cl.cov, i)], ' '), '') AS new_text
        |FROM w JOIN cl USING (doc_id)""".stripMargin,
    // exact all-pairs containment (no prefix filter) — independently
    // verifies the Scala side's candidate-generation completeness
    "d30_containment" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 5000000,
         |    array_to_string((string_split(text, ' '))[
         |      1:(len(string_split(text, ' ')) + 1) // 2], ' ')
         |  FROM documents WHERE doc_id % 9 = 0),
         |$shingleCtes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, sa.n AS n_a, n_inter
         |FROM inter JOIN sizes sa ON sa.doc_id = a_id
         |WHERE n_inter * 100 >= sa.n * 90""".stripMargin,
    // the C4 chain replayed end to end: line rank dedup -> >=3 kept
    // lines -> lexicon-vote language agreement -> (lang, source) sums.
    // Docs losing EVERY line vanish from doc2 and fail the floor the
    // same way the Spark side's empty rewrite does.
    // same 8-gram window, DISTINCT at (source, md5) grain both sides
    "d35_source_overlap" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT source,
        |    md5(array_to_string(ws[i.x : i.x + 7], ' ')) AS h
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 6)) AS x) i)
        |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    // independent formulation: the blocklist and canonical key resolve
    // to doc_id arithmetic (host class and path are functions of
    // doc_id % 250), so the oracle never parses a URL; langid and
    // gopher stages replay their own oracles over the kept corpus
    // the four signal families' gate-proven CTEs joined wide: gopher
    // measures + flags, d28 classifier, lexicon-vote langid (LEFT,
    // 'und' default), corpus-wide duplicate-line census
    "pipe_rpv2_signals" ->
      """WITH gw AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w
        |  FROM documents),
        |gp AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(strlen(text) - len(w) + 1 AS BIGINT) AS sum_wlen,
        |    CAST(len(list_intersect(w,
        |      ['the','a','of','to','and','in','is','be'])) AS BIGINT)
        |      AS n_stop
        |  FROM gw),
        |gt AS (
        |  SELECT doc_id, CAST(max(c * strlen(tok)) AS BIGINT) AS top_chars
        |  FROM (SELECT doc_id, tok, count(*) AS c FROM (
        |          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM documents) GROUP BY 1, 2)
        |  GROUP BY 1),
        |gop AS (
        |  SELECT gp.doc_id, n_words, sum_wlen, n_stop, top_chars,
        |    CAST(CASE WHEN n_words BETWEEN 50 AND 100000
        |      AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words
        |      AND n_stop >= 2 AND 5 * top_chars <= sum_wlen
        |      THEN 1 ELSE 0 END AS INT) AS gopher_keep
        |  FROM gp JOIN gt USING (doc_id)),
        |wt AS (SELECT b, (b * 37) % 101 - 50 AS wt
        |       FROM (SELECT unnest(range(0, 256)) AS b)),
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents),
        |tb AS (SELECT doc_id,
        |    (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS b
        |  FROM t),
        |cls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |         CAST(sum(wt.wt) AS BIGINT) AS score
        |       FROM tb JOIN wt USING (b) GROUP BY doc_id),
        |toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |freq AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
        |lex AS (
        |  SELECT lang AS lex_lang, tok FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lang
        |               ORDER BY n DESC, tok ASC) AS rk FROM freq)
        |  WHERE rk <= 10),
        |votes AS (
        |  SELECT t2.doc_id, l.lex_lang, count(*) AS votes
        |  FROM toks t2 JOIN lex l ON t2.tok = l.tok
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, lex_lang AS pred_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |               ORDER BY votes DESC, lex_lang ASC) AS rk FROM votes)
        |  WHERE rk = 1),
        |lines AS (
        |  SELECT doc_id, i.x AS pos,
        |    array_to_string(w[(i.x-1)*4 + 1 : (i.x-1)*4 + 4], ' ') AS line
        |  FROM gw,
        |    LATERAL (SELECT unnest(range(1, (len(w) + 3) // 4 + 1)) AS x) i),
        |occ AS (SELECT line, count(*) AS n_occ FROM lines GROUP BY 1),
        |ls AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_lines
        |  FROM lines JOIN occ USING (line) GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.source, g.n_words, g.sum_wlen,
        |  g.n_stop, g.top_chars, g.gopher_keep, c.n_tok, c.score,
        |  coalesce(p.pred_lang, 'und') AS pred_lang,
        |  CAST(CASE WHEN coalesce(p.pred_lang, 'und') = d.lang
        |       THEN 1 ELSE 0 END AS INT) AS lang_agree,
        |  ls.n_lines, ls.n_dup_lines
        |FROM documents d
        |JOIN gop g USING (doc_id)
        |JOIN cls c USING (doc_id)
        |LEFT JOIN pred p USING (doc_id)
        |JOIN ls USING (doc_id)""".stripMargin,
    // gopher gate (d33's CTEs) → min-id exact dedup → d28's classifier
    // → histogram-derived 75th-percentile threshold (cum·4 ≥ total·3,
    // the same BIGINT cross-multiply) → per-(lang, source) accounting
    "pipe_dclm_corpus" ->
      """WITH gw AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w
        |  FROM documents),
        |gp AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(strlen(text) - len(w) + 1 AS BIGINT) AS sum_wlen,
        |    CAST(len(list_intersect(w,
        |      ['the','a','of','to','and','in','is','be'])) AS BIGINT)
        |      AS n_stop
        |  FROM gw),
        |gt AS (
        |  SELECT doc_id, CAST(max(c * strlen(tok)) AS BIGINT) AS top_chars
        |  FROM (SELECT doc_id, tok, count(*) AS c FROM (
        |          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM documents) GROUP BY 1, 2)
        |  GROUP BY 1),
        |gk AS (
        |  SELECT gp.doc_id FROM gp JOIN gt USING (doc_id)
        |  WHERE n_words BETWEEN 50 AND 100000
        |    AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words
        |    AND n_stop >= 2 AND 5 * top_chars <= sum_wlen),
        |surv0 AS (
        |  SELECT d.doc_id, d.lang, d.source, d.text
        |  FROM documents d JOIN gk USING (doc_id)),
        |surv AS (
        |  SELECT * FROM surv0
        |  UNION ALL
        |  SELECT doc_id - 1000000, lang, 'mirror', text
        |  FROM surv0 WHERE doc_id % 9 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id FROM surv GROUP BY text),
        |dd AS (SELECT s.* FROM surv s JOIN keep USING (doc_id)),
        |wt AS (SELECT b, (b * 37) % 101 - 50 AS wt
        |       FROM (SELECT unnest(range(0, 256)) AS b)),
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM dd),
        |tb AS (SELECT doc_id,
        |    (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS b
        |  FROM t),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |         CAST(sum(wt.wt) AS BIGINT) AS score
        |       FROM tb JOIN wt USING (b) GROUP BY doc_id),
        |hist AS (SELECT score, count(*) AS n FROM sc GROUP BY 1),
        |cums AS (SELECT score, sum(n) OVER (ORDER BY score) AS cum,
        |           sum(n) OVER () AS total FROM hist),
        |thr AS (SELECT min(score) AS thr FROM cums
        |        WHERE cum * 4 >= total * 3)
        |SELECT d.lang, d.source, count(*) AS n_docs,
        |  CAST(sum(s.n_tok) AS BIGINT) AS sum_tok
        |FROM sc s
        |JOIN dd d ON d.doc_id = s.doc_id
        |CROSS JOIN thr
        |WHERE s.score >= thr.thr
        |GROUP BY 1, 2""".stripMargin,
    "pipe_fineweb_corpus" ->
      """WITH k0 AS (
        |  SELECT doc_id, lang, source, text FROM documents
        |  WHERE (doc_id % 250) % 7 NOT IN (3, 5)),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id % 250 ORDER BY doc_id) AS rn FROM k0),
        |kept AS (SELECT doc_id, lang, source, text FROM ranked WHERE rn = 1),
        |toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM kept),
        |freq AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
        |lex AS (
        |  SELECT lang AS lex_lang, tok FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lang
        |               ORDER BY n DESC, tok ASC) AS rk FROM freq)
        |  WHERE rk <= 10),
        |votes AS (
        |  SELECT t.doc_id, l.lex_lang, count(*) AS votes
        |  FROM toks t JOIN lex l ON t.tok = l.tok
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, lex_lang AS pred_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |               ORDER BY votes DESC, lex_lang ASC) AS rk FROM votes)
        |  WHERE rk = 1),
        |gw AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM kept),
        |gp AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(strlen(text) - len(w) + 1 AS BIGINT) AS sum_wlen,
        |    CAST(len(list_intersect(w,
        |      ['the','a','of','to','and','in','is','be'])) AS BIGINT) AS n_stop
        |  FROM gw),
        |gt AS (
        |  SELECT doc_id, CAST(max(c * strlen(tok)) AS BIGINT) AS top_chars
        |  FROM (SELECT doc_id, tok, count(*) AS c FROM (
        |          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM kept) GROUP BY 1, 2)
        |  GROUP BY 1),
        |gk AS (
        |  SELECT gp.doc_id FROM gp JOIN gt USING (doc_id)
        |  WHERE n_words BETWEEN 50 AND 100000
        |    AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words
        |    AND n_stop >= 2 AND 5 * top_chars <= sum_wlen)
        |SELECT k.lang, k.source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(k.text, ' '))) AS BIGINT) AS sum_words
        |FROM kept k
        |JOIN pred p ON p.doc_id = k.doc_id AND k.lang = p.pred_lang
        |JOIN gk ON gk.doc_id = k.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "pipe_c4_corpus" ->
      """WITH w AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS ws
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, i.x AS pos,
        |    array_to_string(ws[(i.x-1)*4 + 1 : (i.x-1)*4 + 4], ' ') AS line
        |  FROM w, LATERAL (SELECT unnest(range(1, (len(ws) + 3) // 4 + 1)) AS x) i),
        |ranked AS (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn,
        |    count(*) OVER (PARTITION BY line) AS n_occ
        |  FROM lines),
        |doc2 AS (
        |  SELECT doc_id,
        |    array_to_string(list(line ORDER BY pos), ' ') AS text,
        |    count(*) AS n_kept
        |  FROM ranked WHERE n_occ = 1 OR rn = 1 GROUP BY 1),
        |nl AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1),
        |floored AS (
        |  SELECT w.doc_id, w.lang, w.source, d2.text,
        |    nl.n_lines - d2.n_kept AS n_removed
        |  FROM w JOIN nl USING (doc_id) JOIN doc2 d2 ON d2.doc_id = w.doc_id
        |  WHERE d2.n_kept >= 3),
        |toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM floored),
        |freq AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
        |lex AS (
        |  SELECT lang AS lex_lang, tok FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lang
        |               ORDER BY n DESC, tok ASC) AS rk FROM freq)
        |  WHERE rk <= 10),
        |votes AS (
        |  SELECT t.doc_id, l.lex_lang, count(*) AS votes
        |  FROM toks t JOIN lex l ON t.tok = l.tok
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, lex_lang AS pred_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |               ORDER BY votes DESC, lex_lang ASC) AS rk FROM votes)
        |  WHERE rk = 1)
        |SELECT f.lang, f.source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(f.text, ' '))) AS BIGINT) AS sum_words,
        |  CAST(sum(f.n_removed) AS BIGINT) AS lines_removed
        |FROM floored f JOIN pred p
        |  ON f.doc_id = p.doc_id AND f.lang = p.pred_lang
        |GROUP BY 1, 2""".stripMargin,
    // the Dolma chain replayed stage for stage: plant → lexicon-vote
    // langid → the d10 redaction chain → 8-word paragraph rank-dedup →
    // ≥3-paragraph floor → mirror union → md5-keyed exact dedup
    "pipe_dolma_corpus" ->
      """WITH corpus AS (
        |  SELECT doc_id, lang, source,
        |    CASE WHEN doc_id % 17 = 0
        |      THEN text || ' contact bob@example.org or 555-123-4567 from 10.0.0.1'
        |      ELSE text END AS text
        |  FROM documents),
        |toks0 AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |          FROM corpus),
        |freq AS (SELECT lang, tok, count(*) AS n FROM toks0 GROUP BY 1, 2),
        |lex AS (
        |  SELECT lang AS lex_lang, tok FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lang
        |               ORDER BY n DESC, tok ASC) AS rk FROM freq)
        |  WHERE rk <= 10),
        |votes AS (
        |  SELECT t.doc_id, l.lex_lang, count(*) AS votes
        |  FROM toks0 t JOIN lex l ON t.tok = l.tok
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, lex_lang AS pred_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |               ORDER BY votes DESC, lex_lang ASC) AS rk FROM votes)
        |  WHERE rk = 1),
        |gated AS (
        |  SELECT c.doc_id, c.lang, c.source, c.text
        |  FROM corpus c JOIN pred p
        |    ON p.doc_id = c.doc_id AND p.pred_lang = c.lang),
        |r1 AS (
        |  SELECT doc_id, lang, source,
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c
        |  FROM gated),
        |r2 AS (
        |  SELECT doc_id, lang, source,
        |    regexp_replace(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t,
        |    c + len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS c
        |  FROM r1),
        |r3 AS (
        |  SELECT doc_id, lang, source,
        |    regexp_replace(t,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text,
        |    c + len(regexp_extract_all(t,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_red
        |  FROM r2),
        |w AS (SELECT doc_id, lang, source, n_red,
        |        string_split(text, ' ') AS ws FROM r3),
        |paras AS (
        |  SELECT doc_id, i.x AS pos,
        |    array_to_string(ws[(i.x-1)*8 + 1 : (i.x-1)*8 + 8], ' ') AS para
        |  FROM w, LATERAL (SELECT unnest(range(1, (len(ws) + 7) // 8 + 1)) AS x) i),
        |ranked AS (
        |  SELECT doc_id, pos, para,
        |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn,
        |    count(*) OVER (PARTITION BY para) AS n_occ
        |  FROM paras),
        |doc2 AS (
        |  SELECT doc_id,
        |    array_to_string(list(para ORDER BY pos), ' ') AS text,
        |    count(*) AS n_kept
        |  FROM ranked WHERE n_occ = 1 OR rn = 1 GROUP BY 1),
        |nl AS (SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY 1),
        |flo AS (
        |  SELECT w.doc_id, w.lang, w.source, w.n_red, d2.text,
        |    nl.n_paras - d2.n_kept AS n_removed
        |  FROM w JOIN nl USING (doc_id) JOIN doc2 d2 ON d2.doc_id = w.doc_id
        |  WHERE d2.n_kept >= 3),
        |wm AS (
        |  SELECT * FROM flo
        |  UNION ALL
        |  SELECT doc_id - 2000000, lang, 'mirror', n_red, text, n_removed
        |  FROM flo WHERE doc_id % 13 = 0),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM wm GROUP BY md5(text)),
        |dd AS (SELECT wm.* FROM wm SEMI JOIN keep USING (doc_id))
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
        |  CAST(sum(n_removed) AS BIGINT) AS paras_removed,
        |  CAST(sum(n_red) AS BIGINT) AS sum_redactions
        |FROM dd GROUP BY 1, 2""".stripMargin,
    // C4 line dedup replayed by window rank over the same 4-word
    // chunking; new_text rebuilt positionally (empty-list
    // array_to_string is NULL in DuckDB where Spark's array_join is
    // '' — coalesced, the d29 convention)
    "d31_line_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |lines AS (
        |  SELECT doc_id, i.x AS pos,
        |    array_to_string(ws[(i.x-1)*4 + 1 : (i.x-1)*4 + 4], ' ') AS line
        |  FROM w, LATERAL (SELECT unnest(range(1, (len(ws) + 3) // 4 + 1)) AS x) i),
        |ranked AS (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn,
        |    count(*) OVER (PARTITION BY line) AS n_occ
        |  FROM lines),
        |rm AS (
        |  SELECT doc_id, list(pos) AS rmp
        |  FROM ranked WHERE n_occ > 1 AND rn > 1 GROUP BY doc_id),
        |ll AS (
        |  SELECT doc_id, list(line ORDER BY pos) AS lls
        |  FROM lines GROUP BY doc_id)
        |SELECT ll.doc_id,
        |  CAST(len(ll.lls) AS BIGINT) AS n_lines,
        |  CAST(len(rm.rmp) AS BIGINT) AS n_removed,
        |  coalesce(array_to_string(
        |    [ll.lls[i] FOR i IN range(1, len(ll.lls) + 1)
        |     IF NOT list_contains(rm.rmp, i)], chr(10)), '') AS new_text
        |FROM ll JOIN rm USING (doc_id)""".stripMargin,
    // explode-join replay of the packed-array fold: same md5-prefix
    // bucket (nibble-decoded), same arithmetic weight table
    "d28_quality_classifier" ->
      """WITH w AS (
        |  SELECT b, (b * 37) % 101 - 50 AS wt
        |  FROM (SELECT unnest(range(0, 256)) AS b)),
        |t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id,
        |    (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS b
        |  FROM t)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(w.wt) AS BIGINT) AS score,
        |  (sum(w.wt) >= 0) AS keep
        |FROM tb JOIN w USING (b)
        |GROUP BY doc_id""".stripMargin,
    // the capstone: sims with twins planted BELOW (real docs drop),
    // anti-join into documents, token floor, d8's pack-window replay
    "pipe_semdedup_corpus" -> (
      semDedupCtes("- 1000000") +
      """,
        |dropped AS (SELECT DISTINCT b_id AS doc_id FROM sims WHERE b_id >= 0),
        |kept AS (
        |  SELECT d.source, d.doc_id,
        |    len(string_split(d.text, ' ')) AS n_tok
        |  FROM documents d LEFT JOIN dropped x ON d.doc_id = x.doc_id
        |  WHERE x.doc_id IS NULL
        |    AND len(string_split(d.text, ' ')) >= 5),
        |cums AS (
        |  SELECT source, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |                     ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM kept)
        |SELECT source, doc_id, CAST(n_tok AS INT) AS n_tokens,
        |  CAST(floor((cum - n_tok) / 1024.0) AS INT) AS pack_id,
        |  CAST((cum - n_tok) % 1024 AS INT) AS pos
        |FROM cums""".stripMargin),
    // SemDeDup replay: the planted corpus quantized to the grid, the
    // d3_ivf_trained two-Lloyd CTEs (seeds = 8 lowest ids, no holdout),
    // a THIRD assignment against the final INTEGER codebook (no double
    // conversion — the compare stays pure BIGINT), then within-cluster
    // cosine pairs and the greedy-by-id drop rule
    "d23_semdedup" -> (
      semDedupCtes("+ 1000000") +
      """
        |SELECT s.b_id AS vec_id, max(a.cid) AS cid, min(s.a_id) AS kept_id,
        |  min_by(s.cs, s.a_id) AS cos_sim
        |FROM sims s JOIN a3 a ON a.vec_id = s.b_id
        |GROUP BY s.b_id""".stripMargin),
    "d34_knn_graph" -> knnGraphSql,
    "d3_cosine_topk" -> (
      cosPairSql(
        """WITH pairs AS (
          |  SELECT e.vec_id AS a_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS va,
          |         q.vec_id AS b_id, list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS vb
          |  FROM embeddings e, embeddings q
          |  WHERE q.vec_id = 0 AND e.vec_id != 0)""".stripMargin) +
      """
        |SELECT vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a_id AS vec_id, round(dot / (na * nb), 6) AS cos_sim,
        |    row_number() OVER (ORDER BY round(dot / (na * nb), 6) DESC, a_id ASC) AS rank
        |  FROM dots)
        |WHERE rank <= 10""".stripMargin),
    "d3_ann_lsh" -> (
      cosPairSql(
        """WITH bucketed AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
          |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END +
          |     CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END +
          |     CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END +
          |     CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
          |  FROM embeddings),
          |pairs AS (
          |  SELECT e.vec_id AS a_id, e.v AS va, q.vec_id AS b_id, q.v AS vb
          |  FROM bucketed e, bucketed q
          |  WHERE q.vec_id = 0 AND e.vec_id != 0 AND e.bucket = q.bucket)""".stripMargin) +
      """
        |SELECT vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a_id AS vec_id, round(dot / (na * nb), 6) AS cos_sim,
        |    row_number() OVER (ORDER BY round(dot / (na * nb), 6) DESC, a_id ASC) AS rank
        |  FROM dots)
        |WHERE rank <= 5""".stripMargin),
    "d3_ivf_topk" ->
      """WITH corp AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id != 0),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM corp
        |  WHERE vec_id % greatest(31, (SELECT count(*) FROM corp) // 256) = 0),
        |centb AS (
        |  SELECT cid, cv,
        |    (CASE WHEN cv[1] > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN cv[2] > 0 THEN 2 ELSE 0 END +
        |     CASE WHEN cv[3] > 0 THEN 4 ELSE 0 END +
        |     CASE WHEN cv[4] > 0 THEN 8 ELSE 0 END) AS cbucket
        |  FROM cents),
        |corpb AS (
        |  SELECT vec_id, v,
        |    (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN v[2] > 0 THEN 2 ELSE 0 END +
        |     CASE WHEN v[3] > 0 THEN 4 ELSE 0 END +
        |     CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS bucket
        |  FROM corp),
        |cand AS (
        |  SELECT c.vec_id, c.v, t.cid, t.cv
        |  FROM corpb c JOIN centb t ON c.bucket = t.cbucket
        |  UNION ALL
        |  SELECT c.vec_id, c.v, t.cid, t.cv
        |  FROM corpb c, centb t
        |  WHERE c.bucket NOT IN (SELECT cbucket FROM centb)),
        |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |      FROM embeddings WHERE vec_id = 0),
        |ac AS (
        |  SELECT c.vec_id, c.cid,
        |    round(sum(c.v[i.x] * c.cv[i.x]) /
        |      (sqrt(sum(c.v[i.x] * c.v[i.x])) * sqrt(sum(c.cv[i.x] * c.cv[i.x]))), 6) AS cs
        |  FROM cand c, LATERAL (SELECT unnest(range(1, len(c.v) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
        |    FROM ac)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT cid FROM (
        |    SELECT t.cid,
        |      round(sum(t.cv[i.x] * q.qv[i.x]) /
        |        (sqrt(sum(t.cv[i.x] * t.cv[i.x])) * sqrt(sum(q.qv[i.x] * q.qv[i.x]))), 6) AS cs
        |    FROM cents t, q, LATERAL (SELECT unnest(range(1, len(t.cv) + 1)) AS x) i
        |    GROUP BY 1)
        |  ORDER BY cs DESC, cid ASC LIMIT 2),
        |scored AS (
        |  SELECT c.vec_id,
        |    round(sum(c.v[i.x] * q.qv[i.x]) /
        |      (sqrt(sum(c.v[i.x] * c.v[i.x])) * sqrt(sum(q.qv[i.x] * q.qv[i.x]))), 6) AS cos_sim
        |  FROM corp c
        |  JOIN assigned a ON a.vec_id = c.vec_id
        |  JOIN probes p ON a.cid = p.cid, q,
        |  LATERAL (SELECT unnest(range(1, len(c.v) + 1)) AS x) i
        |  GROUP BY 1)
        |SELECT vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT vec_id, cos_sim,
        |    row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // the trained-IVF replay: two Lloyd iterations (the d12_kmeans2
    // CTEs, over the corpus with the query vector held out, seeds = the
    // 8 lowest vec_ids) reduced to an integer-grid codebook, divided by
    // 2^20 (exact) into the SAME probe pipeline as d3_ivf_topk. Written
    // dim-agnostically: every position range derives from len(arr).
    "d3_ivf_trained" ->
      """WITH corp AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id != 0),
        |seeds0 AS (
        |  SELECT vec_id AS cid, qv AS cv FROM corp ORDER BY vec_id LIMIT 8),
        |d1 AS (
        |  SELECT t.vec_id, s.cid,
        |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM corp t, seeds0 s,
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |c1 AS (
        |  SELECT a1.cid, i.x AS pos, sum(t.qv[i.x]) // count(*) AS cc
        |  FROM a1 JOIN corp t USING (vec_id),
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |seeds1 AS (SELECT cid, list(cc ORDER BY pos) AS cv FROM c1 GROUP BY 1),
        |d2 AS (
        |  SELECT t.vec_id, s.cid,
        |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM corp t, seeds1 s,
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d2) WHERE rn = 1),
        |c2 AS (
        |  SELECT a2.cid, i.x AS pos, sum(t.qv[i.x]) // count(*) AS cc
        |  FROM a2 JOIN corp t USING (vec_id),
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |cents AS (
        |  SELECT cid, list_transform(list(cc ORDER BY pos),
        |                             c -> CAST(c AS DOUBLE) / 1048576.0) AS cv
        |  FROM c2 GROUP BY cid),
        |centb AS (
        |  SELECT cid, cv,
        |    (CASE WHEN cv[1] > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN cv[2] > 0 THEN 2 ELSE 0 END +
        |     CASE WHEN cv[3] > 0 THEN 4 ELSE 0 END +
        |     CASE WHEN cv[4] > 0 THEN 8 ELSE 0 END) AS cbucket
        |  FROM cents),
        |corpb AS (
        |  SELECT vec_id, v,
        |    (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN v[2] > 0 THEN 2 ELSE 0 END +
        |     CASE WHEN v[3] > 0 THEN 4 ELSE 0 END +
        |     CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS bucket
        |  FROM corp),
        |cand AS (
        |  SELECT c.vec_id, c.v, t.cid, t.cv
        |  FROM corpb c JOIN centb t ON c.bucket = t.cbucket
        |  UNION ALL
        |  SELECT c.vec_id, c.v, t.cid, t.cv
        |  FROM corpb c, centb t
        |  WHERE c.bucket NOT IN (SELECT cbucket FROM centb)),
        |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |      FROM embeddings WHERE vec_id = 0),
        |ac AS (
        |  SELECT c.vec_id, c.cid,
        |    round(sum(c.v[i.x] * c.cv[i.x]) /
        |      (sqrt(sum(c.v[i.x] * c.v[i.x])) * sqrt(sum(c.cv[i.x] * c.cv[i.x]))), 6) AS cs
        |  FROM cand c, LATERAL (SELECT unnest(range(1, len(c.v) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
        |    FROM ac)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT cid FROM (
        |    SELECT t.cid,
        |      round(sum(t.cv[i.x] * q.qv[i.x]) /
        |        (sqrt(sum(t.cv[i.x] * t.cv[i.x])) * sqrt(sum(q.qv[i.x] * q.qv[i.x]))), 6) AS cs
        |    FROM cents t, q, LATERAL (SELECT unnest(range(1, len(t.cv) + 1)) AS x) i
        |    GROUP BY 1)
        |  ORDER BY cs DESC, cid ASC LIMIT 2),
        |scored AS (
        |  SELECT c.vec_id,
        |    round(sum(c.v[i.x] * q.qv[i.x]) /
        |      (sqrt(sum(c.v[i.x] * c.v[i.x])) * sqrt(sum(q.qv[i.x] * q.qv[i.x]))), 6) AS cos_sim
        |  FROM corp c
        |  JOIN assigned a ON a.vec_id = c.vec_id
        |  JOIN probes p ON a.cid = p.cid, q,
        |  LATERAL (SELECT unnest(range(1, len(c.v) + 1)) AS x) i
        |  GROUP BY 1)
        |SELECT vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT vec_id, cos_sim,
        |    row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // PQ/ADC replay: 8 subspaces via list slices, stride-31 subspace
    // codebook, per-(vector, subspace) argmin code, query distance
    // table, approximate distance = sum of table lookups — all exact
    // integers on the 2^20 grid, dim-agnostic (subdim = len // 8)
    // stage 1 replays the SQ8 integer pool cut, stage 2 the exact
    // cosine rerank — both stages' tie-breaks by id
    "d37_rerank_topk" ->
      """WITH g0 AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS g
        |  FROM embeddings),
        |m0 AS (SELECT vec_id, g,
        |        list_max(list_transform(g, x -> abs(x))) AS m
        |       FROM g0),
        |c0 AS (SELECT vec_id,
        |        list_transform(g, x -> CASE WHEN x >= 0
        |          THEN (254 * x + m) // (2 * m)
        |          ELSE -((254 * (-x) + m) // (2 * m)) END) AS q, m
        |       FROM m0 WHERE m > 0),
        |qq AS (SELECT q FROM c0 WHERE vec_id = 0),
        |d AS (
        |  SELECT c.vec_id,
        |    CAST(sum(c.q[i.x] * q0.q[i.x]) AS BIGINT) AS qdot, c.m
        |  FROM c0 c, qq q0,
        |    LATERAL (SELECT unnest(range(1, len(c.q) + 1)) AS x) i
        |  WHERE c.vec_id != 0
        |  GROUP BY c.vec_id, c.m),
        |pool AS (SELECT vec_id FROM (
        |  SELECT vec_id,
        |    row_number() OVER (ORDER BY qdot * m DESC, vec_id) AS rank
        |  FROM d) WHERE rank <= 50),
        |pairs AS (
        |  SELECT e.vec_id AS a_id,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS va,
        |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS vb
        |  FROM embeddings e JOIN pool p ON e.vec_id = p.vec_id,
        |    embeddings q
        |  WHERE q.vec_id = 0),
        |dots AS (
        |  SELECT a_id,
        |    sum(va[i.x] * vb[i.x]) AS dot,
        |    sqrt(sum(va[i.x] * va[i.x])) AS na,
        |    sqrt(sum(vb[i.x] * vb[i.x])) AS nb
        |  FROM pairs, LATERAL (SELECT unnest(range(1, len(va) + 1)) AS x) i
        |  GROUP BY 1)
        |SELECT vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a_id AS vec_id, round(dot / (na * nb), 6) AS cos_sim,
        |    row_number() OVER (ORDER BY round(dot / (na * nb), 6) DESC,
        |      a_id ASC) AS rank
        |  FROM dots)
        |WHERE rank <= 5""".stripMargin,
    // one corpus pass scores the whole broadcast query batch; the
    // per-query rank window partitions by q_id
    "d38_batch_topk" ->
      """WITH corp AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id % 50 != 0),
        |qs AS (
        |  SELECT vec_id AS q_id, list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)) AS q
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |dots AS (
        |  SELECT c.vec_id, qs.q_id,
        |    sum(c.v[i.x] * qs.q[i.x]) AS dot,
        |    sqrt(sum(c.v[i.x] * c.v[i.x])) AS na,
        |    sqrt(sum(qs.q[i.x] * qs.q[i.x])) AS nb
        |  FROM corp c, qs,
        |    LATERAL (SELECT unnest(range(1, len(c.v) + 1)) AS x) i
        |  GROUP BY 1, 2)
        |SELECT q_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT q_id, vec_id, round(dot / (na * nb), 6) AS cos_sim,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(dot / (na * nb), 6) DESC, vec_id ASC) AS rank
        |  FROM dots)
        |WHERE rank <= 3""".stripMargin,
    // the same grid-snap → per-vector max-abs scale → BIGINT
    // round-half-up codes → int dot × candidate scale; every integer
    // op written once, identically, in both engines
    "d36_sq8_topk" ->
      """WITH g0 AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS g
        |  FROM embeddings),
        |m0 AS (SELECT vec_id, g,
        |        list_max(list_transform(g, x -> abs(x))) AS m
        |       FROM g0),
        |c0 AS (SELECT vec_id,
        |        list_transform(g, x -> CASE WHEN x >= 0
        |          THEN (254 * x + m) // (2 * m)
        |          ELSE -((254 * (-x) + m) // (2 * m)) END) AS q, m
        |       FROM m0 WHERE m > 0),
        |qq AS (SELECT q FROM c0 WHERE vec_id = 0),
        |d AS (
        |  SELECT c.vec_id,
        |    CAST(sum(c.q[i.x] * q0.q[i.x]) AS BIGINT) AS qdot, c.m
        |  FROM c0 c, qq q0,
        |    LATERAL (SELECT unnest(range(1, len(c.q) + 1)) AS x) i
        |  WHERE c.vec_id != 0
        |  GROUP BY c.vec_id, c.m)
        |SELECT vec_id, qdot, score_key, CAST(rank AS INT) AS rank FROM (
        |  SELECT vec_id, qdot, qdot * m AS score_key,
        |    row_number() OVER (ORDER BY qdot * m DESC, vec_id) AS rank
        |  FROM d)
        |WHERE rank <= 10""".stripMargin,
    "d16_pq_topk" ->
      """WITH corp AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |cs AS (
        |  SELECT vec_id, j.j AS j,
        |    qv[(j.j * (len(qv) // 8) + 1):((j.j + 1) * (len(qv) // 8))] AS subv
        |  FROM corp, LATERAL (SELECT unnest(range(0, 8)) AS j) j
        |  WHERE vec_id != 0),
        |cents AS (SELECT vec_id AS cid, j, subv FROM cs WHERE vec_id %
        |  greatest(31, (SELECT count(DISTINCT vec_id) FROM cs) // 256) = 0),
        |qs AS (
        |  SELECT j.j AS j,
        |    qv[(j.j * (len(qv) // 8) + 1):((j.j + 1) * (len(qv) // 8))] AS qsub
        |  FROM corp, LATERAL (SELECT unnest(range(0, 8)) AS j) j
        |  WHERE vec_id = 0),
        |cd AS (
        |  SELECT c.vec_id, c.j, t.cid,
        |    sum((c.subv[i.x] - t.subv[i.x]) * (c.subv[i.x] - t.subv[i.x])) AS d
        |  FROM cs c JOIN cents t ON c.j = t.j,
        |       LATERAL (SELECT unnest(range(1, len(c.subv) + 1)) AS x) i
        |  GROUP BY 1, 2, 3),
        |codes AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT vec_id, j, cid,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
        |    FROM cd) WHERE rn = 1),
        |dt AS (
        |  SELECT t.j, t.cid,
        |    sum((q.qsub[i.x] - t.subv[i.x]) * (q.qsub[i.x] - t.subv[i.x])) AS dq
        |  FROM cents t JOIN qs q ON t.j = q.j,
        |       LATERAL (SELECT unnest(range(1, len(t.subv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT c.vec_id, CAST(sum(d.dq) AS BIGINT) AS approx
        |  FROM codes c JOIN dt d ON c.j = d.j AND c.code = d.cid
        |  GROUP BY 1)
        |SELECT vec_id, approx, CAST(rank AS INT) AS rank FROM (
        |  SELECT vec_id, approx,
        |    row_number() OVER (ORDER BY approx ASC, vec_id ASC) AS rank
        |  FROM sc)
        |WHERE rank <= 5""".stripMargin,
    // IVF-PQ replay: coarse two-Lloyd (d3_ivf_trained's CTEs, kept on
    // the integer grid — routing is integer L2 here, not cosine), route
    // = per-vector argmin over the trained coarse centroids, subspace
    // two-Lloyd GROUPED by j (16 seeds per subspace via a window),
    // codes = per-(vector, subspace) argmin, ADC table from the query's
    // subvectors, approx = sum of lookups over vectors routed to the 2
    // probed lists. Dim-agnostic: subdim = len // 8, positions from len.
    "d3_ivfpq_topk" ->
      """WITH corp AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id != 0),
        |q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |seeds0 AS (
        |  SELECT vec_id AS cid, qv AS cv FROM corp
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        |d1 AS (
        |  SELECT t.vec_id, s.cid,
        |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM corp t, seeds0 s,
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |c1 AS (
        |  SELECT a1.cid, i.x AS pos, sum(t.qv[i.x]) // count(*) AS cc
        |  FROM a1 JOIN corp t USING (vec_id),
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |seeds1 AS (SELECT cid, list(cc ORDER BY pos) AS cv FROM c1 GROUP BY 1),
        |d2 AS (
        |  SELECT t.vec_id, s.cid,
        |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM corp t, seeds1 s,
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d2) WHERE rn = 1),
        |c2 AS (
        |  SELECT a2.cid, i.x AS pos, sum(t.qv[i.x]) // count(*) AS cc
        |  FROM a2 JOIN corp t USING (vec_id),
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |coarse AS (SELECT cid, list(cc ORDER BY pos) AS cv FROM c2 GROUP BY 1),
        |rd AS (
        |  SELECT t.vec_id, s.cid,
        |         sum((t.qv[i.x] - s.cv[i.x]) * (t.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM corp t, coarse s,
        |       LATERAL (SELECT unnest(range(1, len(t.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |routed AS (
        |  SELECT vec_id, cid AS ccid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM rd) WHERE rn = 1),
        |probes AS (
        |  SELECT cid FROM (
        |    SELECT s.cid,
        |      sum((q.qv[i.x] - s.cv[i.x]) * (q.qv[i.x] - s.cv[i.x])) AS dist
        |    FROM coarse s, q,
        |         LATERAL (SELECT unnest(range(1, len(s.cv) + 1)) AS x) i
        |    GROUP BY 1)
        |  ORDER BY dist, cid LIMIT 2),
        |subs AS (
        |  SELECT vec_id, j.j AS j,
        |    qv[(j.j * (len(qv) // 8) + 1):((j.j + 1) * (len(qv) // 8))] AS sv
        |  FROM corp, LATERAL (SELECT unnest(range(0, 8)) AS j) j),
        |sseeds0 AS (
        |  SELECT j, vec_id AS cid, sv AS cv FROM (
        |    SELECT j, vec_id, sv,
        |      row_number() OVER (PARTITION BY j ORDER BY vec_id) AS rn
        |    FROM subs) WHERE rn <= 16),
        |sd1 AS (
        |  SELECT t.j, t.vec_id, s.cid,
        |         sum((t.sv[i.x] - s.cv[i.x]) * (t.sv[i.x] - s.cv[i.x])) AS dist
        |  FROM subs t JOIN sseeds0 s ON t.j = s.j,
        |       LATERAL (SELECT unnest(range(1, len(t.sv) + 1)) AS x) i
        |  GROUP BY 1, 2, 3),
        |sa1 AS (
        |  SELECT j, vec_id, cid FROM (
        |    SELECT j, vec_id, cid,
        |      row_number() OVER (PARTITION BY j, vec_id ORDER BY dist, cid) AS rn
        |    FROM sd1) WHERE rn = 1),
        |sc1 AS (
        |  SELECT a.j, a.cid, i.x AS pos, sum(t.sv[i.x]) // count(*) AS cc
        |  FROM sa1 a JOIN subs t ON a.j = t.j AND a.vec_id = t.vec_id,
        |       LATERAL (SELECT unnest(range(1, len(t.sv) + 1)) AS x) i
        |  GROUP BY 1, 2, 3),
        |sseeds1 AS (
        |  SELECT j, cid, list(cc ORDER BY pos) AS cv FROM sc1 GROUP BY 1, 2),
        |sd2 AS (
        |  SELECT t.j, t.vec_id, s.cid,
        |         sum((t.sv[i.x] - s.cv[i.x]) * (t.sv[i.x] - s.cv[i.x])) AS dist
        |  FROM subs t JOIN sseeds1 s ON t.j = s.j,
        |       LATERAL (SELECT unnest(range(1, len(t.sv) + 1)) AS x) i
        |  GROUP BY 1, 2, 3),
        |sa2 AS (
        |  SELECT j, vec_id, cid FROM (
        |    SELECT j, vec_id, cid,
        |      row_number() OVER (PARTITION BY j, vec_id ORDER BY dist, cid) AS rn
        |    FROM sd2) WHERE rn = 1),
        |sc2 AS (
        |  SELECT a.j, a.cid, i.x AS pos, sum(t.sv[i.x]) // count(*) AS cc
        |  FROM sa2 a JOIN subs t ON a.j = t.j AND a.vec_id = t.vec_id,
        |       LATERAL (SELECT unnest(range(1, len(t.sv) + 1)) AS x) i
        |  GROUP BY 1, 2, 3),
        |sb AS (
        |  SELECT j, cid, list(cc ORDER BY pos) AS cv FROM sc2 GROUP BY 1, 2),
        |cdist AS (
        |  SELECT t.vec_id, t.j, s.cid,
        |         sum((t.sv[i.x] - s.cv[i.x]) * (t.sv[i.x] - s.cv[i.x])) AS d
        |  FROM subs t JOIN sb s ON t.j = s.j,
        |       LATERAL (SELECT unnest(range(1, len(t.sv) + 1)) AS x) i
        |  GROUP BY 1, 2, 3),
        |codes AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT vec_id, j, cid,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
        |    FROM cdist) WHERE rn = 1),
        |qs AS (
        |  SELECT j.j AS j,
        |    qv[(j.j * (len(qv) // 8) + 1):((j.j + 1) * (len(qv) // 8))] AS qsub
        |  FROM q, LATERAL (SELECT unnest(range(0, 8)) AS j) j),
        |dt AS (
        |  SELECT s.j, s.cid,
        |         sum((qs.qsub[i.x] - s.cv[i.x]) * (qs.qsub[i.x] - s.cv[i.x])) AS dq
        |  FROM sb s JOIN qs ON s.j = qs.j,
        |       LATERAL (SELECT unnest(range(1, len(s.cv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT c.vec_id, CAST(sum(d.dq) AS BIGINT) AS approx
        |  FROM codes c
        |  JOIN routed r ON c.vec_id = r.vec_id
        |  JOIN probes p ON r.ccid = p.cid
        |  JOIN dt d ON c.j = d.j AND c.code = d.cid
        |  GROUP BY 1)
        |SELECT vec_id, approx, CAST(rank AS INT) AS rank FROM (
        |  SELECT vec_id, approx,
        |    row_number() OVER (ORDER BY approx ASC, vec_id ASC) AS rank
        |  FROM sc)
        |WHERE rank <= 5""".stripMargin,
    // heavy hitters: the two-pass output is exactly "tokens with count
    // strictly above n/(k+1)" — the sketch only bounds WHICH candidates
    // get recounted, so the oracle is the plain exact formulation
    "a15_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |t AS (SELECT tok FROM toks WHERE length(tok) >= 1),
        |tot AS (SELECT count(*) AS n FROM t)
        |SELECT tok, count(*) AS cnt
        |FROM t, tot GROUP BY tok, tot.n
        |HAVING count(*) * 33 > tot.n""".stripMargin,
    "d11_vocab_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
        |vocab AS (SELECT tok FROM freq ORDER BY n DESC, tok ASC LIMIT 16),
        |j AS (
        |  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
        |SELECT doc_id, count(*) AS n_tok,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
        |FROM j GROUP BY 1""".stripMargin,
    "d4_top_tokens" ->
      """SELECT tok, n FROM (
        |  SELECT tok, count(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1)
        |ORDER BY n DESC, tok ASC LIMIT 20""".stripMargin,
    "d4_tfidf" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM docs),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS nd FROM docs),
        |scored AS (
        |  SELECT doc_id, tf.tok,
        |    round(tf * ln(CAST(nd AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN df ON tf.tok = df.tok, n)
        |SELECT doc_id, tok, tfidf, CAST(rank AS INT) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |             ORDER BY tfidf DESC, tok ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 3""".stripMargin,
    // identical float-op order as the Scala side (idf*num/den*1e6,
    // left-assoc); micro-integer snap BEFORE the per-doc sum, so the
    // sum and ranking are exact BIGINT (the d4_tfidf rounding contract)
    "d32_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS nd, CAST(sum(len) AS BIGINT) AS sumlen FROM lens),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('table', 'scan', 'merge', 'stream') GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |c AS (
        |  SELECT tf.doc_id,
        |    CAST(round(ln(1.0 + (nd - df + 0.5) / (df + 0.5)) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len * nd / sumlen)))
        |      * 1e6) AS BIGINT) AS micro
        |  FROM tf JOIN df USING (tok) JOIN lens USING (doc_id), stats)
        |SELECT doc_id, CAST(sum(micro) AS BIGINT) AS score_micro,
        |  count(*) AS n_terms
        |FROM c GROUP BY 1
        |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin,
    // same integer cross-multiplied rules; Σ|w| via the single-space
    // identity strlen − n + 1 on both sides (no second tokenization)
    "d33_gopher_rules" ->
      """WITH d AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(strlen(text) - len(w) + 1 AS BIGINT) AS sum_wlen,
        |    CAST(len(list_intersect(w,
        |      ['the','a','of','to','and','in','is','be'])) AS BIGINT) AS n_stop
        |  FROM d),
        |t AS (
        |  SELECT doc_id, CAST(max(c * strlen(tok)) AS BIGINT) AS top_chars
        |  FROM (SELECT doc_id, tok, count(*) AS c FROM (
        |          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM documents) GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT doc_id, n_words, sum_wlen, n_stop, top_chars,
        |  CAST(n_words BETWEEN 50 AND 100000 AS INT) AS r_nwords,
        |  CAST(3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words AS INT)
        |    AS r_wlen,
        |  CAST(n_stop >= 2 AS INT) AS r_stop,
        |  CAST(5 * top_chars <= sum_wlen AS INT) AS r_rep,
        |  CAST(n_words BETWEEN 50 AND 100000
        |    AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words
        |    AND n_stop >= 2 AND 5 * top_chars <= sum_wlen AS INT) AS keep
        |FROM p JOIN t USING (doc_id)""".stripMargin,
    "d4_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
        |lex AS (
        |  SELECT lang AS lex_lang, tok FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lang
        |               ORDER BY n DESC, tok ASC) AS rk FROM freq)
        |  WHERE rk <= 10),
        |votes AS (
        |  SELECT t.doc_id, l.lex_lang, count(*) AS votes
        |  FROM toks t JOIN lex l ON t.tok = l.tok
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, lex_lang AS pred_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |               ORDER BY votes DESC, lex_lang ASC) AS rk FROM votes)
        |  WHERE rk = 1)
        |SELECT d.lang AS true_lang, p.pred_lang, count(*) AS n
        |FROM documents d JOIN pred p ON d.doc_id = p.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "d4_fingerprint" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$shingleCtes
         |SELECT doc_id, min(md5(s)) AS fp FROM sh GROUP BY 1""".stripMargin,
    // arithmetic replay THROUGH the resize: output pixel (ox,oy) of the
    // 4x2 result samples source pixel s = oy*16 + ox*2 of the 8x4 rule,
    // weighted by 1 + output position
    "d5_multimodal" ->
      """WITH f AS (
        |  SELECT d.doc_id, d.lang, e.label,
        |    CAST(sum((1 + p.oy * 4 + p.ox) *
        |      (((d.doc_id*31 + (p.oy*16 + p.ox*2)*7)  % 256) +
        |       ((d.doc_id*17 + (p.oy*16 + p.ox*2)*11) % 256) +
        |       ((d.doc_id*13 + (p.oy*16 + p.ox*2)*3)  % 256))) AS BIGINT)
        |      AS feat
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id,
        |    (SELECT x.x AS ox, y.y AS oy
        |     FROM (SELECT unnest(range(0, 4)) AS x) x,
        |          (SELECT unnest(range(0, 2)) AS y) y) p
        |  GROUP BY 1, 2, 3)
        |SELECT lang, label, count(*) AS n,
        |  CAST(sum(feat) AS BIGINT) AS sum_feat
        |FROM f GROUP BY 1, 2""".stripMargin,
    // stride-2 sampling of the 5-frame AVI: original frames 0, 2, 4;
    // 6x2 frames have 12 pixels under the frame-shifted pixel rule
    "d5_frames" ->
      """SELECT d.doc_id, CAST(f.x AS INT) AS frame_idx,
        |  CAST(sum(((d.doc_id*31 + f.x*19 + i.x*7)  % 256) +
        |           ((d.doc_id*17 + f.x*23 + i.x*11) % 256) +
        |           ((d.doc_id*13 + f.x*29 + i.x*3)  % 256)) AS BIGINT)
        |    AS sum_ch,
        |  CAST(sum(i.x * (((d.doc_id*31 + f.x*19 + i.x*7)  % 256) +
        |                  ((d.doc_id*17 + f.x*23 + i.x*11) % 256) +
        |                  ((d.doc_id*13 + f.x*29 + i.x*3)  % 256)))
        |    AS BIGINT) AS wsum_ch
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id,
        |     (SELECT unnest([0, 2, 4]) AS x) f,
        |     (SELECT unnest(range(0, 12)) AS x) i
        |GROUP BY 1, 2""".stripMargin,
    // arithmetic replay of the pixel rule — independent of the JVM
    // encode/decode path; position weight i catches layout misreads
    "d5_decode_bmp" ->
      """SELECT d.doc_id, CAST(32 AS INT) AS n_px,
        |  CAST(sum(((d.doc_id*31 + i.x*7) % 256) +
        |           ((d.doc_id*17 + i.x*11) % 256) +
        |           ((d.doc_id*13 + i.x*3) % 256)) AS BIGINT) AS sum_ch,
        |  CAST(sum(i.x * (((d.doc_id*31 + i.x*7) % 256) +
        |                  ((d.doc_id*17 + i.x*11) % 256) +
        |                  ((d.doc_id*13 + i.x*3) % 256))) AS BIGINT)
        |    AS wsum_ch
        |FROM documents d, (SELECT unnest(range(0, 32)) AS x) i
        |GROUP BY 1""".stripMargin,
    "d5_decode_wav" ->
      """SELECT d.doc_id, CAST(100 AS INT) AS n_samples,
        |  CAST(sum(((d.doc_id*13 + i.x*5) % 65536) - 32768) AS BIGINT)
        |    AS sum_amp,
        |  CAST(sum(i.x * (((d.doc_id*13 + i.x*5) % 65536) - 32768))
        |    AS BIGINT) AS wsum_amp
        |FROM documents d, (SELECT unnest(range(0, 100)) AS x) i
        |GROUP BY 1""".stripMargin,
    "d5_decode_png" ->
      """SELECT d.doc_id, CAST(27 AS INT) AS n_px,
        |  CAST(sum(((d.doc_id*37 + i.x*5)  % 256) +
        |           ((d.doc_id*23 + i.x*13) % 256) +
        |           ((d.doc_id*11 + i.x*17) % 256)) AS BIGINT) AS sum_ch,
        |  CAST(sum(i.x * (((d.doc_id*37 + i.x*5)  % 256) +
        |                  ((d.doc_id*23 + i.x*13) % 256) +
        |                  ((d.doc_id*11 + i.x*17) % 256))) AS BIGINT)
        |    AS wsum_ch
        |FROM documents d, (SELECT unnest(range(0, 27)) AS x) i
        |GROUP BY 1""".stripMargin,
    "d5_frames_avi" ->
      """SELECT d.doc_id, CAST(f.x AS INT) AS frame_idx,
        |  CAST(sum(((d.doc_id*31 + f.x*19 + i.x*7) % 256) +
        |           ((d.doc_id*17 + f.x*23 + i.x*11) % 256) +
        |           ((d.doc_id*13 + f.x*29 + i.x*3) % 256)) AS BIGINT)
        |    AS sum_ch,
        |  CAST(sum(i.x * (((d.doc_id*31 + f.x*19 + i.x*7) % 256) +
        |                  ((d.doc_id*17 + f.x*23 + i.x*11) % 256) +
        |                  ((d.doc_id*13 + f.x*29 + i.x*3) % 256)))
        |    AS BIGINT) AS wsum_ch
        |FROM documents d, (SELECT unnest(range(0, 4)) AS x) f,
        |     (SELECT unnest(range(0, 8)) AS x) i
        |GROUP BY 1, 2""".stripMargin,
    "pipe_training_mix" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text),
        |toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM corpus),
        |freq AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
        |lex AS (
        |  SELECT lang AS lex_lang, tok FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lang
        |               ORDER BY n DESC, tok ASC) AS rk FROM freq)
        |  WHERE rk <= 10),
        |votes AS (
        |  SELECT t.doc_id, l.lex_lang, count(*) AS votes
        |  FROM toks t JOIN lex l ON t.tok = l.tok
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, lex_lang AS pred_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |               ORDER BY votes DESC, lex_lang ASC) AS rk FROM votes)
        |  WHERE rk = 1)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_toks,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+'))) AS BIGINT) AS sum_bpe
        |FROM corpus c
        |JOIN keep USING (doc_id)
        |JOIN pred USING (doc_id)
        |WHERE pred_lang = 'en' AND n_chars >= 100
        |GROUP BY source""".stripMargin,
    "pipe_pretrain_corpus" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 AND doc_id % 13 <> 0
        |      THEN text || ' contact bob@example.org or 555-123-4567 from 10.0.0.1'
        |      ELSE text END AS text,
        |    source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    CASE WHEN doc_id % 17 = 0 AND doc_id % 13 <> 0
        |      THEN text || ' contact bob@example.org or 555-123-4567 from 10.0.0.1'
        |      ELSE text END,
        |    source, n_chars
        |  FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text),
        |kept AS (
        |  SELECT c.* FROM corpus c JOIN keep USING (doc_id)
        |  WHERE c.n_chars >= 100),
        |kwords AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept),
        |b2 AS (SELECT doc_id, w[i.x] || ' ' || w[i.x+1] AS s, len(w) AS nw
        |       FROM kwords, LATERAL (SELECT unnest(range(1, len(w))) AS x) i
        |       WHERE len(w) >= 2),
        |repfrac AS (SELECT doc_id,
        |              1.0 - CAST(count(DISTINCT s) AS DOUBLE)
        |                / (any_value(nw) - 1) AS f
        |            FROM b2 GROUP BY doc_id),
        |lowrep AS (
        |  SELECT k.* FROM kept k LEFT JOIN repfrac r USING (doc_id)
        |  WHERE coalesce(r.f, 0.0) <= 0.1),
        |bwords AS (SELECT string_split(text, ' ') AS w FROM documents
        |           WHERE doc_id % 13 = 0),
        |bsh AS (
        |  SELECT DISTINCT w[i.x] || ' ' || w[i.x+1] || ' ' || w[i.x+2]
        |    || ' ' || w[i.x+3] || ' ' || w[i.x+4] AS s
        |  FROM bwords, LATERAL (SELECT unnest(range(1, len(w)-3)) AS x) i
        |  WHERE len(w) >= 5),
        |cwords AS (SELECT doc_id, string_split(text, ' ') AS w FROM lowrep),
        |csh AS (
        |  SELECT DISTINCT doc_id, w[i.x] || ' ' || w[i.x+1] || ' ' || w[i.x+2]
        |    || ' ' || w[i.x+3] || ' ' || w[i.x+4] AS s
        |  FROM cwords, LATERAL (SELECT unnest(range(1, len(w)-3)) AS x) i
        |  WHERE len(w) >= 5),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM csh JOIN bsh ON csh.s = bsh.s),
        |clean AS (
        |  SELECT c.source, c.doc_id, c.text
        |  FROM lowrep c
        |  WHERE c.doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |r1 AS (
        |  SELECT doc_id, source,
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c
        |  FROM clean),
        |r2 AS (
        |  SELECT doc_id, source,
        |    regexp_replace(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t,
        |    c + len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS c
        |  FROM r1),
        |red AS (
        |  SELECT doc_id, source,
        |    regexp_replace(t,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text,
        |    c + len(regexp_extract_all(t,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_redactions
        |  FROM r2),
        |sampled AS (
        |  SELECT source, doc_id, text, n_redactions
        |  FROM red
        |  WHERE md5(CAST(doc_id AS VARCHAR)) <
        |      CASE source WHEN 'src0' THEN 'g' WHEN 'src1' THEN '8000'
        |                  ELSE '4000' END),
        |t AS (
        |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
        |         md5(text) AS fp, n_redactions
        |  FROM sampled),
        |c2 AS (
        |  SELECT source, doc_id, n_tokens, fp, n_redactions,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(floor((cum - n_tokens) / 2048.0) AS INT) AS pack_id,
        |  CAST((cum - n_tokens) % 2048 AS INT) AS pos,
        |  fp, CAST(n_redactions AS BIGINT) AS n_redactions
        |FROM c2""".stripMargin,
    "d6_quality" ->
      """WITH per_doc AS (
        |  SELECT source, n_chars,
        |    len(string_split(text, ' ')) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'data', 'value'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS stop_ratio,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
        |      / n_chars AS punct_ratio,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS n_bpe
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  avg(n_chars) AS avg_chars,
        |  avg(n_tok) AS avg_toks,
        |  CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
        |  round(avg(stop_ratio), 6) AS avg_stop_ratio,
        |  round(avg(punct_ratio), 6) AS avg_punct_ratio,
        |  CAST(sum(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        |FROM per_doc GROUP BY 1""".stripMargin,
    // chunk-level dedup: keeper = min (doc_id, chunk_id), encoded as
    // doc_id*2^20 + chunk_id — valid while chunk_id < 2^20 (~50M tokens
    // per doc at window 64 / stride 48; the Spark side's struct min has
    // no bound, so a doc beyond that would diverge the gate — the bound
    // is noted at Packing.chunkOverlap too)
    "pipe_rag_index" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 1
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0 AND length(text) >= 1),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
        |meta AS (SELECT doc_id, toks, len(toks) AS n FROM tk),
        |counted AS (
        |  SELECT doc_id, toks, n,
        |    CASE WHEN n <= 64 THEN 1 ELSE 1 + (n - 64 + 47) // 48 END AS nc
        |  FROM meta),
        |chunks AS (
        |  SELECT doc_id, i.c AS chunk_id,
        |    md5(array_to_string(
        |      list_slice(toks, i.c * 48 + 1, i.c * 48 + least(64, n - i.c * 48)),
        |      ' ')) AS chunk_md5
        |  FROM counted, LATERAL (SELECT unnest(range(0, nc)) AS c) i),
        |keep AS (
        |  SELECT chunk_md5, min(doc_id * 1048576 + chunk_id) AS kk
        |  FROM chunks GROUP BY 1)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN doc_id * 1048576 + chunk_id = kk THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept
        |FROM chunks JOIN keep USING (chunk_md5)
        |GROUP BY 1""".stripMargin,
    // sliding 64-token windows, stride 48, exact integer chunk count;
    // chunk identity = md5 of the space-rejoined token slice
    "d14_chunk_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE length(text) >= 1),
        |meta AS (
        |  SELECT doc_id, toks, len(toks) AS n FROM tk),
        |counted AS (
        |  SELECT doc_id, toks, n,
        |    CASE WHEN n <= 64 THEN 1 ELSE 1 + (n - 64 + 47) // 48 END AS nc
        |  FROM meta)
        |SELECT doc_id, CAST(i.c AS INT) AS chunk_id,
        |  CAST(i.c * 48 + 1 AS INT) AS start_tok,
        |  CAST(least(64, n - i.c * 48) AS INT) AS n_tok,
        |  md5(array_to_string(
        |    list_slice(toks, i.c * 48 + 1, i.c * 48 + least(64, n - i.c * 48)),
        |    ' ')) AS chunk_md5
        |FROM counted, LATERAL (SELECT unnest(range(0, nc)) AS c) i""".stripMargin,
    // BPE merge statistic over the word histogram (corpus reduced once)
    "d15_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |hist AS (
        |  SELECT tok, count(*) AS c FROM toks WHERE length(tok) >= 2
        |  GROUP BY 1),
        |pairs AS (
        |  SELECT substr(tok, i.x, 1) AS a, substr(tok, i.x + 1, 1) AS b, c
        |  FROM hist, LATERAL (SELECT unnest(range(1, length(tok))) AS x) i)
        |SELECT a, b, CAST(sum(c) AS BIGINT) AS weight
        |FROM pairs GROUP BY 1, 2
        |ORDER BY weight DESC, a ASC, b ASC
        |LIMIT 10""".stripMargin,
    "d15_bpe_encode" -> bpeEncodeOracle(bpeEncodeMerges),
    "d40_fertility" -> bpeFertilityOracle(bpeEncodeMerges),
    "d15_bpe_tokens" -> bpeTokensOracle(bpeEncodeMerges),
    "pipe_tokenized_pack" -> pipeTokenizedPackOracle(bpeEncodeMerges),
    // the three batch epochs unrolled: each is score-fold ->
    // misclassified filter -> gradient aggregate -> weight update,
    // pure integer arithmetic from the all-zero start
    "d41_perceptron" ->
      (perceptronCtes +
       """e AS (SELECT (SELECT count(*) FROM m1) AS e1,
         |             (SELECT count(*) FROM m2) AS e2,
         |             (SELECT count(*) FROM m3) AS e3)
         |SELECT w3.b, CAST(w3.w AS BIGINT) AS w,
         |  CAST(e1 AS VARCHAR) || ',' || CAST(e2 AS VARCHAR) || ',' ||
         |  CAST(e3 AS VARCHAR) AS epoch_errs
         |FROM w3, e""".stripMargin),
    // the epoch replay CTEs + d28-style scoring under the final
    // weights + the same (score, doc_id)-ordered ntile cut
    "d42_calibration" ->
      (perceptronCtes +
       """sc AS (
         |  SELECT t.doc_id, max(t.y) AS y,
         |    CAST(sum(t.cnt * w3.w) AS BIGINT) AS score
         |  FROM t JOIN w3 USING (b) GROUP BY 1),
         |dk AS (SELECT doc_id, y, score,
         |         ntile(10) OVER (ORDER BY score, doc_id) AS decile
         |       FROM sc)
         |SELECT CAST(decile AS INT) AS decile, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_target,
         |  min(score) AS lo_score, max(score) AS hi_score
         |FROM dk GROUP BY 1""".stripMargin),
    // DSIR: both distributions from ONE token stream (count + filtered
    // count per bucket); the integer-log LLR replayed via binary-string
    // lengths of the same BIGINT products — the d13 no-floating-logs
    // policy, the d28 md5-prefix bucket
    "d39_dsir" ->
      """WITH t AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id,
        |    (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS b,
        |    tgt
        |  FROM t),
        |model AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS cr,
        |         CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
        |  FROM tb GROUP BY 1),
        |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
        |               CAST(sum(ct) AS BIGINT) AS nt FROM model),
        |s AS (
        |  SELECT tb.doc_id, count(*) AS n_tok,
        |    sum(CAST(length(printf('%b', tot.nr * (model.ct + 1))) - 1
        |             AS BIGINT) -
        |        CAST(length(printf('%b', tot.nt * (model.cr + 1))) - 1
        |             AS BIGINT)) AS llr
        |  FROM tb JOIN model USING (b), tot
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_tok, 0) AS BIGINT) AS n_tok,
        |  CAST(coalesce(s.llr, 0) AS BIGINT) AS llr
        |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,
    // integer LM surprise: floor(log2(N/c)) per bigram via binary-string
    // length — exact integers end to end, no floating logs to drift.
    "d13_lm_surprise" ->
      """WITH bg AS (
        |  SELECT doc_id, substr(text, i.x, 2) AS b
        |  FROM documents,
        |       LATERAL (SELECT unnest(range(1, length(text))) AS x) i),
        |model AS (SELECT b, count(*) AS c FROM bg GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM bg)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_bg, 0) AS BIGINT) AS n_bg,
        |  CAST(coalesce(s.surprise, 0) AS BIGINT) AS surprise
        |FROM documents d LEFT JOIN (
        |  SELECT bg.doc_id, count(*) AS n_bg,
        |    sum(length(printf('%b', tot.n // model.c)) - 1) AS surprise
        |  FROM bg JOIN model USING (b), tot
        |  GROUP BY 1) s USING (doc_id)""".stripMargin,
    // two chained Lloyd iterations; intermediate centroid = exact integer
    // mean truncated toward zero (DuckDB // and Spark div share that
    // convention on negatives — NOT python-style floor)
    "d12_kmeans2" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |seeds0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 8),
        |d1 AS (
        |  SELECT q.vec_id, s.cid,
        |         sum((q.qv[i.x] - s.cv[i.x]) * (q.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM q, seeds0 s, LATERAL (SELECT unnest(range(1, len(q.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |c1 AS (
        |  SELECT a1.cid, i.x AS pos, sum(q.qv[i.x]) // count(*) AS c
        |  FROM a1 JOIN q USING (vec_id),
        |       LATERAL (SELECT unnest(range(1, len(q.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |seeds1 AS (SELECT cid, list(c ORDER BY pos) AS cv FROM c1 GROUP BY 1),
        |d2 AS (
        |  SELECT q.vec_id, s.cid,
        |         sum((q.qv[i.x] - s.cv[i.x]) * (q.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM q, seeds1 s, LATERAL (SELECT unnest(range(1, len(q.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d2) WHERE rn = 1)
        |SELECT a2.cid, CAST(i.x AS INT) AS pos, count(*) AS n,
        |       CAST(sum(q.qv[i.x]) AS BIGINT) AS sum_q
        |FROM a2 JOIN q USING (vec_id),
        |     LATERAL (SELECT unnest(range(1, len(q.qv) + 1)) AS x) i
        |GROUP BY 1, 2""".stripMargin,
    // fixed-point k-means: quantize to a 2^20 integer grid (exact in
    // double; both engines round ties away from zero), so distances and
    // centroid sums are exact integer arithmetic in both engines.
    "d12_kmeans" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings),
        |seeds AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 8),
        |d AS (
        |  SELECT q.vec_id, s.cid,
        |         sum((q.qv[i.x] - s.cv[i.x]) * (q.qv[i.x] - s.cv[i.x])) AS dist
        |  FROM q, seeds s, LATERAL (SELECT unnest(range(1, len(q.qv) + 1)) AS x) i
        |  GROUP BY 1, 2),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d) WHERE rn = 1)
        |SELECT a.cid, CAST(i.x AS INT) AS pos, count(*) AS n,
        |       CAST(sum(q.qv[i.x]) AS BIGINT) AS sum_q
        |FROM assign a JOIN q USING (vec_id),
        |     LATERAL (SELECT unnest(range(1, len(q.qv) + 1)) AS x) i
        |GROUP BY 1, 2""".stripMargin
  )
}
