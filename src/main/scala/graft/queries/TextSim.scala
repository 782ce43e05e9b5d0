package graft.queries

import graft.media.Multimodal
import graft.sim.Similarity
import graft.source.{Bars, Tables}
import graft.text.{Corpus, Dedup, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Checkpoint.PinOps
import Core.r6

/** Oracle-checked text-analysis / dedup / similarity / multimodal queries
  * (training-data-pipeline north star). */
object TextSim {

  def textStats(s: SparkSession, dir: String): DataFrame =
    TextStats.withStats(Tables.documents(s, dir))
      .select(col("doc_id"), col("ws_tokens"), col("re_tokens"),
        r6(col("punct_ratio")).as("punct_ratio"),
        r6(col("stopword_ratio")).as("stopword_ratio"),
        r6(col("avg_token_len")).as("avg_token_len"),
        r6(col("quality_score")).as("quality_score"))
      .orderBy("doc_id")

  def textLangid(s: SparkSession, dir: String): DataFrame =
    TextStats.withLangId(Tables.documents(s, dir))
      .select(col("doc_id"), col("predicted_lang"), col("lang"), col("is_correct"))
      .orderBy("doc_id")

  /** Cavnar–Trenkle trigram rank-distance language ID (see
    * [[graft.text.TextStats.langIdNgram]] — exact integer ranks and
    * distances, broadcast profiles). */
  def textLangidNgram(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextStats.langIdNgram(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("predicted_lang"), col("lang"),
        (col("predicted_lang") === col("lang")).cast("int").as("is_correct"),
        col("rank_distance"))
      .orderBy("doc_id")
  }

  /** Gopher heuristic quality gates: raw signals + per-rule flags + keep
    * (see [[graft.text.TextStats.withGopherQuality]]). */
  def qualityGopher(s: SparkSession, dir: String): DataFrame =
    TextStats.withGopherQuality(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_words"),
        r6(col("mean_word_len")).as("mean_word_len"),
        r6(col("symbol_word_ratio")).as("symbol_word_ratio"),
        r6(col("alpha_word_frac")).as("alpha_word_frac"),
        col("stop_hits"), col("pass_words"), col("pass_word_len"),
        col("pass_symbols"), col("pass_alpha"), col("pass_stopwords"),
        col("keep"))
      .orderBy("doc_id")

  /** Flesch / FKGL readability scores per document
    * (see [[graft.text.TextStats.withReadability]]). */
  def textReadability(s: SparkSession, dir: String): DataFrame =
    TextStats.withReadability(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        r6(col("flesch")).as("flesch"), r6(col("fkgl")).as("fkgl"))
      .orderBy("doc_id")

  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextStats.repetition(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_tokens"),
        r6(col("dup_token_frac")).as("dup_token_frac"),
        r6(col("top_bigram_frac")).as("top_bigram_frac"),
        r6(col("dup_bigram_frac")).as("dup_bigram_frac"))
      .orderBy("doc_id")

  /** Lexical diversity: TTR / Guiraud / hapax share per document
    * (see [[graft.text.TextStats.lexicalDiversity]]). */
  def textTtr(s: SparkSession, dir: String): DataFrame =
    TextStats.lexicalDiversity(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        r6(col("ttr")).as("ttr"), r6(col("root_ttr")).as("root_ttr"),
        r6(col("hapax_frac")).as("hapax_frac"))
      .orderBy("doc_id")

  /** Cross-source verbatim-duplication matrix
    * (see [[graft.text.Dedup.crossSourceDups]]). */
  def dedupCrossSource(s: SparkSession, dir: String): DataFrame =
    Dedup.crossSourceDups(Tables.documents(s, dir))
      .orderBy("source_a", "source_b")

  /** Per-document keyword extraction: each doc's top-k terms by tf-idf
    * (deterministic term tie-break) — one WindowGroupLimit-prunable rank
    * over the [[graft.text.TextStats.tfidf]] output, so every mapper keeps
    * only its local top-k per doc before the shuffle. */
  def textKeywords(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    TextStats.tfidf(Tables.documents(s, dir))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), r6(col("tfidf")).as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  /** Trigram novelty vs the corpus prefix
    * (see [[graft.text.TextStats.ngramNovelty]]). */
  def corpusNovelty(s: SparkSession, dir: String): DataFrame =
    TextStats.ngramNovelty(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        r6(col("novelty")).as("novelty"))
      .orderBy("doc_id")

  /** Temperature-scaled (α = ½) source mixture sampling
    * (see [[graft.text.Corpus.temperatureSample]]). */
  def corpusTemperature(s: SparkSession, dir: String): DataFrame =
    Corpus.temperatureSample(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        r6(col("sample_rate")).as("sample_rate"))
      .orderBy("doc_id")

  /** Corpus Zipf-law fit: ln-ln least squares over the top-k frequency
    * spectrum (see [[graft.text.TextStats.zipfFit]]). */
  def corpusZipf(s: SparkSession, dir: String): DataFrame =
    TextStats.zipfFit(Tables.documents(s, dir))
      .select(col("n_types"), r6(col("zipf_slope")).as("zipf_slope"),
        r6(col("zipf_intercept")).as("zipf_intercept"))

  /** Heaps'-law vocabulary-growth fit (see
    * [[graft.text.TextStats.heapsFit]] — the β/ln K pair a corpus
    * monitor thresholds for template-spam or near-random text). */
  def corpusHeaps(s: SparkSession, dir: String): DataFrame =
    TextStats.heapsFit(Tables.documents(s, dir))
      .select(col("n_points"), r6(col("heaps_beta")).as("heaps_beta"),
        r6(col("heaps_ln_k")).as("heaps_ln_k"))

  /** Sliding-window token chunking (context-window prep before
    * tokenization). */
  def docChunks(s: SparkSession, dir: String): DataFrame =
    Corpus.chunk(Tables.documents(s, dir))
      .orderBy("doc_id", "chunk_idx")

  /** Concat-and-split sequence packing into 512-token bins over the
    * md5-shuffled document order — global token cumsum via the bucket-offset
    * running sum, never a single-partition window. */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    Corpus.packSequences(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** Mixture-weighted source sampling toward an equal-token-share target at
    * half the corpus token budget. */
  def corpusMixture(s: SparkSession, dir: String): DataFrame =
    Corpus.mixtureSample(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        r6(col("sample_rate")).as("sample_rate"))
      .orderBy("doc_id")

  /** Per-source quality quota: keep the best half of every source by
    * quality score (exact per-source rank; see Corpus.qualityQuota's
    * scaladoc for the threshold-based 100 TB variant). */
  def qualityQuota(s: SparkSession, dir: String): DataFrame =
    Corpus.qualityQuota(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("quality_rank"),
        r6(col("quality_score")).as("quality_score"))
      .orderBy("doc_id")

  /** Curriculum training order: quality deciles, md5-shuffled within each
    * decile (see [[graft.text.Corpus.curriculum]]). */
  def corpusCurriculum(s: SparkSession, dir: String): DataFrame =
    Corpus.curriculum(Tables.documents(s, dir))
      .select(col("doc_id"), col("decile"), col("curriculum_rank"))
      .orderBy("doc_id")

  /** PII detection + redaction over the corpus — per-class counts plus the
    * digest of the fully redacted text (regex parity with the oracle is
    * checked even where the corpus contains no PII; OpsSpec plants docs
    * that exercise every pattern class). */
  def textRedact(s: SparkSession, dir: String): DataFrame =
    TextStats.redactPii(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** Char-level Shannon entropy quality signal (bits/char). */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    TextStats.charEntropy(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        r6(col("char_entropy")).as("char_entropy"))
      .orderBy("doc_id")

  /** Corpus vocabulary: top-100 tokens by occurrence count with document
    * frequencies — the tokenizer-training word-count pass. */
  def corpusVocab(s: SparkSession, dir: String): DataFrame =
    TextStats.vocab(Tables.documents(s, dir))
      .orderBy(col("n_occurrences").desc, col("token"))

  /** Hashing-trick featurization, long form
    * (graft.text.TextStats.hashFeatures, dim=64). */
  def mlHashFeatures(s: SparkSession, dir: String): DataFrame =
    TextStats.hashFeatures(Tables.documents(s, dir))
      .orderBy("doc_id", "bucket")

  /** C4-style corpus-level duplicated-span removal: drop every
    * non-overlapping 8-token span that appears in >= 3 documents, rebuild
    * the cleaned text (see Corpus.stripDupSpans for the scale shape). */
  def dedupSpans(s: SparkSession, dir: String): DataFrame =
    Corpus.stripDupSpans(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** Span removal with maximal-run accounting: adjacent duplicated spans
    * merge into one removal event (see Corpus.stripDupSpansMaximal). */
  def dedupSpansMaximal(s: SparkSession, dir: String): DataFrame =
    Corpus.stripDupSpansMaximal(Tables.documents(s, dir))
      .orderBy("doc_id")

  def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextStats.tfidf(Tables.documents(s, dir))
      .select(col("doc_id"), col("term"), r6(col("tfidf")).as("tfidf"))
      .orderBy("doc_id", "term")

  /** DSIR importance log-weights toward the src0/src1 slice (the "make the
    * corpus look like the trusted domains" selection score — Xie et al.
    * 2023). See [[graft.text.TextStats.dsirWeights]] for the smoothing and
    * the position-ordered fold; the oracle replays both with the identical
    * add-1 arithmetic. */
  def corpusDsir(s: SparkSession, dir: String): DataFrame =
    TextStats.dsirWeights(Tables.documents(s, dir),
        col("source").isin("src0", "src1"))
      .select(col("doc_id"), col("n_tokens"),
        r6(col("log_weight")).as("log_weight"),
        r6(col("log_weight") / col("n_tokens")).as("avg_log_weight"))
      .orderBy("doc_id")

  /** CCNet-style unigram LM quality score: mean −log2 p(token) under the
    * corpus's own unigram distribution. */
  def textLogprob(s: SparkSession, dir: String): DataFrame =
    TextStats.unigramLogprob(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_tokens"),
        r6(col("avg_neg_logprob")).as("avg_neg_logprob"))
      .orderBy("doc_id")

  /** JL sign-matrix random projection of every embedding to 8 components. */
  def simRproj(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProject(Tables.embeddings(s, dir))
      .select(col("vec_id") +:
        (0 until Similarity.RprojDims).map(d => r6(col(s"rp_$d")).as(s"rp_$d")): _*)
      .orderBy("vec_id")

  def simLabelCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroidCosines(Tables.embeddings(s, dir))
      .select(col("label_a"), col("label_b"), r6(col("cos")).as("cos"))
      .orderBy("label_a", "label_b")

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextStats.withFingerprint(Tables.documents(s, dir))
      .select(col("doc_id"), col("fingerprint"))
      .orderBy("doc_id")

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir))
      .orderBy("canonical_id")

  /** Normalization-aware exact dedup (lowercase/strip/collapse, then
    * group) — catches case/punctuation/whitespace near-trivials. */
  def dedupExactNorm(s: SparkSession, dir: String): DataFrame =
    Dedup.exactNorm(Tables.documents(s, dir))
      .orderBy("canonical_id")

  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(Tables.documents(s, dir))
      .orderBy("doc_id")

  def dedupMinhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(Tables.documents(s, dir))
      .select(col("doc_a"), col("doc_b"), r6(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Dedup threshold sweep: pair count, flagged-doc count and the exact
    * Jaccard range surviving at each threshold in {0.5 … 0.9} — the
    * pick-your-threshold curve a curation team plots before committing a
    * corpus-wide dedup pass. ONE pair-generation pass (the expensive LSH +
    * verify branch, materialized once): each verified pair explodes into
    * the threshold bins it clears (narrow, ≤5 rows per pair) and two
    * grouped aggregates produce the curve. Stats are count/distinct/min/
    * max only — order-free, so the oracle matches bit-exactly with no
    * float-sum caveat. */
  def dedupThresholdSweep(s: SparkSession, dir: String): DataFrame =
    Dedup.thresholdSweep(
        Dedup.minhashPairs(Tables.documents(s, dir)).pinned())
      .select(col("threshold"), col("n_pairs"), col("n_dup_docs"),
        r6(col("min_jaccard")).as("min_jaccard"),
        r6(col("max_jaccard")).as("max_jaccard"))
      .orderBy("threshold")

  /** Asymmetric containment over the LSH candidate pairs — the
    * contamination-DIRECTION companion to dedup_minhash_pairs (which side
    * of the pair is inside the other). */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, dir))
      .select(col("doc_a"), col("doc_b"),
        r6(col("containment_a")).as("containment_a"),
        r6(col("containment_b")).as("containment_b"),
        r6(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Held-out benchmark split for the decontamination queries: every 10th
    * document is the "eval" set, the rest "train" (a stand-in for the
    * benchmark corpus a real pipeline decontaminates against). */
  private def corpusSplit(docs: DataFrame): (DataFrame, DataFrame) =
    (docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0))

  def decontamPairs(s: SparkSession, dir: String): DataFrame = {
    val (train, eval) = corpusSplit(Tables.documents(s, dir))
    Dedup.crossCorpusPairs(train, eval)
      .select(col("train_id"), col("eval_id"), r6(col("jaccard")).as("jaccard"))
      .orderBy("train_id", "eval_id")
  }

  def decontaminateTrain(s: SparkSession, dir: String): DataFrame = {
    val (train, eval) = corpusSplit(Tables.documents(s, dir))
    Dedup.decontaminate(train, eval)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Bloom-filter decontamination probe over the same train/eval split:
    * bloom candidates with confirmed-vs-false-positive accounting (see
    * [[graft.text.Dedup.bloomDecontam]]; m=256 deliberately small so FP
    * rows exist at test scale). */
  def decontamBloom(s: SparkSession, dir: String): DataFrame = {
    val (train, eval) = corpusSplit(Tables.documents(s, dir))
    Dedup.bloomDecontam(train, eval)
      .orderBy("doc_id")
  }

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documents(s, dir))
      .orderBy("doc_id")

  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir))
      .orderBy("doc_a", "doc_b")

  /** Per-doc duplication density: fraction of a doc's distinct 8-token
    * windows that occur in ≥1 other doc — the linear prefilter before any
    * pairwise dedup (see [[graft.text.Dedup.duplicationDensity]]). */
  def dedupDensity(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicationDensity(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        r6(col("dup_density")).as("dup_density"))
      .orderBy("doc_id")

  /** Sketch-algebra vocabulary overlap: |vocab(A) ∩ vocab(B)| distinct
    * words between every source pair by inclusion–exclusion over HLL
    * registers — est(A) + est(B) − est(A ∪ B), where the union sketch is
    * the register-wise max (no rescan; HLL is duplicate-insensitive, so
    * the raw token stream needs no distinct first). The exact intersection
    * rides along as the yardstick. At 100 TB this answers "how much does
    * crawl A's vocabulary overlap crawl B's" from per-source register
    * tables alone — 256 longs per source, the corpora are never re-read
    * or joined. */
  def corpusVocabOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.analytics.Sketches
    val words = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
    val regs = Sketches.hllRegisters(words, col("word"), Seq("source"))
    val est1 = Sketches.hllEstimate(regs, Seq("source"))
    val srcs = regs.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .join(srcs.select(col("source").as("src_b")),
        col("src_a") < col("src_b"))
    val mem = pairs.select(col("src_a"), col("src_b"),
      explode(array(col("src_a"), col("src_b"))).as("source"))
    val regsU = broadcast(mem).join(regs, Seq("source"))
      .groupBy("src_a", "src_b", "bucket").agg(max(col("rho")).as("rho"))
    val estU = Sketches.hllEstimate(regsU, Seq("src_a", "src_b"))
      .withColumnRenamed("hll_est", "est_u")
    val sw = words.distinct()
    val exact = sw.as("x").join(sw.as("y"),
        col("x.word") === col("y.word") &&
          col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("n_exact_inter"))
    pairs
      .join(exact, Seq("src_a", "src_b"), "left")
      .join(broadcast(est1.withColumnRenamed("source", "src_a")
        .withColumnRenamed("hll_est", "est_a")), Seq("src_a"))
      .join(broadcast(est1.withColumnRenamed("source", "src_b")
        .withColumnRenamed("hll_est", "est_b")), Seq("src_b"))
      .join(broadcast(estU), Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_exact_inter"), lit(0L)).as("n_exact_inter"),
        r6(col("est_a") + col("est_b") - col("est_u")).as("hll_inter_est"),
        r6(col("est_u")).as("hll_union_est"))
      .orderBy("src_a", "src_b")
  }

  /** Per-doc boilerplate density: fraction of a doc's distinct 8-token
    * windows that are source-level templates (windows appearing in ≥5% of
    * the source's eligible docs — [[graft.text.Dedup.boilerplate]]'s
    * default `minFrac = 0.05`, mirrored by the DuckDB oracle). */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    Dedup.boilerplate(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("n_grams"), col("n_tpl_grams"),
        r6(col("boilerplate_ratio")).as("boilerplate_ratio"))
      .orderBy("doc_id")

  /** Exact shared-window pairs (verbatim 8-token windows in common) — the
    * substring-overlap duplicate class, vs the Jaccard classes above. */
  def dedupSharedNgrams(s: SparkSession, dir: String): DataFrame =
    Dedup.sharedNgramPairs(Tables.documents(s, dir))
      .orderBy("doc_a", "doc_b")

  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(s, dir))
      .select(col("doc_a"), col("doc_b"), r6(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  def simTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteTopK(Tables.embeddings(s, dir))
      .select(col("probe_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cos"))
      .orderBy("probe_id", "rank")

  /** Contrastive hard negatives: per probe, the top-5 different-label
    * near-misses (see [[graft.sim.Similarity.hardNegatives]]). */
  def simHardNegatives(s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables.embeddings(s, dir))
      .select(col("probe_id"), col("probe_label"), col("rank"),
        col("neighbor_id"), col("neighbor_label"), r6(col("cos")).as("cos"))
      .orderBy("probe_id", "rank")

  /** Per-dimension embedding stats (see [[graft.sim.Similarity.dimStats]]
    * — quantized exact power sums, so mean/std hash-match DuckDB). */
  def embDimStats(s: SparkSession, dir: String): DataFrame =
    Similarity.dimStats(Tables.embeddings(s, dir))
      .select(col("dim"), col("n"), r6(col("mean")).as("mean"),
        r6(col("std")).as("std"), r6(col("v_min")).as("v_min"),
        r6(col("v_max")).as("v_max"))
      .orderBy("dim")

  /** Z-score whitening norms per vector
    * (see [[graft.sim.Similarity.whiten]]). */
  def embWhiten(s: SparkSession, dir: String): DataFrame =
    Similarity.whiten(Tables.embeddings(s, dir), r6)
      .select(col("vec_id"), col("label"), r6(col("norm_raw")).as("norm_raw"),
        r6(col("norm_z")).as("norm_z"))
      .orderBy("vec_id")

  /** Exact max-inner-product top-k
    * (see [[graft.sim.Similarity.mipsTopK]]; the norm-augmentation
    * reduction to cosine ANN is spec-proven rank-equal). */
  def simMips(s: SparkSession, dir: String): DataFrame =
    Similarity.mipsTopK(Tables.embeddings(s, dir))
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        r6(col("ip")).as("ip"))
      .orderBy("probe_id", "rank")

  def simAnnIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(s, dir))
      .select(col("probe_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cos"))
      .orderBy("probe_id", "rank")

  /** ANN top-k via multi-table sign-LSH (4 tables × 6 hyperplane bits) —
    * the hash-bucketed complement to sim_ann_ivf's centroid buckets. */
  def simAnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, dir))
      .select(col("probe_id"), col("rank"), col("neighbor_id"), r6(col("cos")).as("cos"))
      .orderBy("probe_id", "rank")

  /** IVF-PQ asymmetric-distance ANN: probe → IVF bucket → ADC lookup over
    * PQ codes (see [[graft.sim.Similarity.ivfPqTopK]]) — the index shape
    * billion-vector retrieval serves, where candidate scoring never touches
    * raw vectors. Output is L2²-ranked (ascending), recall-gated by the
    * `pq` leg of sim_ann_recall. */
  def simAnnPq(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(Tables.embeddings(s, dir))
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        r6(col("adist")).as("adist"))
      .orderBy("probe_id", "rank")

  /** ANN quality measurement: recall@k of each approximate index (IVF
    * buckets, multi-table sign-LSH, IVF-PQ ADC) against the brute-force ground truth —
    * the accept/reject gate for an ANN config before it serves a 100 TB
    * retrieval corpus. Per (method, probe): how many of the true top-k the
    * index returned, how many rows it returned at all (an under-filled
    * bucket shows up here, not as a silent quality loss). The three top-k
    * legs reuse the existing operators; the scoring is a tiny left join +
    * aggregate over probe-count-sized frames. */
  def simAnnRecall(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val truth = Similarity.bruteTopK(emb, k = k)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit"))
    val ann = Similarity.ivfTopK(emb, k = k)
        .select(lit("ivf").as("method"), col("probe_id"), col("neighbor_id"))
      .unionByName(Similarity.lshTopK(emb, k = k)
        .select(lit("lsh").as("method"), col("probe_id"), col("neighbor_id")))
      .unionByName(Similarity.ivfPqTopK(emb, k = k)
        .select(lit("pq").as("method"), col("probe_id"), col("neighbor_id")))
    ann.join(truth, Seq("probe_id", "neighbor_id"), "left")
      .groupBy("method", "probe_id")
      .agg(count(lit(1)).as("n_returned"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(col("method"), col("probe_id"), col("n_returned"), col("n_hits"),
        r6(col("n_hits").cast("double") / lit(k.toDouble)).as(s"recall_at_$k"))
      .orderBy("method", "probe_id")
  }

  /** Matryoshka truncation sweep: recall@k of brute-force retrieval over
    * only the FIRST d embedding components (d ∈ {8, 16, 32}) against the
    * full-dimension truth — the measurement behind serving truncated
    * (Matryoshka-style) embeddings, where a prefix slice cuts index size
    * and dot-product cost by 2–8× if recall holds. On the synthetic
    * (isotropic, non-MRL-trained) embeddings the curve sits near zero —
    * the honest verdict this gate exists to deliver: you may only truncate
    * what was TRAINED front-loaded, and the sweep is how you find out
    * before an index build commits to it. Same scoring join as
    * [[simAnnRecall]]; each truncated leg is the same broadcast-probe scan
    * with a narrower vector, so the sweep costs ~4 corpus scans and no
    * extra shuffle. */
  def simMatryoshka(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val truth = Similarity.bruteTopK(emb, k = k)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit"))
    val legs = Seq(8, 16, 32).map { d =>
      Similarity.bruteTopK(
          emb.withColumn("embedding", slice(col("embedding"), 1, d)), k = k)
        .select(lit(d).as("dims"), col("probe_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    legs.join(truth, Seq("probe_id", "neighbor_id"), "left")
      .groupBy("dims", "probe_id")
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(col("dims"), col("probe_id"), col("n_hits"),
        r6(col("n_hits").cast("double") / lit(k.toDouble)).as(s"recall_at_$k"))
      .orderBy("dims", "probe_id")
  }

  /** PII prevalence scorecard per source: total hits and affected-doc
    * counts for each pattern class of [[graft.text.TextStats.redactPii]] —
    * the per-provenance privacy report a release review reads before the
    * scrub (a source with an outlying rate gets quarantined wholesale, not
    * row-scrubbed). Long format via stack over the per-doc class counts;
    * one source-keyed aggregate on top of the narrow redact projection. */
  def textPiiSummary(s: SparkSession, dir: String): DataFrame =
    TextStats.piiSummary(Tables.documents(s, dir))
      .orderBy("source", "pii_type")

  /** int8 scalar quantization of every embedding, element-checked. */
  def simQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, dir))
      .orderBy("vec_id", "idx")

  /** Deterministic 2-iteration k-means clustering over the embedding
    * corpus (cosine assignment, sequential-fold centroid means). */
  def simKmeans(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeans(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("cluster"), r6(col("cos")).as("cos"))
      .orderBy("vec_id")

  /** Product-quantization codes + quantization error
    * (graft.sim.Similarity.pqEncode: 4 subspaces × 8 centroids, 2 Lloyd
    * iterations). */
  def simPq(s: SparkSession, dir: String): DataFrame =
    Similarity.pqEncode(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("subspace"), col("code"),
        r6(col("qerr")).as("qerr"))
      .orderBy("vec_id", "subspace")

  /** SemDeDup: connected components over embedding near-dup pairs; one
    * canonical vector kept per semantic cluster. */
  def simSemanticDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(s, dir))
      .orderBy("vec_id")

  def simNeardup(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(s, dir))
      .select(col("vec_a"), col("vec_b"), r6(col("cos")).as("cos"))
      .orderBy("vec_a", "vec_b")

  /** Multimodal metadata (oracle-checkable subset: payload length, md5,
    * extracted numeric field). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Bars.readEvents(s, dir).select(
        col("event_id"),
        length(col("props")).cast("long").as("payload_len"),
        md5(col("props").cast("binary")).as("payload_md5"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k_value"))
      .orderBy("event_id")

  /** Exact dedup over the opaque media payloads: one canonical asset per
    * (kind, content-hash), copy count, byte size — the asset-level dedup a
    * multimodal ingest runs BEFORE any decode/feature work (decoding each
    * of N copies is N× wasted GPU/CPU). One hash-keyed aggregate with
    * map-side partials; the binary payload never shuffles, only its md5. */
  def multimodalDedup(s: SparkSession, dir: String): DataFrame =
    Bars.readEvents(s, dir).select(col("event_type").as("kind"),
        col("props").cast("binary").as("payload"), col("event_id"))
      .groupBy(col("kind"), md5(col("payload")).as("payload_md5"))
      .agg(min(col("event_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        max(length(col("payload")).cast("long")).as("n_bytes"))
      .orderBy("kind", "payload_md5")

  /** Quality-ranked token-budget cut at B=10k whitespace tokens (see
    * [[graft.text.Corpus.tokenBudget]] — exact integer running total over
    * the bucket-offset numbering, whole-document selection). */
  def corpusTokenBudget(s: SparkSession, dir: String): DataFrame =
    Corpus.tokenBudget(Tables.documents(s, dir), 10000L)
      .select(col("doc_id"), col("ws_tokens"),
        r6(col("quality_score")).as("quality_score"),
        col("cum_tokens"), col("selected"))
      .orderBy("doc_id")

  /** Perceptual-hash (aHash) near-dup clusters over the media payload
    * column (see [[graft.media.Multimodal.phashClusters]] — exact integer
    * bits, full-hash cluster labels, chunk columns for downstream banded
    * hamming joins). All-integer output. */
  def multimodalPhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.phashClusters(Bars.readEvents(s, dir))
      .select(col("event_id"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("phash_cluster"), col("cluster_size"), col("keep"))
      .orderBy("event_id")

  /** Near-duplicate aHash-cluster pairs via the banded Hamming join (see
    * [[graft.media.Multimodal.phashNeighbors]] — nibble pigeonhole over
    * the hash-table-sized distinct-pattern frame, xor+bit_count verify). */
  def multimodalPhashNeighbors(s: SparkSession, dir: String): DataFrame =
    Multimodal.phashNeighbors(Bars.readEvents(s, dir))
      .orderBy("cluster_a", "cluster_b")

  /** OOV-rate per document against the corpus's top-k vocabulary — the
    * tokenizer-coverage readout (which docs a k-type vocab fails to cover).
    * Top-k is a TakeOrderedAndProject (count desc, term tie-break —
    * deterministic, no global sort) broadcast back onto the token stream;
    * counting is exact integers. k=10 exercises real OOV mass on the
    * synthetic ~30-type corpus; production k is a parameter. */
  def textOov(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val topV = toks.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(k)
      .select(col("t"), lit(1).as("_in"))
    toks.join(broadcast(topV), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("_in").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        r6(col("n_oov").cast("double") / col("n_tokens")).as("oov_frac"))
      .orderBy("doc_id")
  }

  /** Partition-batched stub decode over typed media records. The stand-in
    * decoder is pure integer arithmetic, so even this Dataset/mapPartitions
    * path is oracle-checked: TextSimSql.multimodalDecode replays the
    * byte-fold in DuckDB. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Bars.readEvents(s, dir)).toDF()
      .orderBy("event_id")

  /** Resize planning over decoded media dims: aspect-preserving target box
    * under 256px, never upscaled — the sizing pass before a resample. */
  def multimodalResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(Bars.readEvents(s, dir)).toDF()
      .select(col("event_id"), col("kind"), col("width"), col("height"),
        col("new_width"), col("new_height"), r6(col("scale")).as("scale"))
      .orderBy("event_id")

  /** Frame sampling over the (tiled) payload: every 4th 16-char frame with
    * a per-frame checksum — the video-frame-sample plumbing, deterministic
    * end to end. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Bars.readEvents(s, dir))
      .orderBy("event_id", "frame_idx")

  /** Near-dup clustering: connected components (min-label propagation) over
    * the MinHash pair graph — every doc in a pair gets its cluster's
    * canonical (minimum) doc_id. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(Dedup.minhashPairs(Tables.documents(s, dir)))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")

  /** Quality-aware canonical selection: per near-dup cluster, KEEP the
    * highest-quality member (tie-break min doc_id) instead of the blind
    * minimum id — the dedup policy that preserves the best copy of each
    * duplicated document (SemDeDup/FineWeb-style curation keeps quality,
    * not arrival order). Cluster-keyed rank window over cluster-sized
    * groups; quality doubles are the engine's own oracle-green
    * quality_score, so the ordering is bit-consistent cross-engine. */
  def dedupCanonical(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val clusters = Dedup.connectedComponents(Dedup.minhashPairs(docs))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val q = TextStats.withStats(docs).select(col("doc_id"), col("quality_score"))
    val byCluster = Window.partitionBy("cluster_id")
    val ord = byCluster.orderBy(col("quality_score").desc, col("doc_id"))
    clusters.join(q, Seq("doc_id"))
      .withColumn("rnk", row_number().over(ord))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .filter(col("rnk") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"),
        col("n_members").cast("long").as("n_members"),
        r6(col("quality_score")).as("keep_quality"))
      .orderBy("cluster_id")
  }

  /** Per-source corpus profile: doc counts, average quality, language
    * spread — the provenance-level view a curation pipeline tracks. */
  def textSourceStats(s: SparkSession, dir: String): DataFrame =
    TextStats.withStats(Tables.documents(s, dir))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        r6(avg(col("quality_score"))).as("avg_quality"),
        countDistinct(col("lang")).as("n_langs"),
        r6(avg(col("ws_tokens").cast("double"))).as("avg_tokens"))
      .orderBy("source")

  /** The end-to-end corpus-curation composite a training-data pipeline runs
    * before tokenization: quality-gate every document, then keep only the
    * canonical representative of each near-dup cluster (docs outside any
    * cluster keep themselves). Composes text stats + MinHash clustering in
    * one plan. */
  def curateDocs(s: SparkSession, dir: String, minQuality: Double = 0.55): DataFrame = {
    val docs = Tables.documents(s, dir)
    val quality = TextStats.withStats(docs)
      .select(col("doc_id"), col("quality_score"))
    val clusters = Dedup.connectedComponents(Dedup.minhashPairs(docs))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    quality.join(clusters, Seq("doc_id"), "left")
      .filter(col("quality_score") >= minQuality &&
        (col("cluster_id").isNull || col("cluster_id") === col("doc_id")))
      .select(col("doc_id"), r6(col("quality_score")).as("quality_score"))
      .orderBy("doc_id")
  }

  /** BM25 top-50 retrieval for the fixed query term set
    * [[graft.text.TextStats.Bm25Query]] (ranked on the unrounded score,
    * rounded for display). */
  def textBm25(s: SparkSession, dir: String): DataFrame =
    TextStats.bm25(Tables.documents(s, dir))
      .select(col("doc_id"), col("dl"), col("n_hit"),
        r6(col("bm25")).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))

  /** Inverted-index build: per-term exact stats + bounded posting sample
    * (see [[graft.text.TextStats.invertedIndex]]). */
  def textInvertedIndex(s: SparkSession, dir: String): DataFrame =
    TextStats.invertedIndex(Tables.documents(s, dir))
      .orderBy("term")

  /** BPE merge learning over the word-type table: the first 8 merges with
    * their pair frequencies (see [[graft.text.Bpe.learnMerges]]; the
    * oracle re-derives every round independently — chained recursive-CTE
    * folds, not an injected replay). */
  def tokenizerBpe(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.learnMerges(Tables.documents(s, dir))
      .orderBy("merge_rank")

  /** BPE segmentation applied to the corpus: per-doc word/subword counts
    * under the 8-merge model — the fertility measurement (subwords per
    * word) a tokenizer-training run reports. ONE word-keyed join against
    * the segmented word-type table; text is never re-scanned per merge. */
  def tokenizerSegment(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val v = graft.text.Bpe.segmented(docs)
      .select(col("word"), col("n_subwords").as("_ns"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(v, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("_ns")).as("n_subwords"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        r6(col("n_subwords").cast("double") / col("n_words"))
          .as("subwords_per_word"))
      .orderBy("doc_id")
  }

  /** Bigram-LM document scores: mean −log2 p(t₂|t₁), add-one smoothed
    * (see [[graft.text.TextStats.bigramLogprob]]). */
  def textLogprobBigram(s: SparkSession, dir: String): DataFrame =
    TextStats.bigramLogprob(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_bigrams"),
        r6(col("bigram_nll")).as("bigram_nll"))
      .orderBy("doc_id")

  /** CCNet-style perplexity bucketing: docs banded head/middle/tail
    * per language by their bigram-LM mean NLL (log-perplexity — monotone
    * in perplexity, so bucketing on it avoids a cross-engine `exp`).
    * Band thresholds cut the per-lang [min, max] NLL range in thirds — a
    * tiny per-lang aggregate broadcast back, the scale-clean analog of
    * CCNet's fixed learned thresholds (no per-lang sort, no quantile
    * approximation). Comparisons run on the UNROUNDED nll, which is
    * bit-equal cross-engine by the sequential-fold contract of
    * [[graft.text.TextStats.bigramLogprob]]. */
  def qualityPerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nll = TextStats.bigramLogprob(docs)
      .select(col("doc_id"), col("bigram_nll").as("_nll"))
    // two consumers follow (the band aggregate and the final join);
    // without the checkpoint the whole bigram chain evaluates twice
    val scored = nll.join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .pinned()
    val bands = scored.groupBy("lang")
      .agg(min(col("_nll")).as("lo"), max(col("_nll")).as("hi"))
    scored.join(broadcast(bands), Seq("lang"))
      .select(col("doc_id"), col("lang"), r6(col("_nll")).as("bigram_nll"),
        when(col("_nll") <= col("lo") + (col("hi") - col("lo")) / 3.0,
          "head")
          .when(col("_nll") <=
            col("lo") + (col("hi") - col("lo")) * 2.0 / 3.0, "middle")
          .otherwise("tail").as("ppl_bucket"))
      .orderBy("doc_id")
  }

  /** One-row corpus datasheet: the headline numbers a dataset card leads
    * with — docs, tokens, languages, sources, verbatim-duplicate fraction,
    * token-length envelope. One partial+final aggregate over the corpus;
    * every statistic is exact (integer counts; the two ratios are single
    * divisions of exact longs). */
  def corpusDatacard(s: SparkSession, dir: String): DataFrame = {
    val toks = size(split(col("text"), " "))
    Tables.documents(s, dir)
      .agg(count(lit(1)).as("n_docs"),
        sum(toks.cast("long")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(md5(col("text"))).as("n_unique_texts"),
        min(toks).as("min_tokens"), max(toks).as("max_tokens"))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"), col("n_unique_texts"), col("min_tokens"),
        col("max_tokens"),
        r6(lit(1.0) -
          col("n_unique_texts").cast("double") / col("n_docs"))
          .as("dup_frac"),
        r6(col("n_tokens").cast("double") / col("n_docs"))
          .as("mean_tokens"))
  }

  /** Shared-prefix clusters: documents opening with the same first-k
    * tokens — the boilerplate/mirror detector (templated pages share
    * openings long before MinHash fires). One hash-keyed aggregate on the
    * 8-token prefix; only clusters (≥2 docs) report. */
  def dedupPrefix(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, k)))
          .as("prefix_md5"))
      .groupBy("prefix_md5")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_docs") >= 2)
      .orderBy("prefix_md5")

  /** Top-50 adjacent-bigram PMI collocations (count ≥ 5; see
    * [[graft.text.TextStats.collocations]]). */
  def corpusColloc(s: SparkSession, dir: String): DataFrame =
    TextStats.collocations(Tables.documents(s, dir))
      .select(col("t1"), col("t2"), col("n_pair"), col("c_a"), col("c_b"),
        r6(col("pmi")).as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
}
