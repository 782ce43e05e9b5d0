package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table (training-data-pipeline
  * north star): token counting (whitespace + regex), punctuation/stopword
  * ratios, quality scoring, marker-based language ID, and min-hash document
  * fingerprinting. All narrow per-row projections (no shuffle) built from
  * codegen-friendly built-ins + higher-order array functions — no UDFs.
  */
object TextStats {

  /** Stopword markers per language for the heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est"),
    "zh" -> Seq("de", "shi", "he", "zai", "le"))

  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "is", "in")

  /** Tokenization, length/punctuation/stopword stats and a composite quality
    * score. Formula mirrored verbatim in the DuckDB oracle. */
  def withStats(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stoplist = array(Stopwords.map(lit): _*)
    val wsTokens = size(toks).cast("long")
    val reTokens = expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)")
    val punct = expr("CAST(length(regexp_replace(text, '[a-z0-9 ]', '')) AS DOUBLE)") / length(col("text"))
    val stopRatio = size(filter(toks, t => array_contains(stoplist, t))).cast("double") / size(toks)
    val avgLen = length(regexp_replace(col("text"), lit(" "), lit(""))).cast("double") / size(toks)
    docs.select(col("*"),
      wsTokens.as("ws_tokens"),
      reTokens.as("re_tokens"),
      punct.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      avgLen.as("avg_token_len"),
      ((lit(1.0) - punct) * 0.4 + stopRatio * 0.3 +
        least(wsTokens, lit(100)).cast("double") / 100 * 0.3).as("quality_score"))
  }

  /** Marker-count language ID: per language, count tokens hitting its marker
    * list; predict the argmax (ties broken alphabetically). */
  def withLangId(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = docs.select(col("*") +: LangMarkers.map { case (l, ms) =>
      size(filter(toks, t => array_contains(array(ms.map(lit): _*), t)))
        .cast("long").as(s"score_$l")
    }: _*)
    val best = greatest(LangMarkers.map { case (l, _) => col(s"score_$l") }: _*)
    val pred = LangMarkers.foldRight(lit("zh"): Column) { case ((l, _), acc) =>
      when(col(s"score_$l") === best, lit(l)).otherwise(acc)
    }
    scored.withColumn("predicted_lang", pred)
      .withColumn("is_correct", (col("predicted_lang") === col("lang")).cast("int"))
  }

  /** Profile size for the Cavnar–Trenkle language ID. */
  val CtProfileK = 50

  /** Cavnar–Trenkle (1994) n-gram language ID: build each language's
    * rank profile (top-K char trigrams by frequency, ties by gram), rank
    * each document's own trigrams the same way, and classify by minimal
    * out-of-place rank distance — Σ |doc_rank − profile_rank| with a
    * K penalty for grams missing from the profile. The classic
    * dictionary-free language detector, an order stronger than the
    * marker-word heuristic ([[withLangId]]) on short or stopword-poor
    * text.
    *
    * Everything is exact integers (counts, ranks, |rank diffs|) with
    * deterministic (count desc, gram) tie-breaks, so both engines agree
    * bit-for-bit. Scale shape: one narrow trigram explode (the decode
    * fan-out), two map-side-combinable counting shuffles; the per-doc
    * rank window partitions by doc_id (bounded by doc length), the
    * per-lang window by language over its distinct-gram table; profiles
    * are O(langs·K) and BROADCAST to the doc-gram stream — the doc side
    * never reshuffles for the comparison. */
  def langIdNgram(docs: DataFrame, k: Int = CtProfileK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Per-doc top-k and per-doc gram counts come out of ONE narrow pass
    // each (graft.expr.Trigram — value-identical to the relational
    // explode → groupBy → row_number pipeline, ties in UTF-8 byte order),
    // so nothing corpus-CHARACTER-sized is ever materialized, shuffled, or
    // sorted: the doc side ships ≤ k rows per doc, the profile side ships
    // per-doc DISTINCT gram counts that partial-aggregate map-side. The
    // oracle keeps replaying the relational form unchanged.
    val base = docs.filter(length(col("text")) >= 3)
    val docTop = base
      .select(col("doc_id"),
        posexplode(graft.expr.Trigram.topK(col("text"), k))
          .as(Seq("_p", "gram")))
      .select(col("doc_id"), col("gram"), (col("_p") + 1).cast("long").as("dr"))
    val wl = Window.partitionBy("lang").orderBy(col("c").desc, col("gram"))
    val profile = base
      .select(col("lang"),
        explode(graft.expr.Trigram.counts(col("text"))).as(Seq("gram", "_c")))
      .groupBy("lang", "gram").agg(sum(col("_c")).as("c"))
      .withColumn("lr", row_number().over(wl).cast("long"))
      .filter(col("lr") <= k)
      .select(col("lang").as("cand"), col("gram"), col("lr"))
    val langs = docs.select(col("lang").as("cand")).distinct()
    val dist = docTop.crossJoin(broadcast(langs))
      .join(broadcast(profile), Seq("cand", "gram"), "left")
      .groupBy("doc_id", "cand")
      .agg(sum(coalesce(abs(col("dr") - col("lr")), lit(k.toLong)))
        .as("rank_distance"))
    val wBest = Window.partitionBy("doc_id")
      .orderBy(col("rank_distance"), col("cand"))
    dist.withColumn("_rk", row_number().over(wBest))
      .filter(col("_rk") === 1)
      .select(col("doc_id"), col("cand").as("predicted_lang"),
        col("rank_distance"))
  }

  /** Flesch reading ease + Flesch–Kincaid grade level (Kincaid et al.
    * 1975) with the standard dictionary-free syllable heuristic: per-word
    * count of vowel-group runs (`[aeiouy]+`) floored at one syllable.
    * Sentences are runs of `[.!?]+` floored at one, so unpunctuated
    * corpora (like this synthetic one) stay defined — every doc scores as
    * a single run-on sentence rather than dividing by zero. Narrow
    * per-row array arithmetic — no shuffle, no UDF; at 100 TB this is a
    * pure map stage that pipelines with the scan. */
  def withReadability(docs: DataFrame): DataFrame = {
    val toks = filter(split(col("text"), " "), t => length(t) > lit(0))
    val nWords = greatest(size(toks).cast("long"), lit(1L))
    val nSent = greatest(
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val nSyl = aggregate(toks, lit(0L), (acc, t) =>
      acc + greatest(
        size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))).cast("long"),
        lit(1L)))
    docs.select(col("doc_id"), nWords.as("n_words"),
        nSent.as("n_sentences"), nSyl.as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
          .as("flesch"),
        (lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
          - lit(15.59)).as("fkgl"))
  }

  /** TF-IDF: per (doc, term), tf = occurrences / doc token count,
    * idf = ln(N / docfreq), score = tf · idf. Classic shuffle-partitioned
    * shape: explode → two grouped aggregations keyed by term/doc — no
    * driver-side vocabulary. Returns one row per (doc_id, term). */
  def tfidf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val docLen = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("n_occ"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(docLen, Seq("doc_id"))
      .join(df_, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("n_occ").cast("double") / col("n_toks") *
          log(col("n_docs").cast("double") / col("doc_freq"))).as("tfidf"))
  }

  /** Gopher quality-rule constants (Rae et al. 2021, "Scaling Language
    * Models", appendix A — the published heuristic document filters). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinAlphaFrac = 0.8
  val GopherMinStopHits = 2

  /** Gopher quality-rule bundle: the five published heuristic gates a
    * training-data pipeline applies before repetition/dedup filtering —
    *
    *  - word count within [50, 100000]
    *  - mean word length within [3, 10]
    *  - symbol-to-word ratio (`#` and `...`) ≤ 0.1
    *  - ≥80% of words contain an alphabetic character
    *  - ≥2 distinct stopwords from the 8-word list present
    *
    * Emits each raw signal, the per-rule pass flag, and the conjunction
    * `keep`. Narrow per-row projection (no shuffle, codegen'd splits +
    * higher-order array functions); flags compare the UNROUNDED doubles,
    * identically re-derived in the oracle, so the booleans are
    * bit-portable. */
  def withGopherQuality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nWords = size(toks).cast("long")
    val meanLen = length(regexp_replace(col("text"), lit(" "), lit("")))
      .cast("double") / size(toks)
    val hashCnt = (length(col("text")) -
      length(expr("replace(text, '#', '')"))).cast("double")
    val ellCnt = (length(col("text")) -
      length(expr("replace(text, '...', '')"))).cast("double") / 3.0
    val symRatio = (hashCnt + ellCnt) / size(toks)
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]")))
      .cast("double") / size(toks)
    val stopHits = GopherStopwords.map(w =>
      array_contains(toks, w).cast("long")).reduce(_ + _)
    val s1 = docs.select(col("doc_id"),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_word_ratio"), alphaFrac.as("alpha_word_frac"),
      stopHits.as("stop_hits"))
    val passWords = col("n_words") >= GopherMinWords &&
      col("n_words") <= GopherMaxWords
    val passLen = col("mean_word_len") >= GopherMinMeanLen &&
      col("mean_word_len") <= GopherMaxMeanLen
    val passSym = col("symbol_word_ratio") <= GopherMaxSymbolRatio
    val passAlpha = col("alpha_word_frac") >= GopherMinAlphaFrac
    val passStop = col("stop_hits") >= GopherMinStopHits
    s1.select(col("*"),
      passWords.cast("int").as("pass_words"),
      passLen.cast("int").as("pass_word_len"),
      passSym.cast("int").as("pass_symbols"),
      passAlpha.cast("int").as("pass_alpha"),
      passStop.cast("int").as("pass_stopwords"),
      (passWords && passLen && passSym && passAlpha && passStop)
        .cast("int").as("keep"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models", appendix A — the public repetition filters an LLM
    * training-data pipeline applies): per document,
    *  - `dup_token_frac`: fraction of token occurrences that are repeats of
    *    an earlier token (1 − distinct/total);
    *  - `top_bigram_frac`: fraction of bigram occurrences taken by the
    *    single most frequent bigram;
    *  - `dup_bigram_frac`: fraction of bigram occurrences whose bigram
    *    appears more than once.
    * High values flag boilerplate/spam repetition. Relational shape:
    * explode → per-(doc, gram) counts → per-doc aggregate — two shuffles
    * keyed by doc_id with map-side partial aggregation, no per-doc state
    * outside the aggregates (scales like [[tfidf]]). Single-token documents
    * have no bigrams: their bigram fractions are NULL (left join), mirrored
    * by the oracle. */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val tokStats = toks.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("t")).as("n_distinct_tokens"))
    // sequence(0, -1) descends — guard the 1-token case to an empty array
    // (which explode drops, matching the oracle's empty range join)
    val bigrams = toks.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
          expr("transform(sequence(0, size(toks) - 2), " +
            "i -> concat(toks[i], ' ', toks[i + 1]))"))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("bg"))
    val bgStats = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_bigrams"),
        max(col("n")).as("top_bigram_n"),
        sum(when(col("n") > 1, col("n")).otherwise(lit(0L))).as("dup_bigram_n"))
    tokStats.join(bgStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct_tokens")).cast("double") /
          col("n_tokens")).as("dup_token_frac"),
        (col("top_bigram_n").cast("double") / col("n_bigrams"))
          .as("top_bigram_frac"),
        (col("dup_bigram_n").cast("double") / col("n_bigrams"))
          .as("dup_bigram_frac"))
  }

  /** PII redaction patterns, applied IN ORDER (earlier rewrites feed later
    * matches — email before ip before phone before bare digit runs, so an
    * address inside an email is counted once as email, not again as digits).
    * Every pattern is written in the common Java-regex/RE2 subset (character
    * classes, bounded repetition, \\b anchors — no lookaround, no backrefs)
    * so Spark and the DuckDB oracle match identically. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b", "<PHONE>"),
    ("num", "\\d{9,}", "<NUM>"))

  /** PII detection + redaction (the privacy-scrub step a training-data
    * pipeline runs before release): sequentially rewrite each pattern class
    * to its placeholder, counting matches against the text as it stood when
    * that class was applied. Narrow per-row projection — codegen'd regex
    * built-ins, no shuffle, no UDF. Emits per-class counts and the md5 of
    * the fully redacted text (the oracle compares the digest, so the whole
    * rewritten string is checked without hauling it around). */
  def redactPii(docs: DataFrame): DataFrame = {
    val (finalText, counts) =
      PiiPatterns.foldLeft((col("text"), Seq.empty[Column])) {
        case ((t, cs), (name, pat, token)) =>
          val n = size(regexp_extract_all(t, lit(pat), lit(0)))
            .cast("long").as(s"n_$name")
          (regexp_replace(t, pat, token), cs :+ n)
      }
    docs.select(col("doc_id") +: counts :+
      md5(finalText.cast("binary")).as("redacted_md5"): _*)
  }

  /** Per-source PII prevalence: total hits and affected-doc counts per
    * [[PiiPatterns]] class — the per-provenance privacy scorecard a release
    * review reads before scrubbing (a source with an outlying rate gets
    * quarantined wholesale, not row-scrubbed). Counts inherit
    * [[redactPii]]'s sequential precedence (an address inside an email is
    * an email, never also a digit run). Long format via stack, one
    * source-keyed aggregate over the narrow redact projection. */
  def piiSummary(docs: DataFrame): DataFrame = {
    val stackArgs = PiiPatterns
      .map { case (name, _, _) => s"'$name', n_$name" }.mkString(", ")
    redactPii(docs)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"), expr(
        s"stack(${PiiPatterns.size}, $stackArgs) AS (pii_type, n)"))
      .groupBy("source", "pii_type")
      .agg(sum(col("n")).as("n_hits"),
        count(when(col("n") > 0L, 1)).as("n_docs_affected"))
  }

  /** Character-level Shannon entropy per document (bits/char), plus total
    * and distinct character counts — the classic gibberish/binary-noise
    * quality signal (low entropy flags repeated filler, high entropy flags
    * random noise; both are cut in LLM data curation).
    *
    * Uses the join-free identity H = log2(n) − (Σ c·log2(c)) / n over the
    * per-character occurrence counts c. Fully NARROW per-row — no explode,
    * no shuffle: the char-sorted count array comes from the one-pass
    * histogram expression [[graft.expr.CharCounts]] (O(len) per row; the
    * earlier `array_distinct(split(..))` + per-char `replace` form rescanned
    * the text once per distinct char, O(alphabet · len), and was the
    * slowest narrow query in the sweep). The single float sum still folds
    * over the char-SORTED counts in Spark SQL, the same sequence the
    * oracle's `list_sum(list(... ORDER BY ch))` accumulates, so the doubles
    * are bit-equal. (r7 history: explode → two doc-keyed shuffles, then the
    * narrow replace form, then this.) */
  def charEntropy(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        graft.expr.CharCounts.charCounts(col("text")).as("_cc"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("_cc")).cast("long").as("n_distinct_chars"),
        (log2(length(col("text"))) -
          expr("aggregate(_cc, 0D, (acc, x) -> acc + x * log2(x))") /
          length(col("text"))).as("char_entropy"))

  /** Document fingerprint: lexicographic min of md5 over all char 8-grams —
    * a winnowing-style content fingerprint, identical in Spark and DuckDB
    * because both take a string-min over the same md5 hex strings. Computed
    * by the single-pass custom expression [[graft.expr.MinGramMd5]] (no
    * per-row gram/hash array materialization). */
  def withFingerprint(docs: DataFrame): DataFrame =
    docs.withColumn("fingerprint",
      graft.expr.MinGramMd5.minGramMd5(col("text"), 8))

  /** Unigram language-model score per document: the mean negative log2
    * probability of each token under the corpus's own unigram distribution —
    * the CCNet/Gopher-style LM quality filter (high = rare-token gibberish,
    * very low = repeated boilerplate; both tails get cut) computed with the
    * corpus itself as the LM, no external model.
    *
    * Relational shape: token-keyed count aggregate (partial+final, like
    * tfidf), a scalar total broadcast, a token-keyed join back, then one
    * doc-keyed aggregate. The per-doc float sum folds over the
    * position-sorted list (same sequential-fold contract as charEntropy),
    * so the oracle's `list_sum(list(nlp ORDER BY pos))` is bit-equal. */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val toks = docs.selectExpr("doc_id",
      "posexplode(split(text, ' ')) AS (pos, token)")
    val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(counts, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("pos"),
        (-log2(col("c").cast("double") / col("n_total").cast("double")))
          .as("nlp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        array_sort(collect_list(struct(col("pos"), col("nlp")))).as("_s"))
      .select(col("doc_id"), col("n_tokens"),
        (expr("aggregate(_s, 0D, (acc, x) -> acc + x.nlp)") /
          col("n_tokens")).as("avg_neg_logprob"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every document
    * by how much a TARGET distribution (e.g. a trusted domain slice) prefers
    * its unigrams over the raw corpus —
    *
    *   lw(w)   = ln p̂_t(w) − ln p̂_r(w),  add-1 smoothed over the raw vocab:
    *             p̂(w) = (count(w) + 1) / (total + |V|)
    *   logw(d) = Σ_{positions} lw(token)   (position-ordered sequential fold)
    *
    * High logw docs look like the target; importance resampling keeps docs
    * proportionally. Smoothing over the SHARED raw vocabulary keeps every
    * lw finite (a token unseen in the target gets the floor, never −∞).
    *
    * Scale shape: one token-keyed aggregate builds both count columns in a
    * single pass (the target indicator rides the explode, so the corpus is
    * read once); the three scalars (totals + vocab size) are a 1-row
    * broadcast crossJoin; the per-token weight table joins back token-keyed
    * (vocab-sized — NOT broadcast, at web scale the vocabulary alone can be
    * 1e8 rows); the per-doc sum replays position-ordered via the same
    * sorted-struct sequential fold as [[unigramLogprob]], keeping the
    * float-sum order bit-portable across engines. */
  def dsirWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), isTarget.as("_t"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
    val counts = toks.groupBy("token").agg(
      count(lit(1)).as("cr"),
      count(when(col("_t"), 1)).as("ct"))
    val scal = counts.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
      count(lit(1)).as("v"))
    val lw = counts.crossJoin(broadcast(scal))
      .select(col("token"),
        (log((col("ct") + lit(1)).cast("double") /
            (col("tt") + col("v")).cast("double")) -
          log((col("cr") + lit(1)).cast("double") /
            (col("tr") + col("v")).cast("double"))).as("lw"))
    toks.join(lw, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        array_sort(collect_list(struct(col("pos"), col("lw")))).as("_s"))
      .select(col("doc_id"), col("n_tokens"),
        expr("aggregate(_s, 0D, (acc, x) -> acc + x.lw)").as("log_weight"))
  }

  /** Corpus vocabulary: per-token total occurrences and document frequency,
    * top `k` by count — the word-count pass every tokenizer-training run
    * (BPE, unigram-LM) starts from. One token-keyed partial+final aggregate
    * (hot tokens collapse map-side); the top-k is a TakeOrderedAndProject,
    * never a global sort. Deterministic tie-break on the token string. */
  def vocab(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)

  /** Lexical-diversity block — the vocabulary-richness signals a corpus
    * curation pass scores next to the Gopher gates:
    *
    *   ttr        = types / tokens           (type-token ratio)
    *   root_ttr   = types / √tokens          (Guiraud's R, length-robust)
    *   hapax_frac = hapax legomena / types   (once-only vocabulary share)
    *
    * Low TTR + low hapax flags template/boilerplate text; abnormally high
    * hapax flags gibberish. Relational shape: explode → per-(doc, token)
    * count → per-doc aggregate — two doc_id-keyed shuffles with map-side
    * partials, the same scale shape as [[repetition]]. All counts are
    * exact longs; only the final three ratios are doubles. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("c") === 1, 1)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_types").cast("double") /
          sqrt(col("n_tokens").cast("double"))).as("root_ttr"),
        (col("n_hapax").cast("double") / col("n_types")).as("hapax_frac"))

  /** Zipf-law fit over the corpus frequency spectrum: least-squares slope
    * of ln(frequency) on ln(rank) over the top-k word types. Natural text
    * sits near slope −1; a corpus drifting off it (synthetic spam, heavy
    * dedup artifacts) shows up as a single scalar a monitoring job can
    * threshold.
    *
    * Scale shape: corpus word count (one token-keyed partial+final
    * aggregate) → top-k via TakeOrderedAndProject → the k-row tail is a
    * single-partition window BY CONSTRUCTION (k ≤ 100 rows at any corpus
    * size, post-limit). The four regression sums accumulate as running
    * window sums ordered by rank — a FIXED fold order both engines
    * replay identically (same device as the KS drift cumsum); every term
    * is ≥ 0 (ln rank, ln count ≥ 0 for counts ≥ 1), so MAX(cum) is the
    * total. */
  def zipfFit(docs: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(k)
    val ranked = top.select(
      row_number().over(Window.orderBy(col("c").desc, col("t")))
        .cast("long").as("rank"),
      col("c"))
    val terms = ranked.select(col("rank"),
      log(col("rank").cast("double")).as("x"),
      log(col("c").cast("double")).as("y"))
    val w = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = terms.select(
      sum(col("x")).over(w).as("_sx"), sum(col("y")).over(w).as("_sy"),
      sum(col("x") * col("x")).over(w).as("_sxx"),
      sum(col("x") * col("y")).over(w).as("_sxy"))
    val agg = cums.agg(count(lit(1)).cast("double").as("n"),
      max(col("_sx")).as("sx"), max(col("_sy")).as("sy"),
      max(col("_sxx")).as("sxx"), max(col("_sxy")).as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    agg.select(col("n").cast("long").as("n_types"),
      slope.as("zipf_slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("zipf_intercept"))
  }

  /** Heaps'-law fit over vocabulary growth: V(n) = K·n^β, measured at doc
    * granularity — after each doc (in doc_id order), n = cumulative
    * tokens and V = cumulative distinct types seen — and fit by
    * least-squares of ln V on ln n. Natural corpora sit near β ≈ 0.5–0.6;
    * a β collapsing toward 0 means the vocabulary saturated (template
    * spam, heavy duplication), toward 1 means near-random text. Emits
    * (β, ln K) — the intercept stays in log space so no cross-engine
    * exp() enters the surface.
    *
    * Scale shape: one token explode, two map-side-combinable aggregates
    * (per-type first doc, per-doc token count); the growth curve and the
    * four regression sums run over the O(docs) point table with the
    * zipfFit fixed-fold device — ordered running sums (Spark's window Sum
    * folds left-to-right) whose MAX is the total, replayed in the oracle
    * by an ORDER-BY list fold: identical association on both engines. */
  def heapsFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("t"))
    val newTypes = toks.groupBy("t").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val docLens = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = docLens.join(newTypes, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("nt"), lit(0L)).as("nt"))
      .select(col("doc_id"),
        sum(col("n_toks")).over(w).as("cum_tokens"),
        sum(col("nt")).over(w).as("cum_types"))
      .filter(col("cum_tokens") >= 1 && col("cum_types") >= 1)
    val terms = pts.select(col("doc_id"),
      log(col("cum_tokens").cast("double")).as("x"),
      log(col("cum_types").cast("double")).as("y"))
    val cums = terms.select(
      sum(col("x")).over(w).as("_sx"), sum(col("y")).over(w).as("_sy"),
      sum(col("x") * col("x")).over(w).as("_sxx"),
      sum(col("x") * col("y")).over(w).as("_sxy"))
    val agg = cums.agg(count(lit(1)).cast("double").as("n"),
      max(col("_sx")).as("sx"), max(col("_sy")).as("sy"),
      max(col("_sxx")).as("sxx"), max(col("_sxy")).as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    agg.select(col("n").cast("long").as("n_points"),
      slope.as("heaps_beta"),
      ((col("sy") - slope * col("sx")) / col("n")).as("heaps_ln_k"))
  }

  val NoveltyGram = 3

  /** N-gram novelty vs the corpus prefix: per document, the fraction of its
    * word trigram OCCURRENCES whose trigram first appears in this document
    * (first = smallest doc_id carrying it). The memorization/novelty axis
    * (Lee et al. 2022): boilerplate-heavy docs score near 0, fresh content
    * near 1 — the per-doc complement of the corpus-level
    * [[graft.text.Corpus]] span dedup.
    *
    * Relational shape (ONE linear pass, two shuffles): split the text ONCE
    * into a token array column, explode contiguous trigrams, then a
    * whole-partition `min(doc_id) OVER (PARTITION BY gram)` window marks
    * each occurrence novel-or-not in the same exchange a first-occurrence
    * aggregate would need — replacing the previous aggregate-then-join-back
    * shape that scanned/split/exploded the corpus TWICE and shuffled the
    * occurrence stream twice on the gram key (A/B at sf0.1: 4.2 s → 1.3 s).
    * Everything is exact integer counting; docs shorter than n tokens carry
    * NULL novelty (no grams), preserved by the left join from the full
    * document set. */
  def ngramNovelty(docs: DataFrame, n: Int = NoveltyGram): DataFrame = {
    val toked = docs.select(col("doc_id"),
      split(col("text"), " ").as("_toks"))
    val grams = when(size(col("_toks")) >= n,
      expr(s"transform(sequence(1, size(_toks) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(_toks, i, $n)))"))
      .otherwise(array())
    val g = toked.select(col("doc_id"), explode(grams).as("g"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val perDoc = g.withColumn("first_doc", min(col("doc_id")).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }

  val HashDim = 64

  /** Hashing-trick featurization (long form): each token is bucketed by its
    * md5 prefix modulo `dim` with a ±1 sign from the 9th hex digit's parity
    * — the feature-hashing scheme (Weinberger et al. 2009) that gives every
    * doc a fixed-width sparse vector with NO driver-side vocabulary, at any
    * corpus size. Output one row per (doc, non-empty bucket): raw term
    * count and the sign-corrected count (the actual hashed-feature value;
    * signs cancel colliding tokens in expectation).
    *
    * Scale shape: explode → one (doc_id, bucket)-keyed partial+final
    * aggregate; everything integer-exact, md5 keeps the bucketing
    * bit-portable across engines. */
  def hashFeatures(docs: DataFrame, dim: Int = HashDim): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("_h", md5(col("token")))
      .select(col("doc_id"),
        (expr("CAST(conv(substring(_h, 1, 8), 16, 10) AS BIGINT)") % dim)
          .as("bucket"),
        when(expr("CAST(conv(substring(_h, 9, 1), 16, 10) AS BIGINT)") % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("_sgn"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("tf"), sum(col("_sgn")).as("signed_tf"))

  /** BM25 (Robertson/Sparck Jones; the Okapi formulation with the
    * `ln(1 + (N-df+0.5)/(df+0.5))` idf) retrieval over a FIXED query term
    * set — the keyword-search primitive a corpus-curation pipeline uses for
    * targeted subset pulls ("all docs about X") and contamination probes.
    *
    * Scale shape — deliberately NOT the explode→groupBy tfidf pipeline:
    * per-term tf and the doc length are narrow per-row array ops
    * (`size(filter(toks, _ = t))`), so the only aggregate is ONE single-row
    * corpus-stats reduction (N, Σdl, per-term df — partial+final, bytes of
    * state), broadcast back with a crossJoin. The top-k is a
    * TakeOrderedAndProject. A 100 TB corpus pays one narrow scan + a
    * scalar broadcast — no token-keyed shuffle at all.
    *
    * Ranking sorts on the UNROUNDED double (both engines compute identical
    * IEEE arithmetic; ties broken by doc_id), callers round for display. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Query: Seq[String] = Seq("dup", "join", "spark", "window")
  val Bm25TopK = 50

  def bm25(docs: DataFrame, query: Seq[String] = Bm25Query,
      k1: Double = Bm25K1, b: Double = Bm25B,
      topK: Int = Bm25TopK): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val toks = split(col("text"), " ")
    val withTf = docs.select(
      col("doc_id") +: size(toks).cast("long").as("dl") +:
        query.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"tf_$i")
        }: _*)
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        query.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i")): _*)
    // avgdl as integer-sum / count: exact in both engines (no accumulation
    // -order dependence an AVG over doubles could introduce)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val termScores = query.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log(
        (col("n_docs").cast("double") - col(s"df_$i") + lit(0.5)) /
          (col(s"df_$i") + lit(0.5)) + lit(1.0))
      // tf=0 contributes exactly 0.0 (0/denom) — no CASE needed
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    val nHit = query.indices
      .map(i => (col(s"tf_$i") > 0).cast("int")).reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), nHit.as("n_hit"),
        termScores.reduce(_ + _).as("bm25"))
      .filter(col("n_hit") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** How many doc ids an inverted-index posting row retains (sorted prefix).
    * Exact df/cf/min/max are kept for every term; the materialized posting
    * list is a bounded SAMPLE because a viral term's full posting list at
    * corpus scale is itself big data — a real serving index stores it as
    * delta-encoded blocks, not one aggregate value, and the unbounded
    * collect_list would be the straggler. */
  val PostingSampleK = 100

  /** Inverted index build: one row per term with exact collection stats
    * (cf = total occurrences, df = doc frequency, min/max doc id) and the
    * first [[PostingSampleK]] doc ids as a '|'-joined posting sample.
    *
    * Scale shape: stats come from a token-keyed partial+final aggregate
    * (hot terms collapse map-side); the posting sample bounds per-term
    * state BEFORE aggregation with a rank-filter (row_number ≤ k inside the
    * term partition), so no executor ever holds an unbounded posting list. */
  def invertedIndex(docs: DataFrame, sampleK: Int = PostingSampleK): DataFrame = {
    val pairs = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val stats = pairs.groupBy("term").agg(
      count(lit(1)).as("cf"),
      countDistinct(col("doc_id")).as("df"),
      min(col("doc_id")).as("min_doc"),
      max(col("doc_id")).as("max_doc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc_id")
    val sample = pairs.select("term", "doc_id").distinct()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= sampleK)
      .groupBy("term")
      .agg(concat_ws("|",
        transform(sort_array(collect_list(col("doc_id"))), _.cast("string")))
        .as("postings"))
    stats.join(sample, Seq("term")).orderBy("term")
  }

  /** Bigram language-model score per document: mean negative log2 of the
    * add-one-smoothed conditional p(t₂|t₁) = (c(t₁,t₂)+1)/(c(t₁)+V) under
    * the corpus's own bigram counts — the next step up from
    * [[unigramLogprob]]'s unigram filter: repeated boilerplate scores LOW
    * (predictable transitions), token-salad gibberish scores HIGH even when
    * its unigrams are common, which is exactly the failure mode a
    * unigram-only quality filter misses. Docs with <2 tokens are excluded
    * (no bigram evidence).
    *
    * Scale shape: narrow per-row bigram arrays → one bigram-keyed and one
    * unigram-keyed partial+final aggregate, token-keyed joins back (the
    * tfidf cost class), scalar vocab-size broadcast; the per-doc sum folds
    * over the position-sorted list (sequential-fold contract, oracle
    * bit-equal). */
  def bigramLogprob(docs: DataFrame): DataFrame = {
    val bi = docs.withColumn("_w", split(col("text"), " "))
      .filter(size(col("_w")) >= 2)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(_w) - 2), " +
          "i -> struct(_w[i] AS t1, _w[i+1] AS t2))")).as(Seq("pos", "b")))
      .select(col("doc_id"), col("pos"), col("b.t1"), col("b.t2"))
    val toks = docs.select(explode(split(col("text"), " ")).as("t1"))
    val uni = toks.groupBy("t1").agg(count(lit(1)).as("c1"))
    val vocab = toks.agg(countDistinct(col("t1")).as("v"))
    val pair = bi.groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
    bi.join(pair, Seq("t1", "t2"))
      .join(uni, Seq("t1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"),
        (-log2((col("c12").cast("double") + lit(1.0)) /
          (col("c1").cast("double") + col("v")))).as("nlp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        array_sort(collect_list(struct(col("pos"), col("nlp")))).as("_s"))
      .select(col("doc_id"), col("n_bigrams"),
        (expr("aggregate(_s, 0D, (acc, x) -> acc + x.nlp)") /
          col("n_bigrams")).as("bigram_nll"))
  }

  /** Collocation mining: adjacent-bigram pointwise mutual information
    * PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p over the corpus bigram /
    * unigram totals — the multi-word-expression detector (Church & Hanks
    * 1990) tokenizer-training runs use to decide merge candidates. Only
    * bigrams seen ≥ `minCount` times qualify (PMI of rare pairs is noise);
    * top `k` by PMI, ranked on the unrounded double, ties broken (t1, t2).
    *
    * Scale shape: per-doc adjacent pairs are a narrow array transform
    * (docs with <2 tokens contribute nothing), exploded into ONE
    * bigram-keyed partial+final aggregate; unigram counts and the two
    * scalar totals reduce the same way, and the unigram table joins back
    * onto the (already minCount-thinned) bigram frame twice — broadcast
    * when the vocab is small, plain shuffle join at web-corpus vocab. */
  def collocations(docs: DataFrame, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
    val uni = toks.groupBy("t").agg(count(lit(1)).as("c"))
    val tUni = toks.agg(count(lit(1)).as("t_un"))
    val bi = docs
      .withColumn("_w", split(col("text"), " "))
      .filter(size(col("_w")) >= 2)
      .select(explode(expr(
        // _w[i] is 0-based in Spark SQL: i ranges over 0..n-2
        "transform(sequence(0, size(_w) - 2), " +
          "i -> struct(_w[i] AS t1, _w[i+1] AS t2))")).as("b"))
      .select(col("b.t1"), col("b.t2"))
    val tBi = bi.agg(count(lit(1)).as("t_bi"))
    val pairCounts = bi.groupBy("t1", "t2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val pmi =
      log((col("n_pair").cast("double") / col("t_bi")) /
        ((col("c_a").cast("double") / col("t_un")) *
          (col("c_b").cast("double") / col("t_un"))))
    pairCounts
      .join(uni.select(col("t").as("t1"), col("c").as("c_a")), Seq("t1"))
      .join(uni.select(col("t").as("t2"), col("c").as("c_b")), Seq("t2"))
      .crossJoin(broadcast(tUni))
      .crossJoin(broadcast(tBi))
      .select(col("t1"), col("t2"), col("n_pair"), col("c_a"), col("c_b"),
        pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(k)
  }
}
