package graft.oracle

import graft.Params
import graft.text.{Dedup, TextStats}

/** DuckDB oracle SQL for the text / dedup / similarity / multimodal queries.
  * Mirrors graft.text.* / graft.sim.* arithmetic exactly; md5-based hashing
  * and sequential-fold dot products are engine-portable by construction.
  */
object TextSimSql {

  // floor-form rounding (see graft.queries.Core.r6): identical IEEE ops in
  // both engines, immune to the round()-goes-through-decimal-string ties;
  // the |x| > 9e9 guard mirrors Spark's (long-returning floor would clamp)
  private[oracle] def r(e: String) =
    s"CASE WHEN abs(($e)) > 9000000000.0 THEN ($e) " +
      s"ELSE floor(($e) * 1000000 + 0.5) / 1000000 END"
  private def list(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Raw quality-score expression over the s2 stats CTE (unrounded — the
    * curation filter compares it raw on both sides). */
  private[oracle] val qualityExpr: String =
    "(1.0 - punct_ratio) * 0.4 + stopword_ratio * 0.3 + " +
      "CAST(least(ws_tokens, 100) AS DOUBLE) / 100 * 0.3"

  /** CTE body (no WITH prefix) ending in s2: per-doc token/ratio stats. */
  private[oracle] val statsCtesBody: String = {
    val stop = list(TextStats.Stopwords)
    s"""s AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
       |), s2 AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS ws_tokens,
       |    CAST(len(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS re_tokens,
       |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |    CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS DOUBLE) / len(toks) AS stopword_ratio,
       |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(toks) AS avg_token_len
       |  FROM s
       |)""".stripMargin
  }

  val textStats: String =
    s"""WITH $statsCtesBody
       |SELECT doc_id, ws_tokens, re_tokens,
       |  ${r("punct_ratio")} AS punct_ratio,
       |  ${r("stopword_ratio")} AS stopword_ratio,
       |  ${r("avg_token_len")} AS avg_token_len,
       |  ${r(qualityExpr)} AS quality_score
       |FROM s2 ORDER BY doc_id""".stripMargin

  val textLangid: String = {
    val scores = TextStats.LangMarkers.map { case (l, ms) =>
      s"CAST(len(list_filter(toks, t -> list_contains(${list(ms)}, t))) AS BIGINT) AS score_$l"
    }.mkString(",\n    ")
    val langs = TextStats.LangMarkers.map(_._1)
    val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val pred = langs.init.map(l => s"WHEN score_$l = m THEN '$l'")
      .mkString("CASE ", " ", s" ELSE '${langs.last}' END")
    s"""WITH s AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
       |), sc AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM s
       |), m AS (
       |  SELECT *, $best AS m FROM sc
       |)
       |SELECT doc_id, $pred AS predicted_lang, lang,
       |       CAST(($pred) = lang AS INT) AS is_correct
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Mirrors TextStats.withGopherQuality: identical signal arithmetic
    * (replace-and-measure symbol counts, list_filter alpha words,
    * list_contains stopword hits), flags compare the same unrounded
    * doubles, rounding applied only to the emitted signals. */
  val qualityGopher: String = {
    val T = TextStats
    val stopHits = T.GopherStopwords
      .map(w => s"CAST(list_contains(toks, '$w') AS BIGINT)")
      .mkString(" + ")
    s"""WITH g AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
       |), g2 AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS mean_word_len,
       |    (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) +
       |     CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0)
       |      / len(toks) AS symbol_word_ratio,
       |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
       |      / len(toks) AS alpha_word_frac,
       |    $stopHits AS stop_hits
       |  FROM g
       |), g3 AS (
       |  SELECT *,
       |    n_words >= ${T.GopherMinWords} AND n_words <= ${T.GopherMaxWords} AS pw,
       |    mean_word_len >= ${T.GopherMinMeanLen} AND mean_word_len <= ${T.GopherMaxMeanLen} AS pl,
       |    symbol_word_ratio <= ${T.GopherMaxSymbolRatio} AS ps,
       |    alpha_word_frac >= ${T.GopherMinAlphaFrac} AS pa,
       |    stop_hits >= ${T.GopherMinStopHits} AS pst
       |  FROM g2
       |)
       |SELECT doc_id, n_words,
       |  ${r("mean_word_len")} AS mean_word_len,
       |  ${r("symbol_word_ratio")} AS symbol_word_ratio,
       |  ${r("alpha_word_frac")} AS alpha_word_frac,
       |  stop_hits,
       |  CAST(pw AS INT) AS pass_words, CAST(pl AS INT) AS pass_word_len,
       |  CAST(ps AS INT) AS pass_symbols, CAST(pa AS INT) AS pass_alpha,
       |  CAST(pst AS INT) AS pass_stopwords,
       |  CAST(pw AND pl AND ps AND pa AND pst AS INT) AS keep
       |FROM g3 ORDER BY doc_id""".stripMargin
  }

  /** Mirrors TextStats.repetition: DuckDB's `/` on integers is float
    * division (NULL-free here: n_tokens >= 1, n_bigrams >= 1 or the whole
    * row side is NULL via the left join, exactly like Spark's). range(1,
    * len(toks)) is empty for 1-token docs — they drop from bg like Spark's
    * guarded empty-array explode. */
  /** Mirrors TextStats.lexicalDiversity: exact integer counts through the
    * same explode → per-(doc, token) count → per-doc aggregate chain; only
    * the three final ratios are doubles. */
  val textTtr: String =
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
       |), pt AS (
       |  SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
       |), ag AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |         COUNT(*) AS n_types,
       |         COUNT(CASE WHEN c = 1 THEN 1 END) AS n_hapax
       |  FROM pt GROUP BY 1
       |)
       |SELECT doc_id, n_tokens, n_types, n_hapax,
       |       ${r("CAST(n_types AS DOUBLE) / n_tokens")} AS ttr,
       |       ${r("CAST(n_types AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE))")} AS root_ttr,
       |       ${r("CAST(n_hapax AS DOUBLE) / n_types")} AS hapax_frac
       |FROM ag ORDER BY doc_id""".stripMargin

  /** Mirrors TextStats.zipfFit: same top-k spectrum (count-desc,
    * token tie-break), the four regression sums replayed as sequential
    * list_sum folds over rank order — bit-equal to Spark's running-window
    * accumulation — and the identical slope/intercept tree. */
  val corpusZipf: String =
    s"""WITH tok AS (
       |  SELECT UNNEST(string_split(text, ' ')) AS t FROM documents
       |), wc AS (
       |  SELECT t, COUNT(*) AS c FROM tok GROUP BY 1
       |), topk AS (
       |  SELECT t, c FROM wc ORDER BY c DESC, t LIMIT 100
       |), rk AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk, c FROM topk
       |), tm AS (
       |  SELECT rnk, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
       |  FROM rk
       |), ag AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |         COALESCE(list_sum(list(x ORDER BY rnk)), 0.0) AS sx,
       |         COALESCE(list_sum(list(y ORDER BY rnk)), 0.0) AS sy,
       |         COALESCE(list_sum(list(x * x ORDER BY rnk)), 0.0) AS sxx,
       |         COALESCE(list_sum(list(x * y ORDER BY rnk)), 0.0) AS sxy
       |  FROM tm
       |)
       |SELECT CAST(n AS BIGINT) AS n_types,
       |       ${r("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS zipf_slope,
       |       ${r("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n")} AS zipf_intercept
       |FROM ag""".stripMargin

  /** Mirrors TextSim.corpusHeaps / TextStats.heapsFit: the same per-type
    * first-doc and per-doc token counts (exact integers), the same
    * doc-ordered growth curve, and the same fixed-fold regression sums
    * (ORDER-BY list fold ↔ Spark's left-to-right running window sum). */
  val corpusHeaps: String =
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
       |), nt AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM (
       |    SELECT t, MIN(doc_id) AS doc_id FROM tok GROUP BY 1)
       |  GROUP BY 1
       |), dl AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks FROM tok GROUP BY 1
       |), pts AS (
       |  SELECT doc_id,
       |         CAST(SUM(n_toks) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_tokens,
       |         CAST(SUM(nt) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_types
       |  FROM (SELECT dl.doc_id, dl.n_toks, COALESCE(nt.nt, 0) AS nt
       |        FROM dl LEFT JOIN nt USING (doc_id))
       |), tm AS (
       |  SELECT doc_id, ln(CAST(cum_tokens AS DOUBLE)) AS x,
       |         ln(CAST(cum_types AS DOUBLE)) AS y
       |  FROM pts WHERE cum_tokens >= 1 AND cum_types >= 1
       |), ag AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |         COALESCE(list_sum(list(x ORDER BY doc_id)), 0.0) AS sx,
       |         COALESCE(list_sum(list(y ORDER BY doc_id)), 0.0) AS sy,
       |         COALESCE(list_sum(list(x * x ORDER BY doc_id)), 0.0) AS sxx,
       |         COALESCE(list_sum(list(x * y ORDER BY doc_id)), 0.0) AS sxy
       |  FROM tm
       |)
       |SELECT CAST(n AS BIGINT) AS n_points,
       |       ${r("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS heaps_beta,
       |       ${r("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n")} AS heaps_ln_k
       |FROM ag""".stripMargin

  /** Mirrors TextSim.textReadability: identical vowel-run syllable floor
    * (list_transform + greatest(…, 1)), the same `[.!?]+` sentence runs
    * floored at one, and the Flesch/FKGL formulas written in the same
    * association order — the integer counts agree exactly, so the only
    * float surface is the two final formulas. */
  val textReadability: String =
    s"""WITH s AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |    greatest(CAST(len(toks) AS BIGINT), 1) AS n_words,
       |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+', 0)) AS BIGINT), 1)
       |      AS n_sentences,
       |    CAST(COALESCE(list_sum(list_transform(toks,
       |      t -> greatest(len(regexp_extract_all(t, '[aeiouy]+', 0)), 1))), 0)
       |      AS BIGINT) AS n_syllables
       |  FROM s
       |)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  ${r("206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)")} AS flesch,
       |  ${r("0.39 * (CAST(n_words AS DOUBLE) / n_sentences) + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59")} AS fkgl
       |FROM c ORDER BY doc_id""".stripMargin

  val textRepetition: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), tok AS (
       |  SELECT doc_id, UNNEST(toks) AS t FROM s
       |), ts AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |         COUNT(DISTINCT t) AS n_distinct_tokens
       |  FROM tok GROUP BY 1
       |), bg AS (
       |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
       |  FROM s, UNNEST(range(1, len(toks))) u(i)
       |), bgc AS (
       |  SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2
       |), bgs AS (
       |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       |         MAX(n) AS top_bigram_n,
       |         CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_bigram_n
       |  FROM bgc GROUP BY 1
       |)
       |SELECT ts.doc_id, ts.n_tokens,
       |  ${r("CAST(n_tokens - n_distinct_tokens AS DOUBLE) / n_tokens")} AS dup_token_frac,
       |  ${r("CAST(top_bigram_n AS DOUBLE) / n_bigrams")} AS top_bigram_frac,
       |  ${r("CAST(dup_bigram_n AS DOUBLE) / n_bigrams")} AS dup_bigram_frac
       |FROM ts LEFT JOIN bgs ON ts.doc_id = bgs.doc_id
       |ORDER BY ts.doc_id""".stripMargin

  /** Mirrors Corpus.qualityQuota(frac=0.5): per-source rank by the RAW
    * quality score (identical fp expression both sides, so the ordering
    * comparisons see identical doubles), doc_id tie-break, keep
    * rank <= ceil(n·frac). */
  val qualityQuota: String =
    s"""WITH $statsCtesBody, q AS (
       |  SELECT s2.doc_id, d.source, $qualityExpr AS quality_score
       |  FROM s2 JOIN documents d ON d.doc_id = s2.doc_id
       |), rk AS (
       |  SELECT doc_id, source, quality_score,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |           ORDER BY quality_score DESC, doc_id) AS rnk,
       |         COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM q
       |)
       |SELECT doc_id, source, CAST(rnk AS BIGINT) AS quality_rank,
       |       ${r("quality_score")} AS quality_score
       |FROM rk WHERE rnk <= ceil(n * 0.5) ORDER BY doc_id""".stripMargin

  /** Mirrors Corpus.curriculum(buckets=10): global quality rank on the RAW
    * score → decile via exact integer division → md5-draw shuffle within
    * decile → global curriculum rank. The Spark side's two bucketed
    * numberings reproduce both ROW_NUMBERs exactly. */
  val corpusCurriculum: String =
    s"""WITH $statsCtesBody, q AS (
       |  SELECT doc_id, $qualityExpr AS quality_score FROM s2
       |), r1 AS (
       |  SELECT doc_id,
       |         ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS qrn,
       |         COUNT(*) OVER () AS n
       |  FROM q
       |), d AS (
       |  SELECT doc_id, CAST(1 + ((qrn - 1) * 10) // n AS BIGINT) AS decile,
       |         md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM r1
       |)
       |SELECT doc_id, decile,
       |       ROW_NUMBER() OVER (ORDER BY decile, ($hexDecode), doc_id) AS curriculum_rank
       |FROM d ORDER BY doc_id""".stripMargin

  /** Mirrors TextStats.charEntropy: H = log2(n) − (Σ c·log2(c)) / n over
    * per-character counts; the one float sum is a sequential fold over the
    * character-sorted count list (list_sum over an ORDER BY ch aggregate),
    * matching Spark's aggregate() fold over the array_sort'ed pairs. */
  val textEntropy: String =
    s"""WITH ch AS (
       |  SELECT doc_id, substring(text, i, 1) AS ch
       |  FROM documents, UNNEST(range(1, length(text) + 1)) u(i)
       |), cc AS (
       |  SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2
       |), pd AS (
       |  SELECT doc_id,
       |         CAST(SUM(c) AS BIGINT) AS n_chars,
       |         CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       |         list_sum(list_transform(list(c ORDER BY ch),
       |           x -> CAST(x AS DOUBLE) * log2(CAST(x AS DOUBLE)))) AS ent
       |  FROM cc GROUP BY doc_id
       |)
       |SELECT doc_id, n_chars, n_distinct_chars,
       |       ${r("log2(CAST(n_chars AS DOUBLE)) - ent / CAST(n_chars AS DOUBLE)")} AS char_entropy
       |FROM pd ORDER BY doc_id""".stripMargin

  /** Mirrors TextStats.unigramLogprob: corpus unigram counts + scalar total,
    * per-token −log2(c/total), per-doc mean via the position-sorted
    * sequential fold (list_sum over ORDER BY pos == Spark's aggregate()
    * over the array_sort'ed (pos, nlp) structs). */
  /** Mirrors TextSim.corpusDsir / TextStats.dsirWeights: one token pass
    * carrying the target indicator, identical add-1 smoothing over the raw
    * vocabulary, and the position-ordered list_sum fold matching Spark's
    * sorted-struct sequential aggregate. */
  val corpusDsir: String =
    s"""WITH s AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
       |), t AS (
       |  SELECT doc_id, source IN ('src0', 'src1') AS tgt,
       |         i - 1 AS pos, toks[i] AS token
       |  FROM s, UNNEST(range(1, len(toks) + 1)) u(i)
       |), c AS (
       |  SELECT token, COUNT(*) AS cr,
       |         COUNT(*) FILTER (WHERE tgt) AS ct
       |  FROM t GROUP BY token
       |), sc AS (
       |  SELECT SUM(cr) AS tr, SUM(ct) AS tt, COUNT(*) AS v FROM c
       |), lw AS (
       |  SELECT token,
       |         ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + v AS DOUBLE))
       |           - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + v AS DOUBLE)) AS lw
       |  FROM c CROSS JOIN sc
       |), j AS (
       |  SELECT doc_id, pos, lw FROM t JOIN lw USING (token)
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       ${r("list_sum(list(lw ORDER BY pos))")} AS log_weight,
       |       ${r("list_sum(list(lw ORDER BY pos)) / COUNT(*)")} AS avg_log_weight
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val textLogprob: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), t AS (
       |  SELECT doc_id, i - 1 AS pos, toks[i] AS token
       |  FROM s, UNNEST(range(1, len(toks) + 1)) u(i)
       |), c AS (
       |  SELECT token, COUNT(*) AS c FROM t GROUP BY token
       |), n AS (
       |  SELECT COUNT(*) AS n_total FROM t
       |), j AS (
       |  SELECT doc_id, pos,
       |         -log2(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)) AS nlp
       |  FROM t JOIN c USING (token) CROSS JOIN n
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       ${r("list_sum(list(nlp ORDER BY pos)) / COUNT(*)")} AS avg_neg_logprob
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirrors Similarity.randomProject(dims=8): identical md5-derived ±1
    * planes (key base 100), sequential-fold dots, 1/√8 scale. */
  val simRproj: String = {
    import graft.sim.{Similarity => S}
    def planeList(d: Int): String =
      S.lshPlane(100 + d, 64).map(x => if (x > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
    val cols = (0 until S.RprojDims).map { d =>
      val e = s"list_sum(list_transform(range(1, len(v) + 1), " +
        s"i -> v[i] * (${planeList(d)})[i])) / sqrt(8.0)"
      s"${r(e)} AS rp_$d"
    }.mkString(",\n       ")
    s"""WITH e0 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |)
       |SELECT vec_id,
       |       $cols
       |FROM e0 ORDER BY vec_id""".stripMargin
  }

  /** Mirrors TextStats.hashFeatures(dim=64): identical md5-prefix bucketing
    * (('0x'||hex)::BIGINT == Spark's conv(hex,16,10) for 8 hex chars) and
    * 9th-digit-parity sign; integer counts, nothing fp-sensitive. */
  val mlHashFeatures: String = {
    val dim = graft.text.TextStats.HashDim
    s"""WITH t AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
       |), h AS (
       |  SELECT doc_id, md5(token) AS h FROM t
       |), b AS (
       |  SELECT doc_id,
       |         ('0x' || substring(h, 1, 8))::BIGINT % $dim AS bucket,
       |         CASE WHEN ('0x' || substring(h, 9, 1))::BIGINT % 2 = 0
       |              THEN 1 ELSE -1 END AS sgn
       |  FROM h
       |)
       |SELECT doc_id, bucket,
       |       CAST(COUNT(*) AS BIGINT) AS tf,
       |       CAST(SUM(sgn) AS BIGINT) AS signed_tf
       |FROM b GROUP BY doc_id, bucket
       |ORDER BY doc_id, bucket""".stripMargin
  }

  /** Mirrors TextStats.vocab(k=100): token occurrence + doc-frequency counts,
    * top 100 by (count desc, token asc) — integer counts and exact string
    * keys, nothing engine-sensitive. */
  val corpusVocab: String =
    s"""WITH t AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
       |)
       |SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
       |FROM t GROUP BY token
       |ORDER BY n_occurrences DESC, token LIMIT 100""".stripMargin

  /** Mirrors Corpus.stripDupSpans(spanTokens=8, maxDocs=3): non-overlapping
    * 8-token spans, corpus-wide distinct-doc counts, drop spans in >= 3
    * docs, rebuild each doc's text from the surviving spans in order
    * (string_agg ORDER BY span_idx == Spark's array_sort(collect_list) +
    * array_join — exact string equality, no fp anywhere). */
  val dedupSpans: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), b AS (
       |  SELECT doc_id, i AS span_idx,
       |         array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' ') AS span
       |  FROM s, UNNEST(range(0, (len(toks) + 7) // 8)) u(i)
       |), cnt AS (
       |  SELECT span, COUNT(DISTINCT doc_id) AS n_docs FROM b GROUP BY span
       |), k AS (
       |  SELECT b.doc_id, b.span_idx, b.span, (cnt.n_docs >= 3) AS drop_it
       |  FROM b JOIN cnt USING (span)
       |)
       |SELECT doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_spans,
       |       CAST(SUM(CASE WHEN drop_it THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_dropped,
       |       COALESCE(string_agg(CASE WHEN NOT drop_it THEN span END, ' ' ORDER BY span_idx), '') AS clean_text
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirrors Corpus.stripDupSpansMaximal: the dedupSpans flagging plus
    * gaps-and-islands run detection — run_start = dropped span whose
    * predecessor (by span_idx) is not dropped; run id = running sum of
    * starts; max_run_spans = the longest per-doc island of dropped spans.
    * All-integer/window logic, no fp anywhere. */
  val dedupSpansMaximal: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), b AS (
       |  SELECT doc_id, i AS span_idx,
       |         array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' ') AS span
       |  FROM s, UNNEST(range(0, (len(toks) + 7) // 8)) u(i)
       |), cnt AS (
       |  SELECT span, COUNT(DISTINCT doc_id) AS n_docs FROM b GROUP BY span
       |), k AS (
       |  SELECT b.doc_id, b.span_idx, b.span, (cnt.n_docs >= 3) AS drop_it
       |  FROM b JOIN cnt USING (span)
       |), rs AS (
       |  SELECT *, (drop_it AND COALESCE(NOT LAG(drop_it) OVER (
       |           PARTITION BY doc_id ORDER BY span_idx), TRUE)) AS run_start
       |  FROM k
       |), ri AS (
       |  SELECT *, SUM(CASE WHEN run_start THEN 1 ELSE 0 END) OVER (
       |           PARTITION BY doc_id ORDER BY span_idx
       |           ROWS UNBOUNDED PRECEDING) AS run_id
       |  FROM rs
       |), runs AS (
       |  SELECT doc_id, run_id, COUNT(*) AS run_len
       |  FROM ri WHERE drop_it GROUP BY 1, 2
       |), mr AS (
       |  SELECT doc_id, MAX(run_len) AS max_run_spans FROM runs GROUP BY 1
       |), agg AS (
       |  SELECT doc_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_spans,
       |         CAST(SUM(CASE WHEN drop_it THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_dropped,
       |         CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_runs_dropped,
       |         COALESCE(string_agg(CASE WHEN NOT drop_it THEN span END, ' ' ORDER BY span_idx), '') AS clean_text
       |  FROM ri GROUP BY doc_id
       |)
       |SELECT agg.doc_id, n_spans, n_spans_dropped, n_runs_dropped,
       |       CAST(COALESCE(mr.max_run_spans, 0) AS BIGINT) AS max_run_spans,
       |       clean_text
       |FROM agg LEFT JOIN mr USING (doc_id) ORDER BY agg.doc_id""".stripMargin

  /** Mirrors Corpus.chunk (chunkSize=32, stride=24): window offsets 0, 24,
    * 48, … — keep a window iff it is the first or the previous window ended
    * before the document did. DuckDB range() excludes the stop like Spark's
    * sequence(0, n-1, step) includes values < n; list_slice's inclusive
    * 1-based clamp matches Spark slice(start, length). */
  val docChunks: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), st AS (
       |  SELECT doc_id, toks, UNNEST(range(0, len(toks), 24)) AS st FROM s
       |), f AS (
       |  SELECT doc_id, toks, st FROM st WHERE st = 0 OR st - 24 + 32 < len(toks)
       |)
       |SELECT doc_id,
       |  CAST(st // 24 AS BIGINT) AS chunk_idx,
       |  CAST(st AS BIGINT) AS chunk_start,
       |  CAST(len(list_slice(toks, st + 1, st + 32)) AS BIGINT) AS n_chunk_tokens,
       |  array_to_string(list_slice(toks, st + 1, st + 32), ' ') AS chunk_text
       |FROM f ORDER BY doc_id, chunk_idx""".stripMargin

  /** Mirrors Corpus.packSequences (capacity=512): the oracle runs the plain
    * single-window running sum the Spark side reproduces via the bucketed
    * offsets (integer addition — bit-identical under regrouping). */
  val packSequences: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS pk
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(SUM(n_tokens) OVER (ORDER BY pk, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
       |  FROM t
       |)
       |SELECT doc_id, n_tokens,
       |  CAST((cum_end - n_tokens) // 512 AS BIGINT) AS bin_id,
       |  CAST((cum_end - n_tokens) % 512 AS BIGINT) AS bin_offset
       |FROM c ORDER BY doc_id""".stripMargin

  /** Mirrors Corpus.mixtureSample (budgetFrac=0.5): identical IEEE double
    * expression for the per-source rate, integer-compared md5 draw. */
  val corpusMixture: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents
       |), src AS (
       |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
       |  FROM t GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |         COUNT(DISTINCT source) AS n_sources
       |  FROM t
       |), rates AS (
       |  SELECT source,
       |    least(CAST(1.0 AS DOUBLE),
       |      CAST(total_tokens AS DOUBLE) * 0.5 / n_sources / src_tokens) AS sample_rate
       |  FROM src CROSS JOIN tot
       |)
       |SELECT doc_id, source, n_tokens, ${r("sample_rate")} AS sample_rate
       |FROM t JOIN rates USING (source)
       |WHERE ($hexDecode) < CAST(floor(sample_rate * 4294967296.0) AS BIGINT)
       |ORDER BY doc_id""".stripMargin

  /** Mirrors TextStats.ngramNovelty (n=3): same contiguous-trigram
    * construction (1-based inclusive slices joined with a space), exact
    * MIN-doc first-occurrence table, integer counts, null novelty for
    * gramless docs. */
  val corpusNovelty: String = {
    val n = TextStats.NoveltyGram
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), g AS (
       |  SELECT doc_id, UNNEST(
       |    CASE WHEN len(toks) >= $n
       |         THEN list_transform(range(1, len(toks) - ${n - 1} + 1),
       |                i -> array_to_string(toks[i:i + ${n - 1}], ' '))
       |         ELSE [] END) AS gm
       |  FROM s
       |), fd AS (
       |  SELECT gm, MIN(doc_id) AS first_doc FROM g GROUP BY 1
       |), pd AS (
       |  SELECT g.doc_id, COUNT(*) AS n_grams,
       |         COUNT(CASE WHEN fd.first_doc = g.doc_id THEN 1 END) AS n_novel
       |  FROM g JOIN fd USING (gm) GROUP BY 1
       |)
       |SELECT d.doc_id,
       |       COALESCE(pd.n_grams, 0) AS n_grams,
       |       COALESCE(pd.n_novel, 0) AS n_novel,
       |       ${r("CASE WHEN COALESCE(pd.n_grams, 0) = 0 THEN NULL ELSE CAST(COALESCE(pd.n_novel, 0) AS DOUBLE) / pd.n_grams END")} AS novelty
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Mirrors Corpus.temperatureSample: α = ½ via IEEE sqrt (pow is not
    * correctly rounded cross-engine; sqrt is), Σ√n folded in source order
    * with a sequential list_sum — the rate gates row MEMBERSHIP through
    * the hash draw, so its doubles must match bit-for-bit, not just to
    * 6 decimals. */
  val corpusTemperature: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents
       |), src AS (
       |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
       |  FROM t GROUP BY 1
       |), zz AS (
       |  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
       |         COALESCE(list_sum(list(sqrt(CAST(src_tokens AS DOUBLE)) ORDER BY source)), 0.0) AS z
       |  FROM src
       |), rates AS (
       |  SELECT source,
       |    least(CAST(1.0 AS DOUBLE),
       |      CAST(total_tokens AS DOUBLE) * 0.5 *
       |        (sqrt(CAST(src_tokens AS DOUBLE)) / z) / src_tokens) AS sample_rate
       |  FROM src CROSS JOIN zz
       |)
       |SELECT doc_id, source, n_tokens, ${r("sample_rate")} AS sample_rate
       |FROM t JOIN rates USING (source)
       |WHERE ($hexDecode) < CAST(floor(sample_rate * 4294967296.0) AS BIGINT)
       |ORDER BY doc_id""".stripMargin

  /** Mirrors TextStats.redactPii: the same ordered pattern list
    * (TextStats.PiiPatterns — single source of truth for both engines),
    * each class counted against the text as already rewritten by earlier
    * classes, digest over the final string. */
  val textRedact: String = {
    val steps = TextStats.PiiPatterns.zipWithIndex.map {
      case ((name, pat, token), i) =>
        val prior = TextStats.PiiPatterns.take(i).map(p => s"n_${p._1}, ")
          .mkString
        s"""s${i + 1} AS (
           |  SELECT doc_id, $prior
           |    CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$name,
           |    regexp_replace(t, '$pat', '$token', 'g') AS t
           |  FROM s$i
           |)""".stripMargin
    }
    val names = TextStats.PiiPatterns.map(p => s"n_${p._1}").mkString(", ")
    s"""WITH s0 AS (
       |  SELECT doc_id, text AS t FROM documents
       |), ${steps.mkString(", ")}
       |SELECT doc_id, $names, md5(t) AS redacted_md5
       |FROM s${TextStats.PiiPatterns.size} ORDER BY doc_id""".stripMargin
  }

  /** Mirrors TextSim.textPiiSummary: the same progressive redact-count
    * chain as [[textRedact]], unpivoted per class and aggregated per
    * source — all-integer output. */
  val textPiiSummary: String = {
    val steps = TextStats.PiiPatterns.zipWithIndex.map {
      case ((name, pat, token), i) =>
        val prior = TextStats.PiiPatterns.take(i).map(p => s"n_${p._1}, ")
          .mkString
        s"""s${i + 1} AS (
           |  SELECT doc_id, $prior
           |    CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$name,
           |    regexp_replace(t, '$pat', '$token', 'g') AS t
           |  FROM s$i
           |)""".stripMargin
    }
    val legs = TextStats.PiiPatterns.map { case (name, _, _) =>
      s"SELECT doc_id, '$name' AS pii_type, n_$name AS n FROM sN"
    }.mkString("\n  UNION ALL ")
    s"""WITH s0 AS (
       |  SELECT doc_id, text AS t FROM documents
       |), ${steps.mkString(", ")}, sN AS (
       |  SELECT * FROM s${TextStats.PiiPatterns.size}
       |), u AS (
       |  $legs
       |)
       |SELECT d.source, u.pii_type, CAST(SUM(u.n) AS BIGINT) AS n_hits,
       |       COUNT(*) FILTER (WHERE u.n > 0) AS n_docs_affected
       |FROM u JOIN documents d USING (doc_id)
       |GROUP BY d.source, u.pii_type
       |ORDER BY d.source, u.pii_type""".stripMargin
  }

  /** Mirrors Dedup.sharedNgramPairs (w=8, minShared=1): distinct per-doc
    * 8-token-window md5s, equi-join on the gram, per-pair count. */
  val dedupSharedNgrams: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), g0 AS (
       |  SELECT doc_id, md5(array_to_string(list_slice(w, i, i + 7), ' ')) AS g
       |  FROM t, UNNEST(range(1, len(w) - 7 + 1)) u(i)
       |  WHERE len(w) >= 8
       |), g AS (
       |  SELECT DISTINCT doc_id, g FROM g0
       |)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM g x JOIN g y ON x.g = y.g AND x.doc_id < y.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= 1
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Mirrors Dedup.duplicationDensity: same md5 8-token windows (distinct
    * per doc), df ≥ 2 bit per gram, per-doc fraction. */
  val dedupDensity: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), g0 AS (
       |  SELECT doc_id, md5(array_to_string(list_slice(w, i, i + 7), ' ')) AS g
       |  FROM t, UNNEST(range(1, len(w) - 7 + 1)) u(i)
       |  WHERE len(w) >= 8
       |), g AS (
       |  SELECT DISTINCT doc_id, g FROM g0
       |), df AS (
       |  SELECT g, CAST(COUNT(*) >= 2 AS INT) AS dup FROM g GROUP BY 1
       |)
       |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |       CAST(SUM(df.dup) AS BIGINT) AS n_dup_grams,
       |       ${r("CAST(SUM(df.dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS dup_density
       |FROM g JOIN df USING (g)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Mirrors Dedup.boilerplate: same md5 8-token windows (distinct per
    * doc), source-scoped doc frequency, template bit = df ≥ 2 AND
    * df ≥ 0.05·(source's eligible docs), per-doc template fraction. */
  val textBoilerplate: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
       |), g0 AS (
       |  SELECT doc_id, source, md5(array_to_string(list_slice(w, i, i + 7), ' ')) AS g
       |  FROM t, UNNEST(range(1, len(w) - 7 + 1)) u(i)
       |  WHERE len(w) >= 8
       |), g AS (
       |  SELECT DISTINCT doc_id, source, g FROM g0
       |), nd AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nd
       |  FROM t WHERE len(w) >= 8 GROUP BY 1
       |), tpl AS (
       |  SELECT g.source, g.g,
       |         CAST(COUNT(*) >= 2 AND
       |              CAST(COUNT(*) AS DOUBLE) >= 0.05 * CAST(nd.nd AS DOUBLE)
       |           AS INT) AS tpl
       |  FROM g JOIN nd USING (source)
       |  GROUP BY g.source, g.g, nd.nd
       |)
       |SELECT g.doc_id, g.source, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |       CAST(SUM(tpl.tpl) AS BIGINT) AS n_tpl_grams,
       |       ${r("CAST(SUM(tpl.tpl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS boilerplate_ratio
       |FROM g JOIN tpl ON tpl.source = g.source AND tpl.g = g.g
       |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  val textTfidf: String =
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
       |), dl AS (
       |  SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY 1
       |), tf AS (
       |  SELECT doc_id, term, COUNT(*) AS n_occ FROM toks GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY 1
       |), nd AS (
       |  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
       |)
       |SELECT doc_id, term,
       |       ${r("CAST(n_occ AS DOUBLE) / n_toks * ln(CAST(n_docs AS DOUBLE) / doc_freq)")} AS tfidf
       |FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd
       |ORDER BY doc_id, term""".stripMargin

  /** Mirrors Dedup.crossSourceDups: distinct (md5, source) pairs, a
    * hash-keyed self-join bounded by the source count, exact counts. */
  val dedupCrossSource: String =
    """WITH p AS (
      |  SELECT DISTINCT md5(text) AS h, source FROM documents
      |), shared AS (
      |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
      |  FROM p a JOIN p b ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2
      |), srcs AS (SELECT DISTINCT source FROM documents)
      |SELECT x.source AS source_a, y.source AS source_b,
      |       COALESCE(shared.n_shared, 0) AS n_shared
      |FROM srcs x JOIN srcs y ON x.source < y.source
      |LEFT JOIN shared ON shared.source_a = x.source AND shared.source_b = y.source
      |ORDER BY source_a, source_b""".stripMargin

  /** Mirrors TextSim.textKeywords (k=3): the tfidf chain plus the same
    * (tfidf desc, term) rank — tfidf doubles are identical cross-engine,
    * so the rank order is too. */
  val textKeywords: String =
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
       |), dl AS (
       |  SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY 1
       |), tf AS (
       |  SELECT doc_id, term, COUNT(*) AS n_occ FROM toks GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY 1
       |), nd AS (
       |  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
       |), sc AS (
       |  SELECT doc_id, term,
       |         CAST(n_occ AS DOUBLE) / n_toks * ln(CAST(n_docs AS DOUBLE) / doc_freq) AS tfidf
       |  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd
       |), rk AS (
       |  SELECT doc_id, term, tfidf,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
       |  FROM sc
       |)
       |SELECT doc_id, rk, term, ${r("tfidf")} AS tfidf
       |FROM rk WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin

  val simLabelCentroids: String =
    s"""WITH comps AS (
       |  SELECT label, i AS idx, AVG(CAST(embedding[i] AS DOUBLE)) AS m
       |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) u(i)
       |  GROUP BY 1, 2
       |), cents AS (
       |  SELECT label, list(m ORDER BY idx) AS c FROM comps GROUP BY 1
       |), cn AS (
       |  SELECT label, c, sqrt(${dot("c", "c")}) AS nc FROM cents
       |)
       |SELECT x.label AS label_a, y.label AS label_b,
       |       ${r(s"${dot("x.c", "y.c")} / (x.nc * y.nc)")} AS cos
       |FROM cn x JOIN cn y ON x.label < y.label
       |ORDER BY label_a, label_b""".stripMargin

  val textFingerprint: String =
    """SELECT doc_id,
      |  list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
      |    i -> md5(substring(text, i, 8)))) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  val dedupExact: String =
    """SELECT md5(text) AS text_md5, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin

  /** Mirrors Dedup.exactNorm: identical regex normalizer chain (the 'g'
    * flag is DuckDB's global-replace; Spark's regexp_replace is global by
    * default). */
  val dedupExactNorm: String =
    """WITH nn AS (
      |  SELECT doc_id, text,
      |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents
      |)
      |SELECT md5(norm) AS norm_md5, MIN(doc_id) AS canonical_id,
      |       COUNT(*) AS n_copies, COUNT(DISTINCT text) AS n_variants
      |FROM nn GROUP BY norm ORDER BY canonical_id""".stripMargin

  /** Bloom-decontamination replay: identical md5-slice positions
    * (('0x'||hex8)::BIGINT == Spark's conv(hex,16,10)), the set-bit list
    * from the eval side, 4 IN-probes for candidacy, exact-digest IN for the
    * confirmed flag. */
  val decontamBloom: String = {
    val m = Dedup.BloomBits
    def pos(j: Int) = s"('0x' || substring(h, ${j * 8 + 1}, 8))::BIGINT % $m"
    val posList = (0 until Dedup.BloomHashes).map(pos).mkString("[", ", ", "]")
    val probes = (0 until Dedup.BloomHashes)
      .map(j => s"${pos(j)} IN (SELECT p FROM bits)").mkString(" AND ")
    s"""WITH n AS (
       |  SELECT doc_id,
       |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
       |  FROM documents
       |), ev AS (
       |  SELECT h FROM n WHERE doc_id % 10 = 0
       |), tr AS (
       |  SELECT doc_id, h FROM n WHERE doc_id % 10 <> 0
       |), bits AS (
       |  SELECT DISTINCT UNNEST($posList) AS p FROM ev
       |)
       |SELECT doc_id, h AS norm_md5,
       |       CASE WHEN h IN (SELECT h FROM ev) THEN 1 ELSE 0 END AS confirmed
       |FROM tr WHERE $probes
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared shingle CTE: distinct word-3-grams per doc. */
  private val shinglesCte: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), sh0 AS (
      |  SELECT doc_id, concat_ws(' ', w[i], w[i + 1], w[i + 2]) AS shingle
      |  FROM t, UNNEST(range(1, greatest(len(w) - 2, 1) + 1)) u(i)
      |), sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM sh0
      |)""".stripMargin

  /** Integer decode of md5's first 8 hex digits (DuckDB has no conv();
    * Horner-free positional sum — same value as Spark's conv(h[1:8],16,10)).
    * A def, not a val: referenced by vals that initialize both above and
    * below this point in the object. */
  private def hexDecode: String =
    (0 until 8).map(i =>
      s"(instr('0123456789abcdef', substring(h, ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}")
      .mkString(" + ")

  private val sigSelect: String =
    (0 until Dedup.NumHashes).map(k =>
      s"MIN((${Dedup.hashA(k)} * vp + ${Dedup.hashB(k)}) % ${Dedup.HashP}) AS mh_$k")
      .mkString(",\n         ")

  /** (doc_id, vp): per distinct shingle, the universal-hash input value. */
  private val shingleValCte: String =
    s"""sv AS (
       |  SELECT doc_id, ($hexDecode) % ${Dedup.HashP} AS vp
       |  FROM (SELECT doc_id, md5(shingle) AS h FROM sh)
       |)""".stripMargin

  val dedupMinhash: String =
    s"""$shinglesCte, $shingleValCte
       |SELECT doc_id,
       |         $sigSelect
       |FROM sv GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** CTE chain ending in `pairs(doc_a, doc_b, jaccard)` — the verified
    * MinHash near-dup pair graph, shared by dedup_minhash_pairs and
    * dedup_clusters. MATERIALIZED: the clusters query scans it from both
    * edge directions and from inside a recursion. */
  /** Shingle → signature → banding → candidate → verified-pairs CTE chain,
    * ending in `pairs`. `candCond` picks the candidate-join shape: the
    * self-dedup triangle (`x.doc_id < y.doc_id`) or the cross-corpus
    * train/eval restriction the decontamination queries use. */
  private def minhashPairsCtesWith(candCond: String,
      pairsBody: String = defaultPairsBody): String = {
    val bands = (0 until Dedup.Bands).map { b =>
      val hs = (0 until Dedup.RowsPerBand).map(rr => s"mh_${b * Dedup.RowsPerBand + rr}")
      s"SELECT doc_id, $b AS band_idx, concat_ws('|', ${hs.mkString(", ")}) AS band_val FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""$shinglesCte, $shingleValCte, sig AS (
       |  SELECT doc_id,
       |         $sigSelect
       |  FROM sv GROUP BY doc_id
       |), banded AS (
       |  $bands
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM banded x JOIN banded y
       |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND $candCond
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT doc_a, doc_b, COUNT(*) AS n_inter
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b AND sa.shingle = sb.shingle
       |  GROUP BY doc_a, doc_b
       |), pairs AS MATERIALIZED (
       |  $pairsBody
       |)""".stripMargin
  }

  /** Jaccard-threshold pairs clause shared by the minhash/decontam CTEs. */
  private val defaultPairsBody: String =
    """SELECT doc_a, doc_b,
      |         CAST(n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - n_inter) AS jaccard
      |  FROM inter
      |  JOIN sizes za ON za.doc_id = doc_a
      |  JOIN sizes zb ON zb.doc_id = doc_b
      |  WHERE CAST(n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - n_inter) >= 0.5""".stripMargin

  /** Containment pairs clause (mirrors Dedup.containmentPairs): both
    * asymmetric containments + Jaccard, kept when the larger containment
    * clears 0.5. */
  private val containmentPairsBody: String =
    """SELECT doc_a, doc_b,
      |         CAST(n_inter AS DOUBLE) / za.n_sh AS containment_a,
      |         CAST(n_inter AS DOUBLE) / zb.n_sh AS containment_b,
      |         CAST(n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - n_inter) AS jaccard
      |  FROM inter
      |  JOIN sizes za ON za.doc_id = doc_a
      |  JOIN sizes zb ON zb.doc_id = doc_b
      |  WHERE GREATEST(CAST(n_inter AS DOUBLE) / za.n_sh,
      |                 CAST(n_inter AS DOUBLE) / zb.n_sh) >= 0.5""".stripMargin

  val dedupContainment: String =
    s"""${minhashPairsCtesWith("x.doc_id < y.doc_id", containmentPairsBody)}
       |SELECT doc_a, doc_b, ${r("containment_a")} AS containment_a,
       |       ${r("containment_b")} AS containment_b, ${r("jaccard")} AS jaccard
       |FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  private val minhashPairsCtes: String =
    minhashPairsCtesWith("x.doc_id < y.doc_id")

  val dedupMinhashPairs: String =
    s"""$minhashPairsCtes
       |SELECT doc_a, doc_b, ${r("jaccard")} AS jaccard
       |FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  /** Mirrors TextSim.dedupThresholdSweep: each verified pair joins the
    * threshold bins it clears; per-bin counts/distinct/min/max are
    * order-free, so no float-sum caveat applies. */
  val dedupThresholdSweep: String =
    s"""$minhashPairsCtes, sweep AS (
       |  SELECT p.doc_a, p.doc_b, p.jaccard, t.t10
       |  FROM pairs p CROSS JOIN generate_series(5, 9) AS t(t10)
       |  WHERE p.jaccard >= t.t10 / 10.0
       |), pr AS (
       |  SELECT t10, COUNT(*) AS n_pairs,
       |         MIN(jaccard) AS mnj, MAX(jaccard) AS mxj
       |  FROM sweep GROUP BY 1
       |), d AS (
       |  SELECT t10, COUNT(DISTINCT doc) AS n_dup_docs FROM (
       |    SELECT t10, doc_a AS doc FROM sweep
       |    UNION ALL SELECT t10, doc_b FROM sweep
       |  ) GROUP BY 1
       |)
       |SELECT pr.t10 / 10.0 AS threshold, pr.n_pairs, d.n_dup_docs,
       |       ${r("mnj")} AS min_jaccard, ${r("mxj")} AS max_jaccard
       |FROM pr JOIN d ON d.t10 = pr.t10 ORDER BY threshold""".stripMargin

  /** Cross-corpus (train ⋈ eval) pair CTEs: candidates span the mod-10
    * corpus split instead of the self-join triangle. Mirrors
    * Dedup.crossCorpusPairs over TextSim's corpusSplit. */
  private val decontamPairsCtes: String =
    minhashPairsCtesWith("x.doc_id % 10 <> 0 AND y.doc_id % 10 = 0")

  val decontamPairs: String =
    s"""$decontamPairsCtes
       |SELECT doc_a AS train_id, doc_b AS eval_id, ${r("jaccard")} AS jaccard
       |FROM pairs ORDER BY train_id, eval_id""".stripMargin

  val decontaminateTrain: String =
    s"""$decontamPairsCtes
       |SELECT doc_id, source FROM documents
       |WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT doc_a FROM pairs)
       |ORDER BY doc_id""".stripMargin

  /** Connected components of the pair graph: min doc_id reachable from each
    * node, via a recursive reachability CTE (the oracle twin of the Spark
    * side's iterative min-label propagation — both converge to the same
    * unique fixpoint). */
  val dedupClusters: String =
    s"""${minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM e
       |), reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT reach.id, e.dst AS r FROM reach JOIN e ON e.src = reach.r
       |)
       |SELECT id AS doc_id, MIN(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  private val simhashCte: String = {
    val digits = (1 to Dedup.SimhashBits / 4).map(k =>
      s"(instr('0123456789abcdef', substring(h, $k, 1)) - 1) AS d_$k").mkString(",\n         ")
    val sums = (0 until Dedup.SimhashBits).map { b =>
      val k = b / 4 + 1
      val j = 1 << (b % 4)
      s"SUM(2 * ((d_$k // $j) % 2) - 1) AS s_$b"
    }.mkString(",\n         ")
    val value = (0 until Dedup.SimhashBits).map(b =>
      s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
       |), h AS (
       |  SELECT doc_id, md5(tok) AS h FROM tok
       |), d AS (
       |  SELECT doc_id,
       |         $digits
       |  FROM h
       |), sm AS (
       |  SELECT doc_id,
       |         $sums
       |  FROM d GROUP BY doc_id
       |), sh2 AS (
       |  SELECT doc_id, CAST($value AS BIGINT) AS simhash FROM sm
       |)""".stripMargin
  }

  val dedupSimhash: String =
    s"""$simhashCte
       |SELECT doc_id, simhash FROM sh2 ORDER BY doc_id""".stripMargin

  val dedupSimhashPairs: String =
    s"""$simhashCte, ch AS (
       |  SELECT doc_id, simhash, c AS chunk_idx,
       |         (simhash // CAST(pow(256, c) AS BIGINT)) % 256 AS chunk_val
       |  FROM sh2, UNNEST(range(${Dedup.SimhashChunks})) u(c)
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         x.simhash AS sh_a, y.simhash AS sh_b
       |  FROM ch x JOIN ch y
       |    ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val AND x.doc_id < y.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= ${Dedup.SimhashMaxDist}
       |ORDER BY doc_a, doc_b""".stripMargin

  val dedupNgramJaccard: String =
    s"""WITH g0 AS (
       |  SELECT doc_id, substring(text, i, 4) AS g
       |  FROM documents, UNNEST(range(1, greatest(length(text) - 3, 1) + 1)) u(i)
       |), g AS (
       |  SELECT DISTINCT doc_id, g FROM g0
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS n_g FROM g GROUP BY doc_id
       |), cand AS (
       |  SELECT x.doc_id AS doc_a, x.doc_id + d AS doc_b
       |  FROM documents x, UNNEST(range(1, 4)) u(d)
       |  JOIN documents y ON y.doc_id = x.doc_id + d
       |), inter AS (
       |  SELECT doc_a, doc_b, COUNT(*) AS n_inter
       |  FROM cand
       |  JOIN g a ON doc_a = a.doc_id
       |  JOIN g b ON doc_b = b.doc_id AND a.g = b.g
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |       ${r("CAST(n_inter AS DOUBLE) / (za.n_g + zb.n_g - n_inter)")} AS jaccard
       |FROM inter
       |JOIN sizes za ON za.doc_id = doc_a
       |JOIN sizes zb ON zb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Sequential-fold dot product — bit-identical to Spark's
    * aggregate(zip_with(...), 0D, +). */
  private def dot(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"
  /** cosine from precomputed norms (mirrors Similarity.cosPre). */
  private def cosP(a: String, b: String, na: String, nb: String) =
    s"${dot(a, b)} / ($na * $nb)"

  private val embCte =
    s"""WITH e AS (
       |  SELECT vec_id, v, sqrt(${dot("v", "v")}) AS nv
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e0
       |)""".stripMargin

  /** Mirrors Similarity.hardNegatives: the simTopk scan restricted to
    * different-label candidates, same sequential-fold cosine and
    * (cos DESC, neighbor_id) rank ties. */
  val simHardNegatives: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, v, sqrt(${dot("v", "v")}) AS nv
       |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |        FROM embeddings) e0
       |), p AS (
       |  SELECT vec_id AS probe_id, label AS probe_label, v AS pv, nv AS np
       |  FROM e WHERE vec_id < 10
       |), j AS (
       |  SELECT probe_id, probe_label, e.vec_id AS neighbor_id,
       |         e.label AS neighbor_label,
       |         ${cosP("pv", "v", "np", "nv")} AS cos
       |  FROM e, p
       |  WHERE e.vec_id != probe_id AND e.label != probe_label
       |), rr AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
       |            ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM j
       |)
       |SELECT probe_id, CAST(probe_label AS BIGINT) AS probe_label,
       |       CAST(rnk AS BIGINT) AS "rank", neighbor_id,
       |       CAST(neighbor_label AS BIGINT) AS neighbor_label,
       |       ${r("cos")} AS cos
       |FROM rr WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin

  /** Mirrors Similarity.dimStats: identical floor-form 10⁶ quantization,
    * exact DECIMAL power sums, identical double-domain mean/std formula
    * (events_stationarity recipe); min/max compare raw components. */
  val embDimStats: String =
    s"""WITH x AS (
       |  SELECT d AS dim, CAST(embedding[d + 1] AS DOUBLE) AS x
       |  FROM (SELECT embedding, unnest(range(len(embedding))) AS d
       |        FROM embeddings)
       |), q AS (
       |  SELECT dim, x,
       |         CAST(floor(x * 1000000.0 + 0.5) AS DECIMAL(19,0)) AS kx
       |  FROM x
       |), s AS (
       |  SELECT dim, CAST(COUNT(*) AS DOUBLE) AS nd,
       |         CAST(SUM(kx) AS DOUBLE) AS sx,
       |         CAST(SUM(kx * kx) AS DOUBLE) AS sxx,
       |         MIN(x) AS mn, MAX(x) AS mx
       |  FROM q GROUP BY 1
       |)
       |SELECT CAST(dim AS BIGINT) AS dim, CAST(nd AS BIGINT) AS n,
       |       ${r("(sx / nd) / 1000000.0")} AS mean,
       |       ${r("CASE WHEN nd <= 1.0 OR (nd * sxx - sx * sx) <= 0.0 THEN 0.0 ELSE sqrt((nd * sxx - sx * sx) / (nd * (nd - 1.0))) / 1000000.0 END")} AS std,
       |       ${r("mn")} AS v_min, ${r("mx")} AS v_max
       |FROM s ORDER BY dim""".stripMargin

  /** Mirrors Similarity.whiten: z-scores against the 6dp-rounded dimStats
    * (both engines whiten with the identical published stats), zero-std
    * dims → 0, norms as the sequential-fold dot (bit-equal to Spark's
    * DotProduct). */
  val embWhiten: String =
    s"""WITH x AS (
       |  SELECT d AS dim, CAST(embedding[d + 1] AS DOUBLE) AS x
       |  FROM (SELECT embedding, unnest(range(len(embedding))) AS d
       |        FROM embeddings)
       |), q AS (
       |  SELECT dim, CAST(floor(x * 1000000.0 + 0.5) AS DECIMAL(19,0)) AS kx
       |  FROM x
       |), s AS (
       |  SELECT dim, CAST(COUNT(*) AS DOUBLE) AS nd,
       |         CAST(SUM(kx) AS DOUBLE) AS sx,
       |         CAST(SUM(kx * kx) AS DOUBLE) AS sxx
       |  FROM q GROUP BY 1
       |), st AS (
       |  SELECT dim,
       |         ${r("(sx / nd) / 1000000.0")} AS m,
       |         ${r("CASE WHEN nd <= 1.0 OR (nd * sxx - sx * sx) <= 0.0 THEN 0.0 ELSE sqrt((nd * sxx - sx * sx) / (nd * (nd - 1.0))) / 1000000.0 END")} AS s
       |  FROM s
       |), arr AS (
       |  SELECT list(m ORDER BY dim) AS means, list(s ORDER BY dim) AS stds
       |  FROM st
       |), z AS (
       |  SELECT vec_id, label, v,
       |         list_transform(range(1, len(v) + 1),
       |           i -> CASE WHEN stds[i] <= 0.0 THEN 0.0
       |                     ELSE (v[i] - means[i]) / stds[i] END) AS z
       |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |        FROM embeddings) e0, arr
       |)
       |SELECT vec_id, label,
       |       ${r(s"sqrt(${dot("v", "v")})")} AS norm_raw,
       |       ${r(s"sqrt(${dot("z", "z")})")} AS norm_z
       |FROM z ORDER BY vec_id""".stripMargin

  /** Mirrors TextSim.simMips: the simTopk scan ranked on the raw
    * sequential-fold inner product (no norm divide). */
  val simMips: String =
    s"""$embCte, p AS (
       |  SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10
       |), j AS (
       |  SELECT probe_id, e.vec_id AS neighbor_id, ${dot("pv", "v")} AS ip
       |  FROM e, p WHERE e.vec_id != probe_id
       |), rr AS (
       |  SELECT probe_id, neighbor_id, ip,
       |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ip DESC, neighbor_id) AS rnk
       |  FROM j
       |)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", neighbor_id, ${r("ip")} AS ip
       |FROM rr WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin

  val simTopk: String =
    s"""$embCte, p AS (
       |  SELECT vec_id AS probe_id, v AS pv, nv AS np FROM e WHERE vec_id < 10
       |), j AS (
       |  SELECT probe_id, e.vec_id AS neighbor_id, ${cosP("pv", "v", "np", "nv")} AS cos
       |  FROM e, p WHERE e.vec_id != probe_id
       |), rr AS (
       |  SELECT probe_id, neighbor_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM j
       |)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", neighbor_id, ${r("cos")} AS cos
       |FROM rr WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin

  /** Mirrors Similarity.kmeans (k=8, iters=2, unrolled): cosine assignment
    * with (ccos DESC, cent_id) rank ties, centroid means as sequential
    * folds over vec_id-sorted members — every downstream cosine compares
    * identical doubles, so the discrete assignments match exactly. */
  /** Mirrors Similarity.pqEncode (m=4, k=8, iters=2): generic-over-subspace
    * replay of the two unrolled Lloyd rounds — list_slice subvectors,
    * sequential-fold L2², (d, cent_id) argmin tie-break, ORDER BY vec_id
    * canonical mean updates — the kmeans oracle's recipe keyed by
    * (subspace, code). */
  val simPq: String = {
    import graft.sim.{Similarity => S}
    val m = S.PqM
    val k = S.PqK
    val sw = S.PqDims / S.PqM
    def l2(a: String, b: String): String =
      s"list_sum(list_transform(range(1, len($a) + 1), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    s"""WITH e0 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sub AS (
       |  SELECT vec_id, m AS subspace,
       |         list_slice(v, m * $sw + 1, m * $sw + $sw) AS sv
       |  FROM e0, UNNEST(range(0, $m)) u(m)
       |), c0 AS (
       |  SELECT subspace, vec_id AS cent_id, sv AS cv FROM sub WHERE vec_id < $k
       |), s1 AS (
       |  SELECT sub.vec_id, sub.subspace, sub.sv, c0.cent_id,
       |         ${l2("sv", "cv")} AS d
       |  FROM sub JOIN c0 ON c0.subspace = sub.subspace
       |), a1 AS (
       |  SELECT vec_id, subspace, sv, cent_id AS code,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
       |                            ORDER BY d, cent_id) AS crank
       |  FROM s1
       |), b1 AS (
       |  SELECT vec_id, subspace, sv, code FROM a1 WHERE crank = 1
       |), x1 AS (
       |  SELECT subspace, code, vec_id, i - 1 AS idx, sv[i] AS x
       |  FROM b1, UNNEST(range(1, len(sv) + 1)) u(i)
       |), m1 AS (
       |  SELECT subspace, code, idx,
       |         list_sum(list(x ORDER BY vec_id)) / COUNT(*) AS c
       |  FROM x1 GROUP BY subspace, code, idx
       |), c1 AS (
       |  SELECT subspace, code AS cent_id, list(c ORDER BY idx) AS cv
       |  FROM m1 GROUP BY subspace, code
       |), s2 AS (
       |  SELECT sub.vec_id, sub.subspace, c1.cent_id, ${l2("sv", "cv")} AS d
       |  FROM sub JOIN c1 ON c1.subspace = sub.subspace
       |), a2 AS (
       |  SELECT vec_id, subspace, cent_id AS code, d,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
       |                            ORDER BY d, cent_id) AS crank
       |  FROM s2
       |)
       |SELECT vec_id, subspace, code, ${r("d")} AS qerr
       |FROM a2 WHERE crank = 1 ORDER BY vec_id, subspace""".stripMargin
  }

  val simKmeans: String = {
    import graft.sim.{Similarity => S}
    val k = S.KmeansK
    s"""$embCte, c0 AS (
       |  SELECT vec_id AS cent_id, v AS cv, nv AS nc FROM e WHERE vec_id < $k
       |), s1 AS (
       |  SELECT e.vec_id, e.v, e.nv, cent_id, ${cosP("v", "cv", "nv", "nc")} AS ccos
       |  FROM e CROSS JOIN c0
       |), a1 AS (
       |  SELECT vec_id, v, cent_id AS cluster,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
       |  FROM s1
       |), b1 AS (
       |  SELECT vec_id, v, cluster FROM a1 WHERE crank = 1
       |), x1 AS (
       |  SELECT cluster, vec_id, i - 1 AS idx, v[i] AS x
       |  FROM b1, UNNEST(range(1, len(v) + 1)) u(i)
       |), m1 AS (
       |  SELECT cluster, idx,
       |         list_sum(list(x ORDER BY vec_id)) / COUNT(*) AS m
       |  FROM x1 GROUP BY cluster, idx
       |), c1 AS (
       |  SELECT cluster AS cent_id, list(m ORDER BY idx) AS cv
       |  FROM m1 GROUP BY cluster
       |), c1n AS (
       |  SELECT cent_id, cv, sqrt(${dot("cv", "cv")}) AS nc FROM c1
       |), s2 AS (
       |  SELECT e.vec_id, cent_id, ${cosP("v", "cv", "nv", "nc")} AS ccos
       |  FROM e CROSS JOIN c1n
       |), a2 AS (
       |  SELECT vec_id, cent_id AS cluster, ccos,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
       |  FROM s2
       |)
       |SELECT vec_id, cluster, ${r("ccos")} AS cos
       |FROM a2 WHERE crank = 1 ORDER BY vec_id""".stripMargin
  }

  /** Shared IVF assignment over TRAINED centroids (mirrors
    * Similarity.ivfAssign → kmeansCentroids: first-16 seed, ONE Lloyd
    * update with the sequential-fold means, then the final assignment) —
    * the same chain as [[simKmeans]] at k = 16, CTE names prefixed `iv`
    * to keep the PQ training chain's s1/a1/… namespace free. */
  private val ivfCte: String =
    s"""$embCte, ivc0 AS (
       |  SELECT vec_id AS cent_id, v AS cv, nv AS nc FROM e WHERE vec_id < 16
       |), ivs1 AS (
       |  SELECT e.vec_id, e.v, e.nv, cent_id, ${cosP("v", "cv", "nv", "nc")} AS ccos
       |  FROM e CROSS JOIN ivc0
       |), iva1 AS (
       |  SELECT vec_id, v, cent_id AS cluster,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
       |  FROM ivs1
       |), ivb1 AS (
       |  SELECT vec_id, v, cluster FROM iva1 WHERE crank = 1
       |), ivx1 AS (
       |  SELECT cluster, vec_id, i - 1 AS idx, v[i] AS x
       |  FROM ivb1, UNNEST(range(1, len(v) + 1)) u(i)
       |), ivm1 AS (
       |  SELECT cluster, idx,
       |         list_sum(list(x ORDER BY vec_id)) / COUNT(*) AS m
       |  FROM ivx1 GROUP BY cluster, idx
       |), ivc1 AS (
       |  SELECT cluster AS cent_id, list(m ORDER BY idx) AS cv
       |  FROM ivm1 GROUP BY cluster
       |), ivc1n AS MATERIALIZED (
       |  SELECT cent_id, cv, sqrt(${dot("cv", "cv")}) AS nc FROM ivc1
       |), ivs2 AS (
       |  SELECT e.vec_id, e.v, e.nv, cent_id, ${cosP("v", "cv", "nv", "nc")} AS ccos
       |  FROM e CROSS JOIN ivc1n
       |), iva2 AS (
       |  SELECT vec_id, v, nv, cent_id,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
       |  FROM ivs2
       |), asg AS MATERIALIZED (
       |  SELECT vec_id, v, nv, cent_id AS bucket FROM iva2 WHERE crank = 1
       |)""".stripMargin

  val simAnnIvf: String =
    s"""$ivfCte, p AS (
       |  SELECT vec_id AS probe_id, v AS pv, nv AS np, bucket FROM asg WHERE vec_id < 10
       |), j AS (
       |  SELECT probe_id, asg.vec_id AS neighbor_id, ${cosP("pv", "v", "np", "nv")} AS cos
       |  FROM asg JOIN p USING (bucket) WHERE asg.vec_id != probe_id
       |), rr AS (
       |  SELECT probe_id, neighbor_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM j
       |)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", neighbor_id, ${r("cos")} AS cos
       |FROM rr WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin

  /** Multi-table sign-LSH ANN. The ±1 hyperplanes are generated by the SAME
    * Scala code the engine uses (Similarity.lshPlane) and embedded here as
    * list literals, so both engines project onto bit-identical planes; the
    * projection is the usual sequential fold (exact: every term is a float
    * value times ±1.0). */
  private def lshPlaneList(k: Int): String = {
    import graft.sim.{Similarity => S}
    S.lshPlane(k, 64).map(x => if (x > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")
  }
  private def lshPlaneDot(k: Int): String =
    s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * (${lshPlaneList(k)})[i]))"
  private def lshBucketExpr(t: Int): String = {
    import graft.sim.{Similarity => S}
    (0 until S.LshBits).map(j =>
      s"CASE WHEN ${lshPlaneDot(t * S.LshBits + j)} > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
  }
  /** One UNION ALL branch per LSH table: (vec_id, tbl, bucket) rows. */
  private def lshTableSelects: String = {
    import graft.sim.{Similarity => S}
    (0 until S.LshTables).map(t =>
      s"  SELECT vec_id, $t AS tbl, ${lshBucketExpr(t)} AS bucket FROM e")
      .mkString("\n  UNION ALL\n")
  }

  val simAnnLsh: String = {
    s"""$embCte, asg AS (
       |$lshTableSelects
       |), p AS (
       |  SELECT vec_id AS probe_id, tbl, bucket FROM asg WHERE vec_id < 10
       |), cand AS (
       |  SELECT DISTINCT probe_id, asg.vec_id AS neighbor_id
       |  FROM asg JOIN p USING (tbl, bucket) WHERE asg.vec_id != probe_id
       |), j AS (
       |  SELECT probe_id, neighbor_id,
       |         ${cosP("pe.v", "ne.v", "pe.nv", "ne.nv")} AS cos
       |  FROM cand
       |  JOIN e pe ON pe.vec_id = probe_id
       |  JOIN e ne ON ne.vec_id = neighbor_id
       |), rr AS (
       |  SELECT probe_id, neighbor_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM j
       |)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", neighbor_id, ${r("cos")} AS cos
       |FROM rr WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin
  }

  /** PQ-ADC CTE chain shared by simAnnPq and simAnnRecall's pq leg.
    * Assumes `e` (embCte) and `asg` (ivfCte) are in scope. Replays the
    * simPq training chain under pq-prefixed names (same two unrolled Lloyd
    * rounds, same tie-breaks), keeps the FINAL codebook `pqc1`, builds the
    * per-probe asymmetric distance table `pqdt` (probe subvector → each
    * sub-centroid, exact sequential-fold L2²), and scores bucket-restricted
    * candidates by summing their m code lookups in subspace order —
    * `list_sum(list(dsub ORDER BY subspace))`, the same sequential fold the
    * engine computes, so `adist` compares identical doubles. */
  private def pqAdcCtes: String = {
    import graft.sim.{Similarity => S}
    val m = S.PqM
    val k = S.PqK
    val sw = S.PqDims / S.PqM
    def l2(a: String, b: String): String =
      s"list_sum(list_transform(range(1, len($a) + 1), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    s"""pqsub AS (
       |  SELECT vec_id, m AS subspace,
       |         list_slice(v, m * $sw + 1, m * $sw + $sw) AS sv
       |  FROM e, UNNEST(range(0, $m)) u(m)
       |), pqcc0 AS (
       |  SELECT subspace, vec_id AS cent_id, sv AS cv FROM pqsub WHERE vec_id < $k
       |), pqs1 AS (
       |  SELECT pqsub.vec_id, pqsub.subspace, pqsub.sv, pqcc0.cent_id,
       |         ${l2("sv", "cv")} AS d
       |  FROM pqsub JOIN pqcc0 ON pqcc0.subspace = pqsub.subspace
       |), pqa1 AS (
       |  SELECT vec_id, subspace, sv, cent_id AS code,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
       |                            ORDER BY d, cent_id) AS crank
       |  FROM pqs1
       |), pqb1 AS (
       |  SELECT vec_id, subspace, sv, code FROM pqa1 WHERE crank = 1
       |), pqx1 AS (
       |  SELECT subspace, code, vec_id, i - 1 AS idx, sv[i] AS x
       |  FROM pqb1, UNNEST(range(1, len(sv) + 1)) u(i)
       |), pqm1 AS (
       |  SELECT subspace, code, idx,
       |         list_sum(list(x ORDER BY vec_id)) / COUNT(*) AS c
       |  FROM pqx1 GROUP BY subspace, code, idx
       |), pqc1 AS (
       |  SELECT subspace, code AS cent_id, list(c ORDER BY idx) AS cv
       |  FROM pqm1 GROUP BY subspace, code
       |), pqs2 AS (
       |  SELECT pqsub.vec_id, pqsub.subspace, pqc1.cent_id, ${l2("sv", "cv")} AS d
       |  FROM pqsub JOIN pqc1 ON pqc1.subspace = pqsub.subspace
       |), pqcodes AS (
       |  SELECT vec_id, subspace, code FROM (
       |    SELECT vec_id, subspace, cent_id AS code,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
       |                              ORDER BY d, cent_id) AS crank
       |    FROM pqs2
       |  ) WHERE crank = 1
       |), pqp AS (
       |  SELECT vec_id AS probe_id, bucket FROM asg WHERE vec_id < 10
       |), pqdt AS (
       |  SELECT s.vec_id AS probe_id, s.subspace, c.cent_id AS code,
       |         ${l2("s.sv", "c.cv")} AS dsub
       |  FROM pqsub s JOIN pqc1 c ON c.subspace = s.subspace
       |  WHERE s.vec_id < 10
       |), pqcand AS (
       |  SELECT pqp.probe_id, asg.vec_id AS neighbor_id
       |  FROM asg JOIN pqp USING (bucket) WHERE asg.vec_id != pqp.probe_id
       |), pqag AS (
       |  SELECT sc.probe_id, sc.neighbor_id,
       |         list_sum(list(sc.dsub ORDER BY sc.subspace)) AS adist
       |  FROM (
       |    SELECT pqcand.probe_id, pqcand.neighbor_id, k.subspace, pqdt.dsub
       |    FROM pqcand
       |    JOIN pqcodes k ON k.vec_id = pqcand.neighbor_id
       |    JOIN pqdt ON pqdt.probe_id = pqcand.probe_id
       |            AND pqdt.subspace = k.subspace AND pqdt.code = k.code
       |  ) sc GROUP BY 1, 2
       |)""".stripMargin
  }

  /** Mirrors TextSim.simAnnPq (Similarity.ivfPqTopK): IVF bucket routing +
    * PQ asymmetric-distance scoring, ranked (adist ASC, neighbor_id). */
  val simAnnPq: String =
    s"""$ivfCte, $pqAdcCtes, rr AS (
       |  SELECT probe_id, neighbor_id, adist,
       |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, neighbor_id) AS rnk
       |  FROM pqag
       |)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", neighbor_id, ${r("adist")} AS adist
       |FROM rr WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin

  /** Mirrors TextSim.simAnnRecall: brute truth + IVF + LSH + PQ-ADC top-3 legs
    * (identical to their standalone oracles), scored with a left join —
    * only the DISCRETE neighbor sets matter, and those are bit-settled by
    * the identical cosine doubles and (cos DESC, neighbor_id) tie-break. */
  val simAnnRecall: String =
    s"""$ivfCte, truthp AS (
       |  SELECT vec_id AS probe_id, v AS pv, nv AS np FROM e WHERE vec_id < 10
       |), tj AS (
       |  SELECT probe_id, e.vec_id AS neighbor_id, ${cosP("pv", "v", "np", "nv")} AS cos
       |  FROM e, truthp WHERE e.vec_id != probe_id
       |), truth AS (
       |  SELECT probe_id, neighbor_id FROM (
       |    SELECT probe_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM tj
       |  ) WHERE rnk <= 3
       |), ip AS (
       |  SELECT vec_id AS probe_id, v AS pv, nv AS np, bucket FROM asg WHERE vec_id < 10
       |), ij AS (
       |  SELECT probe_id, asg.vec_id AS neighbor_id, ${cosP("pv", "v", "np", "nv")} AS cos
       |  FROM asg JOIN ip USING (bucket) WHERE asg.vec_id != probe_id
       |), iann AS (
       |  SELECT 'ivf' AS method, probe_id, neighbor_id FROM (
       |    SELECT probe_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM ij
       |  ) WHERE rnk <= 3
       |), lasg AS (
       |$lshTableSelects
       |), lp AS (
       |  SELECT vec_id AS probe_id, tbl, bucket FROM lasg WHERE vec_id < 10
       |), lcand AS (
       |  SELECT DISTINCT probe_id, lasg.vec_id AS neighbor_id
       |  FROM lasg JOIN lp USING (tbl, bucket) WHERE lasg.vec_id != probe_id
       |), lj AS (
       |  SELECT probe_id, neighbor_id,
       |         ${cosP("pe.v", "ne.v", "pe.nv", "ne.nv")} AS cos
       |  FROM lcand
       |  JOIN e pe ON pe.vec_id = probe_id
       |  JOIN e ne ON ne.vec_id = neighbor_id
       |), lann AS (
       |  SELECT 'lsh' AS method, probe_id, neighbor_id FROM (
       |    SELECT probe_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM lj
       |  ) WHERE rnk <= 3
       |), $pqAdcCtes, pqann AS (
       |  SELECT 'pq' AS method, probe_id, neighbor_id FROM (
       |    SELECT probe_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, neighbor_id) AS rnk
       |    FROM pqag
       |  ) WHERE rnk <= 3
       |), ann AS (
       |  SELECT * FROM iann UNION ALL SELECT * FROM lann
       |  UNION ALL SELECT * FROM pqann
       |), sc AS (
       |  SELECT method, ann.probe_id, COUNT(*) AS n_returned,
       |         SUM(CASE WHEN truth.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
       |  FROM ann LEFT JOIN truth
       |    ON truth.probe_id = ann.probe_id AND truth.neighbor_id = ann.neighbor_id
       |  GROUP BY 1, 2
       |)
       |SELECT method, probe_id, n_returned, CAST(n_hits AS BIGINT) AS n_hits,
       |       ${r("CAST(n_hits AS DOUBLE) / 3.0")} AS recall_at_3
       |FROM sc ORDER BY method, probe_id""".stripMargin

  /** Mirrors TextSim.simMatryoshka: per-dims prefix slice (v[1:d] — same
    * ascending sequential dot fold over the truncated list as Spark's
    * sliced DotProduct), full-dim brute truth, identical hit join. */
  val simMatryoshka: String = {
    def leg(d: Int) =
      s"""e$d AS (
         |  SELECT vec_id, v[1:$d] AS v FROM e0
         |), en$d AS (
         |  SELECT vec_id, v, sqrt(${dot("v", "v")}) AS nv FROM e$d
         |), p$d AS (
         |  SELECT vec_id AS probe_id, v AS pv, nv AS np FROM en$d WHERE vec_id < 10
         |), j$d AS (
         |  SELECT probe_id, en$d.vec_id AS neighbor_id,
         |         ${cosP("pv", "v", "np", "nv")} AS cos
         |  FROM en$d, p$d WHERE en$d.vec_id != probe_id
         |), leg$d AS (
         |  SELECT $d AS dims, probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
         |    FROM j$d
         |  ) WHERE rnk <= 3
         |)""".stripMargin
    s"""$embCte, e0 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), tp AS (
       |  SELECT vec_id AS probe_id, v AS pv, nv AS np FROM e WHERE vec_id < 10
       |), tj AS (
       |  SELECT probe_id, e.vec_id AS neighbor_id, ${cosP("pv", "v", "np", "nv")} AS cos
       |  FROM e, tp WHERE e.vec_id != probe_id
       |), truth AS (
       |  SELECT probe_id, neighbor_id FROM (
       |    SELECT probe_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM tj
       |  ) WHERE rnk <= 3
       |),
       |${Seq(8, 16, 32).map(leg).mkString(",\n")},
       |ann AS (
       |  SELECT * FROM leg8 UNION ALL SELECT * FROM leg16
       |  UNION ALL SELECT * FROM leg32
       |), sc AS (
       |  SELECT dims, ann.probe_id,
       |         SUM(CASE WHEN truth.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
       |  FROM ann LEFT JOIN truth
       |    ON truth.probe_id = ann.probe_id AND truth.neighbor_id = ann.neighbor_id
       |  GROUP BY 1, 2
       |)
       |SELECT dims, probe_id, CAST(n_hits AS BIGINT) AS n_hits,
       |       ${r("CAST(n_hits AS DOUBLE) / 3.0")} AS recall_at_3
       |FROM sc ORDER BY dims, probe_id""".stripMargin
  }

  val simQuantize: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), m AS (
       |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e
       |), sc AS (
       |  SELECT vec_id, v, CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale FROM m
       |)
       |SELECT vec_id, CAST(i - 1 AS BIGINT) AS idx,
       |       CAST(round(v[i] * scale, 0) + 0.0 AS BIGINT) AS q,
       |       ${r("scale")} AS scale
       |FROM sc, UNNEST(range(1, len(v) + 1)) u(i)
       |ORDER BY vec_id, idx""".stripMargin

  val simNeardup: String =
    s"""$ivfCte
       |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |       ${r(cosP("x.v", "y.v", "x.nv", "y.nv"))} AS cos
       |FROM asg x JOIN asg y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE ${cosP("x.v", "y.v", "x.nv", "y.nv")} >= 0.25
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Mirrors Similarity.semanticDedup: the simNeardup pair graph clustered
    * by the same recursive reachability CTE as dedup_clusters, left-joined
    * back onto the full corpus (isolated vectors keep themselves). */
  val simSemanticDedup: String =
    s"""${ivfCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, pairs AS (
       |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
       |  FROM asg x JOIN asg y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |  WHERE ${cosP("x.v", "y.v", "x.nv", "y.nv")} >= 0.25
       |), ed AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM ed
       |), reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT reach.id, ed.dst AS r FROM reach JOIN ed ON ed.src = reach.r
       |), clus AS (
       |  SELECT id, MIN(r) AS label FROM reach GROUP BY id
       |)
       |SELECT v.vec_id,
       |       COALESCE(clus.label, v.vec_id) AS cluster_id,
       |       CAST(CASE WHEN clus.label IS NULL OR clus.label = v.vec_id
       |            THEN 1 ELSE 0 END AS INT) AS kept
       |FROM embeddings v LEFT JOIN clus ON clus.id = v.vec_id
       |ORDER BY vec_id""".stripMargin

  val textSourceStats: String =
    s"""WITH $statsCtesBody, s3 AS (
       |  SELECT s2.doc_id, d.source, d.lang, s2.ws_tokens,
       |         $qualityExpr AS quality_score
       |  FROM s2 JOIN documents d ON d.doc_id = s2.doc_id
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |       ${r("AVG(quality_score)")} AS avg_quality,
       |       COUNT(DISTINCT lang) AS n_langs,
       |       ${r("AVG(CAST(ws_tokens AS DOUBLE))")} AS avg_tokens
       |FROM s3 GROUP BY source ORDER BY source""".stripMargin

  /** Corpus curation: quality gate + canonical-only near-dup keep-list.
    * Composes the stats CTEs with the recursive clustering CTEs; the
    * quality comparison uses the RAW score (identical fp expression both
    * sides), rounding only the reported column. */
  val curateDocs: String =
    s"""${minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM e
       |), reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT reach.id, e.dst AS r FROM reach JOIN e ON e.src = reach.r
       |), clus AS (
       |  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
       |), $statsCtesBody
       |SELECT s2.doc_id, ${r(qualityExpr)} AS quality_score
       |FROM s2 LEFT JOIN clus ON s2.doc_id = clus.doc_id
       |WHERE ($qualityExpr) >= 0.55
       |  AND (clus.cluster_id IS NULL OR clus.cluster_id = s2.doc_id)
       |ORDER BY s2.doc_id""".stripMargin

  /** Mirrors TextSim.dedupCanonical: reachability clusters (as
    * dedupClusters) ⋈ the quality CTEs, best-quality-first rank per
    * cluster. */
  val dedupCanonical: String =
    s"""${minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM e
       |), reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT reach.id, e.dst AS r FROM reach JOIN e ON e.src = reach.r
       |), clus AS (
       |  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
       |), $statsCtesBody, rk AS (
       |  SELECT clus.cluster_id, clus.doc_id, ($qualityExpr) AS q,
       |         ROW_NUMBER() OVER (PARTITION BY clus.cluster_id
       |           ORDER BY ($qualityExpr) DESC, clus.doc_id) AS rnk,
       |         COUNT(*) OVER (PARTITION BY clus.cluster_id) AS n_members
       |  FROM clus JOIN s2 ON s2.doc_id = clus.doc_id
       |)
       |SELECT cluster_id, doc_id AS keep_id,
       |       CAST(n_members AS BIGINT) AS n_members, ${r("q")} AS keep_quality
       |FROM rk WHERE rnk = 1 ORDER BY cluster_id""".stripMargin

  val multimodalFrames: String =
    """WITH p AS (
      |  SELECT event_id, repeat(props, 64) AS payload FROM events
      |), f AS (
      |  SELECT event_id, payload,
      |         CAST(floor(length(payload) / 16) AS BIGINT) AS n_frames
      |  FROM p
      |)
      |SELECT event_id, fi AS frame_idx, n_frames,
      |       md5(substring(payload, CAST(fi * 16 + 1 AS INT), 16)) AS frame_md5
      |FROM f, UNNEST(range(0, n_frames, 4)) u(fi)
      |ORDER BY event_id, frame_idx""".stripMargin

  /** Oracle twin of Multimodal.FakeDecoder: the deterministic stand-in
    * decoder is pure integer arithmetic (a 31-polynomial byte fold), so
    * even the "stubbed" decode path is hash-checked end to end.
    *
    * Preconditions (hold for the shared corpus: props are 8-9 ASCII
    * chars): payloads of <= 11 single-byte chars keep 17·31^len inside
    * int64 — DuckDB's checked arithmetic would ERROR where the JVM fold
    * wraps — and keep h non-negative, so FakeDecoder's math.abs is a
    * no-op and `//` equals the arithmetic `>>`. ASCII keeps ord/length
    * (codepoints) equal to the JVM's UTF-8 byte view. */
  val multimodalDecode: String = {
    val bytes = "list_transform(range(1, length(props) + 1), " +
      "i -> CAST(ord(substring(props, i, 1)) AS BIGINT))"
    s"""WITH f AS (
       |  SELECT event_id, event_type AS kind,
       |         CASE WHEN length(props) > 11 THEN CAST(error(
       |             'multimodal_decode oracle precondition violated: props longer '
       |             || 'than 11 chars overflows the checked 31-polynomial fold '
       |             || '(len=' || length(props) || ')') AS INTEGER)
       |           ELSE CAST(length(props) AS INTEGER) END AS byte_len,
       |         CAST(list_sum($bytes) AS BIGINT) AS checksum,
       |         list_reduce(list_prepend(CAST(17 AS BIGINT), $bytes),
       |                     (acc, b) -> acc * 31 + b) AS h
       |  FROM events
       |)
       |SELECT event_id, kind, byte_len, checksum,
       |       CAST((h % 64 + 1) * 16 AS INTEGER) AS width,
       |       CAST(((h // 256) % 64 + 1) * 16 AS INTEGER) AS height,
       |       CAST(CASE WHEN kind = 'view' THEN (h // 65536) % 30 + 1 ELSE 1 END AS INTEGER) AS frames
       |FROM f ORDER BY event_id""".stripMargin
  }

  /** Mirrors TextSim.multimodalResize: same byte-fold dims as
    * multimodalDecode, then the identical scale/floor arithmetic. */
  val multimodalResize: String = {
    val bytes = "list_transform(range(1, length(props) + 1), " +
      "i -> CAST(ord(substring(props, i, 1)) AS BIGINT))"
    s"""WITH f AS (
       |  SELECT event_id, event_type AS kind,
       |         list_reduce(list_prepend(CAST(17 AS BIGINT), $bytes),
       |                     (acc, b) -> acc * 31 + b) AS h
       |  FROM events
       |), d AS (
       |  SELECT event_id, kind,
       |         CAST((h % 64 + 1) * 16 AS INTEGER) AS width,
       |         CAST(((h // 256) % 64 + 1) * 16 AS INTEGER) AS height
       |  FROM f
       |), sc AS (
       |  SELECT event_id, kind, width, height,
       |         LEAST(1.0, 256.0 / CAST(GREATEST(width, height) AS DOUBLE)) AS scale
       |  FROM d
       |)
       |SELECT event_id, kind, width, height,
       |       CAST(GREATEST(1, CAST(floor(width * scale) AS INTEGER)) AS INTEGER) AS new_width,
       |       CAST(GREATEST(1, CAST(floor(height * scale) AS INTEGER)) AS INTEGER) AS new_height,
       |       ${r("scale")} AS scale
       |FROM sc ORDER BY event_id""".stripMargin
  }

  val multimodalMeta: String =
    """SELECT event_id,
      |       CAST(length(props) AS BIGINT) AS payload_len,
      |       md5(props) AS payload_md5,
      |       CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_value
      |FROM events ORDER BY event_id""".stripMargin

  /** BM25 replay: identical IEEE arithmetic in the same association order
    * as TextStats.bm25 (per-term tf via list_filter, ONE corpus-stats row,
    * idf = ln(1 + (N-df+0.5)/(df+0.5)), rank on the unrounded score). */
  val textBm25: String = {
    val q = TextStats.Bm25Query
    val k1 = TextStats.Bm25K1
    val b = TextStats.Bm25B
    val tfCols = q.indices.map(i =>
      s"CAST(len(list_filter(toks, x -> x = '${q(i)}')) AS BIGINT) AS tf_$i")
      .mkString(",\n    ")
    val dfCols = q.indices.map(i =>
      s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
      .mkString(",\n    ")
    val nHit = q.indices.map(i => s"CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    val score = q.indices.map { i =>
      val idf = s"ln((CAST(n_docs AS DOUBLE) - df_$i + 0.5) / (df_$i + 0.5) + 1.0)"
      s"$idf * (CAST(tf_$i AS DOUBLE) * ${k1 + 1.0}) / " +
        s"(CAST(tf_$i AS DOUBLE) + $k1 * (1.0 - $b + $b * CAST(dl AS DOUBLE) / " +
        s"(CAST(sum_dl AS DOUBLE) / n_docs)))"
    }.mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), tf AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM d
       |), st AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
       |    $dfCols
       |  FROM tf
       |), sc AS (
       |  SELECT doc_id, dl, $nHit AS n_hit, $score AS score
       |  FROM tf CROSS JOIN st
       |)
       |SELECT doc_id, dl, n_hit, bm25 FROM (
       |  SELECT doc_id, dl, n_hit, ${r("score")} AS bm25, score
       |  FROM sc WHERE n_hit > 0
       |  ORDER BY score DESC, doc_id LIMIT ${TextStats.Bm25TopK}
       |) ORDER BY bm25 DESC, doc_id""".stripMargin
  }

  /** BPE-merge replay — an INDEPENDENT re-derivation, not an injected
    * merge list: each of the 8 rounds recounts weighted symbol pairs,
    * picks the (freq DESC, lhs, rhs) winner, and re-folds every word's
    * symbol list with a recursive CTE implementing the same greedy
    * left-to-right non-overlapping merge as the Spark-side aggregate()
    * fold. Recursion depth = max word length; each round's vocab is
    * MATERIALIZED so cost stays linear in rounds. */
  /** Shared BPE round chain: "WITH RECURSIVE v0 … v<k>" where v<k> is the
    * word-type table after k merges (word, cnt, sym) and b1..bk hold each
    * round's winning pair. Used by tokenizerBpe (reads b·) and
    * tokenizerSegment (reads the final v·). */
  private def bpeCtes(k: Int): String = {
    val rounds = (1 to k).map { i =>
      val prev = s"v${i - 1}"
      s"""p$i AS (
         |  SELECT sym[i] AS a, sym[i + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS freq
         |  FROM $prev, UNNEST(generate_series(1, len(sym) - 1)) u(i)
         |  WHERE len(sym) >= 2 GROUP BY 1, 2
         |), b$i AS MATERIALIZED (
         |  SELECT a, b, a || b AS ab, freq FROM p$i
         |  ORDER BY freq DESC, a, b LIMIT 1
         |), m$i AS (
         |  SELECT word, cnt, sym, 0 AS i, CAST([] AS VARCHAR[]) AS out FROM $prev
         |  UNION ALL
         |  SELECT m.word, m.cnt, m.sym, m.i + 1,
         |         CASE WHEN len(m.out) > 0 AND m.out[-1] = (SELECT a FROM b$i)
         |                   AND m.sym[m.i + 1] = (SELECT b FROM b$i)
         |              THEN list_concat(m.out[1:len(m.out) - 1], [(SELECT ab FROM b$i)])
         |              ELSE list_concat(m.out, [m.sym[m.i + 1]]) END
         |  FROM m$i m WHERE m.i < len(m.sym)
         |), v$i AS MATERIALIZED (
         |  SELECT word, cnt, out AS sym FROM m$i WHERE i = len(sym)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH RECURSIVE v0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |         list_transform(generate_series(1, length(word)),
       |                        i -> substring(word, i, 1)) AS sym
       |  FROM (
       |    SELECT word, COUNT(*) AS cnt
       |    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
       |    GROUP BY word)
       |), $rounds""".stripMargin
  }

  val tokenizerBpe: String = {
    val k = graft.text.Bpe.DefaultMerges
    val sel = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, " +
        s"ab AS merged, freq FROM b$i")
      .mkString("\nUNION ALL ")
    s"""${bpeCtes(k)}
       |$sel
       |ORDER BY merge_rank""".stripMargin
  }

  /** Segmentation replay: the final v<k> IS the segmented word-type table;
    * the corpus application is one word join + per-doc aggregate. */
  val tokenizerSegment: String = {
    val k = graft.text.Bpe.DefaultMerges
    s"""${bpeCtes(k)}, dw AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(len(sym)) AS BIGINT) AS n_subwords,
       |       ${r("CAST(SUM(len(sym)) AS DOUBLE) / COUNT(*)")} AS subwords_per_word
       |FROM dw JOIN v$k USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Bigram-LM replay: same 1-indexed bigram extraction as corpusColloc,
    * identical add-one-smoothing arithmetic, per-doc sum over the
    * position-ordered list (sequential-fold contract). */
  val textLogprobBigram: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), tok AS (
       |  SELECT UNNEST(string_split(text, ' ')) AS t1 FROM documents
       |), uni AS (
       |  SELECT t1, COUNT(*) AS c1 FROM tok GROUP BY 1
       |), vb AS (
       |  SELECT COUNT(DISTINCT t1) AS v FROM tok
       |), bi AS (
       |  SELECT doc_id, i - 1 AS pos, w[i] AS t1, w[i + 1] AS t2
       |  FROM s, UNNEST(generate_series(1, len(w) - 1)) u(i)
       |  WHERE len(w) >= 2
       |), pair AS (
       |  SELECT t1, t2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2
       |), j AS (
       |  SELECT doc_id, pos,
       |         -log2((CAST(c12 AS DOUBLE) + 1.0) / (CAST(c1 AS DOUBLE) + v)) AS nlp
       |  FROM bi JOIN pair USING (t1, t2) JOIN uni USING (t1) CROSS JOIN vb
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |       ${r("list_sum(list(nlp ORDER BY pos)) / COUNT(*)")} AS bigram_nll
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirrors TextSim.qualityPerplexityBuckets: the textLogprobBigram chain
    * UNROUNDED, per-lang min/max bands, identical third-cut threshold
    * trees — comparisons on the bit-equal sequential-fold nll. */
  val qualityPerplexityBuckets: String =
    s"""WITH s AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), tok AS (
       |  SELECT UNNEST(string_split(text, ' ')) AS t1 FROM documents
       |), uni AS (
       |  SELECT t1, COUNT(*) AS c1 FROM tok GROUP BY 1
       |), vb AS (
       |  SELECT COUNT(DISTINCT t1) AS v FROM tok
       |), bi AS (
       |  SELECT doc_id, i - 1 AS pos, w[i] AS t1, w[i + 1] AS t2
       |  FROM s, UNNEST(generate_series(1, len(w) - 1)) u(i)
       |  WHERE len(w) >= 2
       |), pair AS (
       |  SELECT t1, t2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2
       |), j AS (
       |  SELECT doc_id, pos,
       |         -log2((CAST(c12 AS DOUBLE) + 1.0) / (CAST(c1 AS DOUBLE) + v)) AS nlp
       |  FROM bi JOIN pair USING (t1, t2) JOIN uni USING (t1) CROSS JOIN vb
       |), nll AS (
       |  SELECT doc_id, list_sum(list(nlp ORDER BY pos)) / COUNT(*) AS nll
       |  FROM j GROUP BY doc_id
       |), ld AS (
       |  SELECT nll.doc_id, d.lang, nll.nll
       |  FROM nll JOIN documents d ON d.doc_id = nll.doc_id
       |), bands AS (
       |  SELECT lang, MIN(nll) AS lo, MAX(nll) AS hi FROM ld GROUP BY lang
       |)
       |SELECT ld.doc_id, ld.lang, ${r("ld.nll")} AS bigram_nll,
       |       CASE WHEN ld.nll <= lo + (hi - lo) / 3.0 THEN 'head'
       |            WHEN ld.nll <= lo + (hi - lo) * 2.0 / 3.0 THEN 'middle'
       |            ELSE 'tail' END AS ppl_bucket
       |FROM ld JOIN bands USING (lang) ORDER BY doc_id""".stripMargin

  /** Mirrors TextSim.multimodalDedup: md5 over the utf8 payload bytes
    * (octet_length ↔ Spark's length-of-binary), exact integer counting. */
  /** Mirrors TextSim.textLangidNgram / TextStats.langIdNgram: identical
    * trigram extraction (range(len−2) ↔ sequence(0, len−3)), identical
    * (count desc, gram) rank tie-breaks, the same K=50 out-of-place
    * penalty, and the same (distance, lang) argmin — all exact
    * integers. */
  val textLangidNgram: String = {
    val k = graft.text.TextStats.CtProfileK
    s"""WITH g AS (
       |  SELECT doc_id, lang,
       |         unnest(list_transform(range(length(text) - 2),
       |           p -> substring(text, CAST(p AS INT) + 1, 3))) AS gram
       |  FROM documents WHERE length(text) >= 3
       |), dt AS (
       |  SELECT doc_id, gram, CAST(rn AS BIGINT) AS dr FROM (
       |    SELECT doc_id, gram,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY COUNT(*) DESC, gram) AS rn
       |    FROM g GROUP BY doc_id, gram)
       |  WHERE rn <= $k
       |), lp AS (
       |  SELECT lang AS cand, gram, CAST(rn AS BIGINT) AS lr FROM (
       |    SELECT lang, gram,
       |           ROW_NUMBER() OVER (PARTITION BY lang
       |             ORDER BY COUNT(*) DESC, gram) AS rn
       |    FROM g GROUP BY lang, gram)
       |  WHERE rn <= $k
       |), langs AS (
       |  SELECT DISTINCT lang AS cand FROM documents
       |), dist AS (
       |  SELECT dt.doc_id, l.cand,
       |         CAST(SUM(COALESCE(abs(dt.dr - lp.lr), $k)) AS BIGINT)
       |           AS rank_distance
       |  FROM dt CROSS JOIN langs l
       |  LEFT JOIN lp ON lp.cand = l.cand AND lp.gram = dt.gram
       |  GROUP BY 1, 2
       |), best AS (
       |  SELECT doc_id, cand, rank_distance,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id
       |           ORDER BY rank_distance, cand) AS rk
       |  FROM dist
       |)
       |SELECT b.doc_id, b.cand AS predicted_lang, d.lang,
       |       CAST(b.cand = d.lang AS INT) AS is_correct, b.rank_distance
       |FROM best b JOIN documents d USING (doc_id)
       |WHERE b.rk = 1 ORDER BY doc_id""".stripMargin
  }

  /** Mirrors TextSim.corpusTokenBudget / Corpus.tokenBudget: the same
    * bit-identical quality expression orders the corpus, the running
    * token total is an exact INTEGER windowed sum (associativity-safe —
    * no sequential-fold workaround needed), and the inclusive-fit rule
    * is the same integer comparison. */
  val corpusTokenBudget: String =
    s"""WITH $statsCtesBody, q AS (
       |  SELECT doc_id, ws_tokens, $qualityExpr AS quality_score
       |  FROM s2
       |), c AS (
       |  SELECT doc_id, ws_tokens, quality_score,
       |         CAST(SUM(ws_tokens) OVER (ORDER BY quality_score DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_tokens
       |  FROM q
       |)
       |SELECT doc_id, ws_tokens, ${r("quality_score")} AS quality_score,
       |       cum_tokens, CAST(cum_tokens <= 10000 AS INT) AS selected
       |FROM c ORDER BY doc_id""".stripMargin

  /** Mirrors TextSim.multimodalPhash / Multimodal.phashClusters: the same
    * 8×-tiled 64-cell slicing ((p·64) // (8·len) ↔ Spark `div`), the same
    * ord/ascii byte values, the EXACT integer bit rule 64·cell > total,
    * and the same full-hash cluster labels — all-integer, bit-exact by
    * construction. */
  /** The shared WITH-chain (through the `cl` cluster CTE) that both
    * multimodalPhash and multimodalPhashNeighbors compose — a named body,
    * not post-hoc string surgery on the finished query, so reformatting
    * one query can't silently break the other. */
  private val phashCtesBody: String = {
    val chunks = (0 until 4).map { k =>
      val lo = 16 * k
      s"""CAST(SUM(CASE WHEN cell >= $lo AND cell <= ${lo + 15} AND bit = 1
         |   THEN (CAST(1 AS BIGINT) << CAST(cell - $lo AS INT))
         |   ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS h$k""".stripMargin
    }.mkString(",\n         ")
    s"""src AS (
       |  SELECT event_id, props, CAST(length(props) AS BIGINT) AS len
       |  FROM events WHERE props IS NOT NULL AND length(props) > 0
       |), ch AS (
       |  SELECT event_id, (p * 64) // (8 * len) AS cell,
       |         CAST(ord(substring(props, CAST(p % len AS INT) + 1, 1))
       |           AS BIGINT) AS v
       |  FROM (SELECT event_id, props, len, unnest(range(8 * len)) AS p
       |        FROM src)
       |), cells AS (
       |  SELECT event_id, cell, CAST(SUM(v) AS BIGINT) AS s
       |  FROM ch GROUP BY 1, 2
       |), hb AS (
       |  SELECT event_id, cell,
       |         CASE WHEN s * 64 >
       |              CAST(SUM(s) OVER (PARTITION BY event_id) AS BIGINT)
       |              THEN 1 ELSE 0 END AS bit
       |  FROM cells
       |), hs AS (
       |  SELECT event_id,
       |         $chunks
       |  FROM hb GROUP BY 1
       |), cl AS (
       |  SELECT h0, h1, h2, h3, MIN(event_id) AS phash_cluster,
       |         CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM hs GROUP BY 1, 2, 3, 4
       |)""".stripMargin
  }

  val multimodalPhash: String =
    s"""WITH $phashCtesBody
       |SELECT hs.event_id, hs.h0, hs.h1, hs.h2, hs.h3,
       |       cl.phash_cluster, cl.cluster_size,
       |       CAST(hs.event_id = cl.phash_cluster AS INT) AS keep
       |FROM hs JOIN cl USING (h0, h1, h2, h3)
       |ORDER BY event_id""".stripMargin

  /** Mirrors TextSim.multimodalPhashNeighbors (Multimodal.phashNeighbors):
    * same cluster table as multimodalPhash, patterns = h0 // 257,
    * 3-band (3+3+2 bit) pigeonhole candidates, xor + bit_count verify at
    * HD ≤ 2. */
  val multimodalPhashNeighbors: String =
    s"""WITH $phashCtesBody, pat AS (
       |  SELECT h0 // 257 AS p, phash_cluster, cluster_size FROM cl
       |), bands AS (
       |  SELECT p, phash_cluster, cluster_size, 0 AS bi, p % 8 AS nib FROM pat
       |  UNION ALL
       |  SELECT p, phash_cluster, cluster_size, 1 AS bi, (p // 8) % 8 AS nib FROM pat
       |  UNION ALL
       |  SELECT p, phash_cluster, cluster_size, 2 AS bi, p // 64 AS nib FROM pat
       |), cand AS (
       |  SELECT DISTINCT a.p AS pa, b.p AS pb,
       |         a.phash_cluster AS cluster_a, b.phash_cluster AS cluster_b,
       |         a.cluster_size AS size_a, b.cluster_size AS size_b
       |  FROM bands a JOIN bands b
       |    ON a.bi = b.bi AND a.nib = b.nib
       |   AND a.phash_cluster < b.phash_cluster
       |)
       |SELECT cluster_a, cluster_b, size_a, size_b,
       |       CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hd8,
       |       CAST(bit_count(xor(pa, pb)) * 8 AS BIGINT) AS hd64
       |FROM cand
       |WHERE bit_count(xor(pa, pb)) <= 2 AND bit_count(xor(pa, pb)) > 0
       |ORDER BY cluster_a, cluster_b""".stripMargin

  val multimodalDedup: String =
    """SELECT event_type AS kind, md5(props) AS payload_md5,
      |       MIN(event_id) AS canonical_id, COUNT(*) AS n_copies,
      |       CAST(MAX(octet_length(encode(props))) AS BIGINT) AS n_bytes
      |FROM events GROUP BY 1, 2 ORDER BY kind, payload_md5""".stripMargin

  /** Mirrors TextSim.textOov (k=10): same (count DESC, term) top-k cut,
    * left-join membership, exact integer counting. */
  val textOov: String =
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
       |), v AS (
       |  SELECT t, COUNT(*) AS c FROM tok GROUP BY 1
       |), topv AS (
       |  SELECT t, 1 AS i FROM v ORDER BY c DESC, t LIMIT 10
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       CAST(COUNT(CASE WHEN topv.i IS NULL THEN 1 END) AS BIGINT) AS n_oov,
       |       ${r("CAST(COUNT(CASE WHEN topv.i IS NULL THEN 1 END) AS DOUBLE) / COUNT(*)")} AS oov_frac
       |FROM tok LEFT JOIN topv USING (t)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirrors TextSim.corpusDatacard: exact integer aggregates, two
    * divisions. */
  val corpusDatacard: String =
    s"""WITH a AS (
       |  SELECT COUNT(*) AS n_docs,
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       |         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       |         CAST(MIN(len(string_split(text, ' '))) AS INTEGER) AS min_tokens,
       |         CAST(MAX(len(string_split(text, ' '))) AS INTEGER) AS max_tokens
       |  FROM documents
       |)
       |SELECT n_docs, n_tokens, n_langs, n_sources, n_unique_texts,
       |       min_tokens, max_tokens,
       |       ${r("1.0 - CAST(n_unique_texts AS DOUBLE) / n_docs")} AS dup_frac,
       |       ${r("CAST(n_tokens AS DOUBLE) / n_docs")} AS mean_tokens
       |FROM a""".stripMargin

  /** Mirrors TextSim.dedupPrefix (k=8): same first-8-token md5 key
    * (DuckDB lists are 1-indexed — list_slice(1, 8) == Spark slice(1, 8)),
    * exact counts, clusters only. */
  val dedupPrefix: String =
    """SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')) AS prefix_md5,
      |       COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
      |FROM documents GROUP BY 1 HAVING COUNT(*) >= 2
      |ORDER BY prefix_md5""".stripMargin

  /** PMI-collocation replay: DuckDB lists are 1-indexed (w[i], w[i+1] over
    * generate_series(1, len-1) == Spark's 0-based sequence(0, size-2));
    * identical ln-ratio association order; top-k cut on the unrounded
    * score, display order on the rounded one — same as textBm25. */
  val corpusColloc: String =
    s"""WITH wd AS (
       |  SELECT string_split(text, ' ') AS w FROM documents
       |), tok AS (
       |  SELECT UNNEST(string_split(text, ' ')) AS t FROM documents
       |), uni AS (
       |  SELECT t, COUNT(*) AS c FROM tok GROUP BY 1
       |), tu AS (
       |  SELECT COUNT(*) AS t_un FROM tok
       |), bi AS (
       |  SELECT w[i] AS t1, w[i + 1] AS t2
       |  FROM wd, UNNEST(generate_series(1, len(w) - 1)) u(i)
       |  WHERE len(w) >= 2
       |), tb AS (
       |  SELECT COUNT(*) AS t_bi FROM bi
       |), pc AS (
       |  SELECT t1, t2, COUNT(*) AS n_pair FROM bi GROUP BY 1, 2
       |  HAVING COUNT(*) >= 5
       |), sc AS (
       |  SELECT t1, t2, n_pair, ua.c AS c_a, ub.c AS c_b,
       |         ln((CAST(n_pair AS DOUBLE) / t_bi) /
       |            ((CAST(ua.c AS DOUBLE) / t_un) * (CAST(ub.c AS DOUBLE) / t_un))) AS score
       |  FROM pc JOIN uni ua ON pc.t1 = ua.t JOIN uni ub ON pc.t2 = ub.t
       |  CROSS JOIN tu CROSS JOIN tb
       |)
       |SELECT t1, t2, n_pair, c_a, c_b, pmi FROM (
       |  SELECT t1, t2, n_pair, c_a, c_b, ${r("score")} AS pmi, score
       |  FROM sc ORDER BY score DESC, t1, t2 LIMIT 50
       |) ORDER BY pmi DESC, t1, t2""".stripMargin

  /** Inverted-index replay: exact per-term stats from the token pairs, the
    * posting sample via the same rank-≤-k filter before aggregation. */
  val textInvertedIndex: String =
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
       |), a AS (
       |  SELECT term, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df,
       |         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |  FROM toks GROUP BY 1
       |), p AS (
       |  SELECT DISTINCT term, doc_id FROM toks
       |), rk AS (
       |  SELECT term, doc_id,
       |         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM p
       |), samp AS (
       |  SELECT term,
       |         array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), '|')
       |           AS postings
       |  FROM rk WHERE rn <= ${TextStats.PostingSampleK} GROUP BY 1
       |)
       |SELECT term, cf, df, min_doc, max_doc, postings
       |FROM a JOIN samp USING (term) ORDER BY term""".stripMargin
}
