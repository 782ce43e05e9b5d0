package graft.oracle

/** Spark-dialect SQL surface for the registered queries.
  *
  * The oracle statements in [[OracleSql]]/[[TextSimSql]] are written for
  * DuckDB (the cross-engine correctness gate). Most of them are ANSI
  * enough to run on `spark.sql` unchanged; the rest differ only in
  * PARSER-level tokens (DuckDB's bare `VARCHAR`, the `//` integer-division
  * operator, `IGNORE NULLS` inside the call parens) or in routine NAMES
  * (`epoch_us` vs `unix_micros`). [[dialect]] bridges exactly those
  * mechanical gaps, so one statement text serves both engines; queries
  * whose oracle uses genuinely DuckDB-only constructs (list literals,
  * in-aggregate ORDER BY, recursive-CTE replays of window recurrences)
  * get a hand-written Spark statement in [[overrides]] instead.
  *
  * The contract for every statement this object serves: byte-for-byte
  * value equality with the registered DataFrame plan, enforced by
  * SqlParitySpec over the curated [[covered]] list — a SQL user and a
  * DataFrame user of the engine get the same rows.
  */
object SparkSql {

  /** Mechanical DuckDB→Spark dialect bridge. Every rule is a parser-level
    * or routine-name substitution with identical semantics on the oracle
    * corpus (value equality is separately enforced per query by
    * SqlParitySpec — a rule that ever changed a value would fail there):
    *  - `AS MATERIALIZED` — DuckDB CTE-inlining hint, semantically void.
    *  - bare `VARCHAR` — Spark's parser demands a length; STRING is the
    *    same type.
    *  - (`epoch_us` is bridged as a registered compat FUNCTION in
    *    GraftExtensions, not text — it must cast TIMESTAMP_NTZ inputs
    *    before unix_micros.)
    *  - ` // ` → ` div ` — integer division operator.
    *  - `x IGNORE NULLS)` → `x) IGNORE NULLS` — same window modifier,
    *    Spark wants it outside the call parens.
    */
  def dialect(sql: String): String = {
    val textual = sql
      .replace(" AS MATERIALIZED (", " AS (")
    .replace(" AS VARCHAR)", " AS STRING)")
    .replace(" // ", " div ")
    .replace(" IGNORE NULLS)", ") IGNORE NULLS")
    // DuckDB hex decode: ('0x' || H)::BIGINT — Spark's CAST does not read
    // 0x strings, so route through the engine's hex_to_long compat
    // function (conv(H, 16, 10)). The two replacements are a pair: the
    // first consumes the idiom's opening, the second its `)::BIGINT`
    // close (every `)::BIGINT` in the corpus is this idiom)
    .replace("('0x' || ", "(hex_to_long(")
    .replace(")::BIGINT", "))")
      // DuckDB's regexp_replace global flag — Spark's regexp_replace is
      // global already (its optional 4th arg means position, not flags)
      .replace(", 'g')", ")")
    listLiterals(indexing(orderedLists(laterals(hexDigits(extracts(textual))))))
  }

  /** Field/function spellings with exact Spark twins: `isodow` (Mon=1) is
    * `weekday()+1`; DuckDB's multi-argument `grouping(a, b)` bitmask is
    * Spark's `grouping_id(a, b)`. */
  private def extracts(sql: String): String = {
    val iso = raw"(?i)EXTRACT\(isodow FROM ([^)]+)\)".r
      .replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
        s"(weekday(${m.group(1)}) + 1)"))
    raw"grouping\(([^()]*,[^()]*)\)".r.replaceAllIn(iso,
      m => java.util.regex.Matcher.quoteReplacement(s"grouping_id(${m.group(1)})"))
  }

  /** The md5-hex→integer digit fold `(instr('0123456789abcdef', X) - 1)
    * * 16^k`: DuckDB's instr returns BIGINT so the fold stays exact, but
    * Spark's returns INT and the 16^k multiply overflows 32 bits — widen
    * the digit before the arithmetic. */
  private def hexDigits(sql: String): String =
    raw"\(instr\('0123456789abcdef', (substring\([^)]*\))\) - 1\)".r
      .replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
        s"(CAST(instr('0123456789abcdef', ${m.group(1)}) - 1 AS BIGINT))"))

  /** `FROM rel, UNNEST(listexpr) alias(col)` → Spark's
    * `FROM rel LATERAL VIEW explode(listexpr) alias AS col` (the corpus
    * writes the lateral clause to end its line, so a line-anchored greedy
    * match captures the full list expression; the range/generate_series
    * inside resolve through the compat function registry). */
  private def laterals(sql: String): String =
    raw"(?m), UNNEST\((.*)\) (\w+)\((\w+)\)\s*$$".r
      .replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
        s" LATERAL VIEW explode(${m.group(1)}) ${m.group(2)} AS ${m.group(3)}"))

  /** DuckDB's in-aggregate ORDER BY: `list(x ORDER BY y)` → sort structs,
    * strip the key. Both engines break exact ties identically here because
    * the struct comparison falls through to the VALUE after the key — and
    * the corpus orders by keys that determine the value anyway. */
  private def orderedLists(sql: String): String =
    raw"list\(([A-Za-z0-9_. ]+?) ORDER BY ([A-Za-z0-9_. ]+?)\)".r
      .replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
        s"transform(array_sort(collect_list(struct(${m.group(2)} AS _o, " +
          s"${m.group(1)} AS _v))), s -> s._v)"))

  /** DuckDB list indexing is 1-BASED (and -1 = last) — exactly Spark's
    * element_at, NOT Spark's 0-based `l[i]` subscript (which parses fine
    * and silently reads the wrong element). Slices (`l[a:b]`) don't
    * rewrite and stay DuckDB-only. */
  private def indexing(sql: String): String = {
    // Spark's element_at demands an INT index; DuckDB subscripts take
    // BIGINT (and the compat range()/len() produce BIGINTs) — cast
    val qualified = raw"(\w+)\.(\w+)\[([^\]\[:]+)\]".r
    val bare = raw"(?<![\w.])(\w+)\[([^\]\[:]+)\]".r
    val s1 = qualified.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
      s"element_at(${m.group(1)}.${m.group(2)}, CAST(${m.group(3)} AS INT))"))
    bare.replaceAllIn(s1, m => java.util.regex.Matcher.quoteReplacement(
      s"element_at(${m.group(1)}, CAST(${m.group(2)} AS INT))"))
  }

  /** DuckDB list literals: `['x']` → array('x'); `[]::VARCHAR[]` →
    * a typed empty array. */
  private def listLiterals(sql: String): String =
    raw"\[('[^']*')\]".r.replaceAllIn(
      sql.replace("[]::VARCHAR[]", "CAST(array() AS ARRAY<STRING>)"),
      m => java.util.regex.Matcher.quoteReplacement(s"array(${m.group(1)})"))

  /** Hand-written Spark statements for queries whose oracle text uses
    * DuckDB-only constructs. Keyed by registry name; each must produce
    * the registered DataFrame plan's rows exactly. */
  val overrides: Map[String, String] = Map.empty

  /** The Spark-dialect statement for a registry query: the override when
    * one exists, else the dialect-bridged oracle text. */
  def statement(name: String): Option[String] =
    overrides.get(name)
      .orElse(graft.SparkEntry.oracleSql.get(name).map(dialect))

  /** The CERTIFIED SQL-parity surface: queries whose [[statement]] runs on
    * `spark.sql` and matches the registered DataFrame plan value-for-value
    * (SqlParitySpec enforces every entry on every test run; regenerate the
    * list with the SqlParityScan dev tool after touching the bridge or an
    * oracle statement). */
  val covered: Seq[String] = Seq(
    "abtest_ztest", "agg_bootstrap", "agg_cms_topk",
    "agg_corr", "agg_distinct", "agg_gini",
    "agg_histogram", "agg_hll", "agg_mode",
    "agg_moments", "agg_quantile_sketch", "agg_quantiles",
    "agg_rollup", "agg_stats", "agg_trimmed_mean",
    "agg_weighted_median", "assoc_pairs", "bars_adjust",
    "bars_anchored_vwap", "bars_candles", "bars_dollar",
    "bars_gapfill", "bars_renko", "bars_resample",
    "class_balance", "corpus_colloc", "corpus_datacard",
    "corpus_dsir", "corpus_vocab", "corpus_vocab_overlap",
    "cv_folds", "cv_purged", "decontam_pairs",
    "decontaminate_train", "dedup_containment", "dedup_cross_source",
    "dedup_density", "dedup_exact", "dedup_exact_norm",
    "dedup_fuzzy", "dedup_minhash", "dedup_minhash_pairs",
    "dedup_prefix", "dedup_shared_ngrams", "dedup_simhash",
    "dedup_threshold_sweep", "doc_chunks", "dq_checks",
    "dq_kanon", "dq_quarantine", "drift_chi2",
    "drift_js", "drift_ks", "drift_psi",
    "drift_wasserstein", "emb_dim_stats", "events_acf",
    "events_anomaly", "events_attribution", "events_burst",
    "events_dau_wau", "events_dispersion", "events_entropy",
    "events_forecast_eval", "events_hll_sliding", "events_markov",
    "events_mi", "events_paths", "events_quantile_sliding",
    "events_stationarity", "events_time_to_convert", "events_user_overlap",
    "feat_alligator", "feat_amihud", "feat_aroon",
    "feat_atr", "feat_awesome", "feat_bollinger",
    "feat_cci", "feat_chaikin_osc", "feat_chande",
    "feat_chandelier", "feat_choppiness", "feat_cmf",
    "feat_connors_rsi", "feat_coppock", "feat_donchian",
    "feat_dpo", "feat_drawdown", "feat_elder_ray",
    "feat_eom", "feat_fisher", "feat_force",
    "feat_garch", "feat_heikin_ashi", "feat_hull",
    "feat_ichimoku", "feat_keltner", "feat_kst",
    "feat_kyle_lambda", "feat_mfi", "feat_momentum",
    "feat_obv", "feat_pivot_points", "feat_qstick",
    "feat_range_vol", "feat_riskadj", "feat_roll_spread",
    "feat_rvol", "feat_squeeze", "feat_stochastic",
    "feat_temporal", "feat_ulcer", "feat_ultimate",
    "feat_underwater", "feat_vhf", "feat_vol_of_vol",
    "feat_volatility", "feat_vortex", "feat_vpin",
    "feat_vwap", "feat_vwma", "feat_williams_r",
    "feature_target_corr", "funnel_events", "funnel_sessions",
    "graph_degrees", "ingest_bars", "ingest_bars_csv",
    "ingest_bars_json", "ingest_bars_orc", "join_anti",
    "join_asof", "join_asof_nearest", "join_asof_tol",
    "join_full", "join_outer", "join_range",
    "join_semi", "join_star", "json_fields",
    "lake_compact_plan", "lake_upsert", "lake_zorder",
    "ml_auc", "ml_calibration", "ml_hash_features",
    "ml_ks_stat", "ml_lift", "ml_ndcg",
    "ml_pr_auc", "ml_roc", "ml_scale_train",
    "multimodal_frames", "multimodal_meta", "orders_backlog",
    "orders_basket", "pack_sequences", "pivot_events",
    "q10_returned_items", "q11_important_parts", "q12_return_priority",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_part_variety", "q17_small_quantity", "q18_large_orders",
    "q19_discounted_revenue", "q1_pricing", "q20_excess_stock",
    "q21_sole_return", "q22_wealthy_idle", "q2_min_unit_cost",
    "q3_shipping", "q4_priority_count", "q5_local_supplier",
    "q6_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "quality_perplexity_buckets", "retention_survival",
    "sample_bernoulli", "sample_stratified", "sample_weighted",
    "scd2_asof", "scd2_history", "seasonality_decompose",
    "seasonality_profile", "sessionize", "sessions_concurrency",
    "set_ops", "sim_label_centroids", "snapshot_diff",
    "supplier_hhi", "target_encode", "target_encode_oof",
    "targets_classification", "targets_regression", "temporal_split",
    "text_bm25", "text_boilerplate", "text_entropy",
    "text_fingerprint", "text_keywords", "text_langid_ngram",
    "text_logprob", "text_logprob_bigram", "text_oov",
    "text_pii_summary", "text_readability", "text_redact",
    "text_repetition", "text_tfidf", "text_ttr",
    "topk_events", "topk_per_user", "union_symbols",
    "unpivot_events", "user_burstiness", "user_cadence",
    "user_churn", "user_pareto", "user_rfm",
    "value_counts", "window_autocorr", "window_beta",
    "window_corr", "window_firstlast", "window_hurst",
    "window_median", "window_outliers", "window_rank",
    "window_skew", "window_sliding", "window_streak",
    "window_trend", "window_tumbling", "window_winsorize",
    "xsec_rank")
}
