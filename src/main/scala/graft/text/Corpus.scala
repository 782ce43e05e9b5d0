package graft.text

import graft.analytics.Ranking
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale LLM training-data pipeline
  * runs between curation and tokenization: sliding-window document chunking,
  * concat-and-split sequence packing, and mixture-weighted source sampling.
  *
  * All decisions key on md5 of stable row ids (reproducible across runs,
  * partitionings, and engines — the same property [[graft.analytics.Sampling]]
  * relies on), never on `rand()` or physical row position.
  */
object Corpus {

  /** Deterministic uniform draw in [0, 2^32) from a stable id: the integer
    * value of md5's first 8 hex digits (same decode the MinHash universal
    * hashing uses; the oracle replays it with a positional sum). */
  private def hashDraw(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Sliding-window chunking: split each document into token windows of
    * `chunkSize` at offsets 0, stride, 2·stride, … — the context-window prep
    * step before tokenization (HuggingFace `return_overflowing_tokens`
    * semantics: a window is emitted iff it is the first or the previous
    * window did not already reach the end of the document; the tail window
    * may be short).
    *
    * Narrow per-row op: the explode factor is bounded by
    * ceil(doc_tokens / stride), no shuffle anywhere — scales linearly and
    * composes with scan pruning.
    */
  def chunk(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"chunk: need 0 < stride <= chunkSize (got chunkSize=$chunkSize stride=$stride)")
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val n = size(col("toks"))
    // keep window at `st` iff it is the first or the previous window
    // (st - stride) ended before the document did
    val starts = filter(sequence(lit(0), n - 1, lit(stride)),
      st => st === 0 || st - stride + chunkSize < n)
    toks.select(col("doc_id"), col("toks"), explode(starts).as("st"))
      .select(col("doc_id"),
        expr(s"st div $stride").as("chunk_idx"),
        col("st").cast("long").as("chunk_start"),
        slice(col("toks"), col("st") + 1, lit(chunkSize)).as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }

  /** Concat-and-split sequence packing (the GPT-style batching step):
    * documents are laid out in a deterministic pseudo-random order
    * (md5(doc_id)) and the concatenated token stream is cut into
    * fixed-`capacity` training sequences; each document is assigned the bin
    * where it starts and its token offset within that bin.
    *
    * The global token cumsum uses [[Ranking.withGlobalRunningSum]] — the
    * bucket-offset construction, NOT a single-partition window — so the
    * layout is computed shuffle-parallel at any corpus size. Token counts
    * are integral, so the bucketed sum is bit-identical to the
    * `SUM() OVER (ORDER BY md5)` the oracle runs.
    */
  def packSequences(docs: DataFrame, capacity: Int = 512): DataFrame = {
    require(capacity > 0, s"packSequences: capacity must be positive (got $capacity)")
    val withTokens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      md5(col("doc_id").cast("string")).as("_pk"))
    // 13 hex digits = 52 bits: exact in a double, and the prefix value is
    // order-monotone w.r.t. the full md5 hex string (fixed-length lowercase
    // hex sorts lexicographically == numerically)
    val sortKey = conv(substring(col("_pk"), 1, 13), 16, 10).cast("double")
    Ranking.withGlobalRunningSum(withTokens, sortKey,
        Seq(col("_pk"), col("doc_id")), col("n_tokens"), cumCol = "_cum_end")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(_cum_end - n_tokens) div $capacity").as("bin_id"),
        expr(s"(_cum_end - n_tokens) % $capacity").as("bin_offset"))
  }

  /** Mixture-weighted source sampling (the data-mixing step): allocate a
    * global token budget of `budgetFrac` × corpus tokens EQUALLY across
    * sources, convert each source's allocation into a per-source sampling
    * rate min(1, budget / source_tokens), and keep each document iff its
    * md5 draw falls below the rate — over-represented sources are downsampled
    * toward the target mixture, under-represented ones kept whole.
    *
    * Plan shape: two tiny aggregates (per-source totals + corpus totals,
    * O(sources) rows) broadcast back onto the fact scan; the per-document
    * decision is a narrow filter. On 100 TB the document side never
    * shuffles. The rate arithmetic is a single double expression evaluated
    * identically (IEEE-754) in Spark and DuckDB, and the draw threshold is
    * integer-compared, so the kept set is bit-reproducible.
    */
  def mixtureSample(docs: DataFrame, budgetFrac: Double = 0.5): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"mixtureSample: budgetFrac must be in (0, 1] (got $budgetFrac)")
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val bySource = toks.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val totals = toks.agg(sum("n_tokens").as("total_tokens"),
      countDistinct(col("source")).as("n_sources"))
    val rates = bySource.crossJoin(broadcast(totals))
      .select(col("source"),
        least(lit(1.0), col("total_tokens").cast("double") * budgetFrac /
          col("n_sources") / col("src_tokens")).as("sample_rate"))
    toks.join(broadcast(rates), Seq("source"))
      .filter(hashDraw(col("doc_id")) < floor(col("sample_rate") * 4294967296.0))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("sample_rate"))
  }

  /** Temperature-scaled source mixing (α = 0.5, the multilingual-LM
    * convention): target token share p_i ∝ n_i^α, so small sources are
    * upsampled relative to their natural share and dominant crawls are
    * tempered — the step between raw provenance stats and a training
    * mixture (cf. multilingual BERT / XLM-R sampling). Per-source rate
    *
    *   rate_i = min(1, total·budget · (√n_i / Σ_j √n_j) / n_i)
    *
    * with the same deterministic md5 hash-draw membership as
    * [[mixtureSample]]. α is FIXED at ½ so the power is IEEE sqrt
    * (correctly rounded in every engine, unlike pow); Σ_j √n_j folds in
    * source order (collect the ≤|sources| summands, array_sort,
    * sequential aggregate) because the rate feeds a row-membership
    * FILTER — association noise in that sum would flip document
    * inclusion, not just a rounded digit. Two tiny aggregates broadcast
    * back; the document stream itself never shuffles. */
  def temperatureSample(docs: DataFrame, budgetFrac: Double = 0.5): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"temperatureSample: budgetFrac must be in (0, 1] (got $budgetFrac)")
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val bySource = toks.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val z = bySource
      .agg(collect_list(struct(col("source"),
          sqrt(col("src_tokens").cast("double")).as("s"))).as("_l"),
        sum(col("src_tokens")).as("total_tokens"))
      .select(col("total_tokens"),
        expr("aggregate(array_sort(_l), 0D, (acc, e) -> acc + e.s)").as("z"))
    val rates = bySource.crossJoin(broadcast(z))
      .select(col("source"),
        least(lit(1.0),
          col("total_tokens").cast("double") * budgetFrac *
            (sqrt(col("src_tokens").cast("double")) / col("z")) /
            col("src_tokens")).as("sample_rate"))
    toks.join(broadcast(rates), Seq("source"))
      .filter(hashDraw(col("doc_id")) <
        floor(col("sample_rate") * 4294967296.0))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("sample_rate"))
  }

  /** Per-source quality quota (the "keep the best X% of every source"
    * curation step): rank each source's documents by quality score
    * (descending, doc_id tie-break) and keep the top ceil(frac · n_source).
    * Per-source ranking keeps the quota exact per provenance bucket instead
    * of letting one high-quality source crowd out the rest of the mixture.
    *
    * Scale shape: the window partitions by `source` — per-source partitions
    * are the skew axis at 100 TB (one giant crawl source = one giant
    * partition). For that regime, swap the exact rank for a per-source
    * score threshold from `percentile_approx` (tiny aggregate, broadcast
    * back, narrow filter — no per-source sort); the exact rank stays the
    * oracle-checkable semantics, the threshold form is the documented
    * approximate scale path (same trade as window_median_approx). */
  /** Corpus-level duplicated-span removal — the C4/CCNet boilerplate step
    * (C4 dropped any three-sentence span occurring more than once in the
    * corpus; Lee et al. 2022 use fixed token windows): cut every document
    * into consecutive non-overlapping `spanTokens`-token spans, count each
    * distinct span's document frequency corpus-wide, REMOVE spans appearing
    * in >= `maxDocs` documents, and rebuild each document from its surviving
    * spans in order. Unlike the `dedup_*` pair generators this REWRITES the
    * corpus — the output is the cleaned text plus per-doc drop counts.
    *
    * Scale shape: span explode is narrow and bounded (n_tokens/spanTokens
    * rows per doc); the document-frequency count is a partial+final hash
    * aggregate (viral spans collapse map-side); the count join back is 1:1
    * equi on the span key (pre-aggregated right side, no row
    * multiplication — a hot boilerplate span skews one shuffle partition,
    * which AQE skew-join splits); the rebuild is one doc_id-keyed
    * aggregate. Span strings compare exactly, so the kept set and the
    * rebuilt text are bit-identical on any engine. */
  def stripDupSpans(docs: DataFrame, spanTokens: Int = 8,
      maxDocs: Int = 3): DataFrame =
    flaggedSpans(docs, spanTokens, maxDocs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("_drop"), 1L).otherwise(0L)).as("n_spans_dropped"),
        cleanTextAgg)

  /** Shared front half of the span-dedup family: cut into non-overlapping
    * `spanTokens`-token spans, count corpus-wide document frequency, flag
    * spans appearing in >= `maxDocs` documents (`_drop`). */
  private def flaggedSpans(docs: DataFrame, spanTokens: Int,
      maxDocs: Int): DataFrame = {
    require(spanTokens > 0 && maxDocs > 1,
      s"stripDupSpans: need spanTokens > 0, maxDocs > 1 (got $spanTokens, $maxDocs)")
    val spans = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .selectExpr("doc_id",
        s"posexplode(transform(sequence(0, (size(toks) + ${spanTokens - 1}) div $spanTokens - 1), " +
          s"i -> array_join(slice(toks, i * $spanTokens + 1, $spanTokens), ' '))) AS (span_idx, span)")
    val counts = spans.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("_n_docs"))
    spans.join(counts, Seq("span"))
      .withColumn("_drop", col("_n_docs") >= maxDocs)
  }

  private def cleanTextAgg =
    array_join(
      transform(
        array_sort(collect_list(
          when(!col("_drop"), struct(col("span_idx"), col("span"))))),
        x => x.getField("span")),
      " ").as("clean_text")

  /** [[stripDupSpans]] with maximal-span accounting (Lee et al. 2022's
    * longest-match semantics approximated on fixed windows): runs of
    * ADJACENT duplicated spans within a document merge into ONE maximal
    * removed span before the drop accounting, so a 20-token duplicated
    * region reports as one removal event (`n_runs_dropped`, with
    * `max_run_spans` the longest merged run in windows) instead of 2–3
    * independent window hits — the per-removal statistics a curation run
    * audits. The kept text is identical to [[stripDupSpans]] (merging
    * adjacent drops changes what a removal IS, not which tokens survive);
    * the known fixed-window boundary artifact remains: a duplicated run's
    * tail shorter than `spanTokens` shares its window with following
    * unique text, so that window's df stays low and the tail survives
    * (true longest-match needs suffix automata — out of scope; the spec
    * pins this residue explicitly).
    *
    * Scale shape: adds one doc_id-keyed sort window (run detection via
    * lag + running sum — bounded by tokens/spanTokens rows per doc) and a
    * (doc_id, run)-keyed count on the dropped subset; everything else is
    * [[stripDupSpans]]'s cost envelope. */
  def stripDupSpansMaximal(docs: DataFrame, spanTokens: Int = 8,
      maxDocs: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_idx")
    val run = flaggedSpans(docs, spanTokens, maxDocs)
      .withColumn("_run_start",
        col("_drop") && coalesce(!lag(col("_drop"), 1).over(w), lit(true)))
      .withColumn("_run_id",
        sum(when(col("_run_start"), 1L).otherwise(0L)).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
    val maxRun = run.filter(col("_drop"))
      .groupBy("doc_id", "_run_id").agg(count(lit(1)).as("_run_len"))
      .groupBy("doc_id").agg(max(col("_run_len")).as("max_run_spans"))
    run.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("_drop"), 1L).otherwise(0L)).as("n_spans_dropped"),
        sum(when(col("_run_start"), 1L).otherwise(0L)).as("n_runs_dropped"),
        cleanTextAgg)
      .join(maxRun, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"), col("n_spans_dropped"),
        col("n_runs_dropped"),
        coalesce(col("max_run_spans"), lit(0L)).as("max_run_spans"),
        col("clean_text"))
  }

  def qualityQuota(docs: DataFrame, frac: Double = 0.5): DataFrame = {
    require(frac > 0 && frac <= 1,
      s"qualityQuota: frac must be in (0, 1] (got $frac)")
    val q = TextStats.withStats(docs)
      .select(col("doc_id"), col("source"), col("quality_score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("source")
    q.select(col("*"),
        row_number().over(w).cast("long").as("quality_rank"),
        count(lit(1)).over(wn).as("_n"))
      .filter(col("quality_rank") <= ceil(col("_n") * frac))
      .drop("_n")
  }

  /** Token-budget selection: rank the corpus by quality (best first) and
    * mark the prefix whose cumulative whitespace-token count stays within
    * `budgetTokens` — "give me the best B-token subset", the final cut a
    * pretraining data pipeline makes after scoring. A doc is selected
    * when its own INCLUSIVE running total fits (the first overflowing doc
    * is dropped, not truncated — whole-document selection).
    *
    * The running total is the exact-integer bucket-offset construction
    * ([[graft.analytics.Ranking.withGlobalRunningSum]] keyed on −quality
    * with doc_id tie-break) — no single-partition window, no float
    * accumulation; the quality ordering key itself is the bit-identical
    * [[TextStats.withStats]] expression on both engines. Emits EVERY doc
    * with its rank, running total, and selected flag, so the cut line is
    * auditable. */
  def tokenBudget(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "tokenBudget: budget must be positive")
    val q = TextStats.withStats(docs)
      .select(col("doc_id"), col("ws_tokens"), col("quality_score"))
    graft.analytics.Ranking.withGlobalRunningSum(
        q, -col("quality_score"),
        Seq(col("quality_score").desc, col("doc_id")), col("ws_tokens"),
        cumCol = "cum_tokens")
      .select(col("doc_id"), col("ws_tokens"), col("quality_score"),
        col("cum_tokens"),
        (col("cum_tokens") <= budgetTokens).cast("int").as("selected"))
  }

  /** Curriculum ordering: bucket the corpus into quality deciles (decile 1
    * = best), deterministically shuffle WITHIN each decile (md5 draw), and
    * emit the global training order — easy → hard curriculum with no
    * quality-rank ordering artifacts inside a bucket.
    *
    * Both global numberings use the range-bucket + offsets scheme
    * ([[graft.analytics.Ranking.withGlobalRowNumber]]) — no
    * single-partition window at any point. The final pass buckets by
    * decile (`buckets`-way parallelism); for corpora where n/buckets
    * exceeds a comfortable partition, raise `buckets` — the decile
    * arithmetic generalizes to any bucket count. */
  def curriculum(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val q = TextStats.withStats(docs).select(col("doc_id"), col("quality_score"))
    val (ranked, n) = graft.analytics.Ranking.withGlobalRowNumber(
      q, -col("quality_score"), Seq(col("quality_score").desc, col("doc_id")),
      rnCol = "_qrn")
    val withDecile = ranked
      .withColumn("decile", expr(s"1L + ((_qrn - 1L) * $buckets) div ${n}L"))
      .withColumn("_draw", hashDraw(col("doc_id")))
    val (ordered, _) = graft.analytics.Ranking.withGlobalRowNumber(
      withDecile, col("decile"),
      Seq(col("decile"), col("_draw"), col("doc_id")),
      rnCol = "curriculum_rank")
    ordered.drop("_qrn", "_draw")
  }
}
