package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.source.Checkpoint.PinOps
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-training
  * step that turns the [[TextStats.vocab]] word-count pass into an actual
  * merge table.
  *
  * Algorithm, exactly the reference BPE trainer's shape: operate on the
  * WORD-TYPE table (distinct word, occurrence count), never the raw corpus —
  * at 100 TB the corpus has ~10¹² tokens but only ~10⁷ word types. Pair
  * counts are maintained INCREMENTALLY (the HuggingFace-trainer shape):
  *
  *  1. ONE initial pass extracts all adjacent symbol pairs weighted by the
  *     word's corpus count into a distributed (a, b, freq) table — the only
  *     round that shuffles pair volume proportional to Σ|word|;
  *  2. each round the most frequent pair wins (ties: lexicographic
  *     (left, right) — deterministic across engines), read straight off the
  *     maintained pair table (a TakeOrdered, no recount);
  *  3. ONLY the words whose symbol list contains the winning pair adjacently
  *     are re-segmented (greedy left-to-right non-overlapping fold, narrow);
  *     their before/after pair multisets become ± deltas folded into the
  *     pair table — so round cost is O(affected words + |pair table|), not
  *     O(|V| · avg word length). At 32k real-tokenizer merges the late
  *     rounds touch a sliver of the vocab; a full recount per round would
  *     be 32k shuffles of ~10⁸ weighted pair rows each.
  *
  * The K winning pairs ARE the model (the merge table every BPE tokenizer
  * ships); collecting one (pair, freq) row per round to the driver is the
  * algorithm, not a scale compromise. The per-round vocab and pair table
  * stay distributed and localCheckpointed (bounded lineage across rounds);
  * the conditional merge is applied in place (`when(hasPair, …)`), so
  * unaffected words pass through the per-round map untouched.
  */
object Bpe {

  val DefaultMerges = 8

  /** Driver-memory guard for the pair-count map: distinct adjacent symbol
    * pairs are bounded by Σ(|word|−1) over word types, which can reach ~10⁸
    * on an adversarially diverse web corpus. 2²⁴ entries ≈ 1.5 GB of map
    * overhead — past that we warn (once) rather than fail, since the run is
    * still correct, just driver-heavy. */
  val PairCountWarnEntries: Int = 1 << 24

  private def warnPairCount(size: Int, warned: Boolean): Boolean = {
    if (!warned && size > PairCountWarnEntries)
      System.err.println(
        s"[graft.Bpe] WARN: driver pair-count map at $size entries " +
          s"(> $PairCountWarnEntries) — consider pre-filtering rare word " +
          "types or raising driver memory")
    warned || size > PairCountWarnEntries
  }

  /** (word, cnt, sym) — word-type table with per-char symbol arrays.
    * Char split via substring so the oracle's identical 1-indexed
    * substring replay matches exactly. */
  private def wordTypes(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("sym", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Greedy left-to-right merge of pair (a, b) into `ab` over a symbol
    * array, as a fold: append each symbol unless it closes the pair with
    * the accumulator's last element — which reproduces the textbook
    * non-overlapping scan ("b b b" → ["bb", "b"], "a b a b" → ["ab","ab"]).
    * Symbols are corpus tokens' characters (alphanumeric), so literal
    * injection into the lambda is quote-safe; guarded anyway. */
  private def mergeExpr(a: String, b: String): String = {
    require(!(a + b).exists(c => c == '\'' || c == '\\'),
      s"BPE symbols must not contain quotes/backslashes: '$a', '$b'")
    s"aggregate(sym, CAST(array() AS array<string>), (acc, x) -> " +
      s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$a' AND x = '$b' " +
      s"THEN concat(slice(acc, 1, size(acc) - 1), array('$a$b')) " +
      s"ELSE concat(acc, array(x)) END)"
  }

  /** Learn `merges` BPE merges; returns (merge_rank, lhs, rhs, merged,
    * freq) — the merge table, one row per learned merge in order. */
  def learnMerges(docs: DataFrame, merges: Int = DefaultMerges): DataFrame =
    run(docs, merges)._1

  /** The word-type table AFTER the learned merges: (word, cnt,
    * n_subwords) — i.e. each word's BPE segmentation length under the
    * `merges`-merge model. The corpus-side application is then one
    * word-keyed join (broadcast when the vocab fits, plain shuffle join at
    * web-corpus vocab) — raw text is never re-scanned per merge. */
  def segmented(docs: DataFrame, merges: Int = DefaultMerges): DataFrame =
    run(docs, merges)._2
      .select(col("word"), col("cnt"),
        size(col("sym")).cast("long").as("n_subwords"))

  /** Adjacent-pair presence test. Safe for size-1 symbol lists without a
    * guard: `sequence(0, -1)` runs descending to [0, -1], but `sym[-1]` /
    * `sym[size]` are null under non-ANSI element access, the equality
    * yields null, and `exists` over no-true-elements is falsy. */
  private def hasPairExpr(a: String, b: String): String = {
    require(!(a + b).exists(c => c == '\'' || c == '\\'),
      s"BPE symbols must not contain quotes/backslashes: '$a', '$b'")
    s"size(sym) >= 2 AND exists(sequence(0, size(sym) - 2), " +
      s"i -> sym[i] = '$a' AND sym[i+1] = '$b')"
  }

  /** Weighted adjacent pairs of a (cnt, sym) table: one row per pair
    * occurrence, weight = ±cnt. Single-symbol words carry no pair (and
    * Spark's sequence(0, -1) would run DESCENDING, fabricating null pairs
    * — filter first). */
  private def pairWeights(vocab: DataFrame, sign: Long): DataFrame =
    vocab.filter(size(col("sym")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(0, size(sym) - 2), " +
          "i -> struct(sym[i] AS a, sym[i+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        (col("cnt") * sign).as("w"))

  private def run(docs: DataFrame, merges: Int): (DataFrame, DataFrame) = {
    val (t, v, _) = runWithStats(docs, merges, collectStats = false)
    (t, v)
  }

  /** Core loop; `collectStats = true` additionally counts the words
    * touched per round (an extra narrow job per round — spec/diagnostic
    * use only). Returns (mergeTable, vocab, touchedWordsPerRound).
    *
    * The aggregated pair-count table lives on the DRIVER as a mutable map
    * — it is WORD-TYPE-sized, never corpus-sized: distinct adjacent symbol
    * pairs are bounded by the total adjacent slots over word types
    * (Σ(|word|−1) ≤ ~10⁸ at 10⁷ word types early on, shrinking as merges
    * coalesce symbols; typical corpora stay in the 10⁵–10⁷ range). That is
    * driver-safe for realistic vocabularies but NOT unconditionally tiny,
    * so growth past [[Bpe.PairCountWarnEntries]] logs a warning (mirroring
    * the `LinkPredMaxCounterEntries` guard in analytics.Graph) instead of
    * silently pressuring driver memory. Each
    * round collects only the AGGREGATED ± deltas (distinct pairs touched
    * by the winning merge), so driver traffic per round is proportional
    * to the merge's blast radius, not the corpus. The argmax is then a
    * driver-side scan — no Spark job, with frequency ties broken in
    * UTF-8 byte order (exactly Spark's UTF8String / DuckDB binary
    * comparison — valid for ANY text, not just the BMP). */
  private[graft] def runWithStats(docs: DataFrame, merges: Int,
      collectStats: Boolean): (DataFrame, DataFrame, Seq[Long]) = {
    val spark = docs.sparkSession
    var vocab = wordTypes(docs).pinned()
    // the ONE full pair count; every later round folds ± deltas into it
    val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
    pairWeights(vocab, 1L).groupBy("a", "b").agg(sum(col("w")).as("w"))
      .collect().foreach { r =>
        pairCnt((r.getString(0), r.getString(1))) = r.getLong(2)
      }
    var pairCntWarned = warnPairCount(pairCnt.size, warned = false)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    val touched = Seq.newBuilder[Long]
    // tie-break in UTF-8 BYTE order (= Spark UTF8String / DuckDB binary
    // comparison), not Java's UTF-16 code-unit compareTo — they diverge
    // when a supplementary-plane symbol ties against a U+E000..U+FFFF one
    implicit val utf8Ord: Ordering[String] = graft.Utf8Order.ofString
    var rank = 0
    while (rank < merges && pairCnt.nonEmpty) {
      val ((a, b), f) = pairCnt.minBy { case ((pa, pb), w) => (-w, pa, pb) }(
        Ordering.Tuple3(Ordering.Long, utf8Ord, utf8Ord))
      rank += 1
      out += ((rank.toLong, a, b, a + b, f))
      val hasPair = expr(hasPairExpr(a, b))
      // ONE full-vocab pass per round: the conditional merge, keeping the
      // pre-merge symbols + a changed flag so the delta pass below reads
      // only the (checkpointed) touched sliver — never the whole vocab.
      val staged = vocab
        .select(col("word"), col("cnt"), col("sym").as("old_sym"),
          when(hasPair, expr(mergeExpr(a, b))).otherwise(col("sym"))
            .as("sym"),
          hasPair.as("changed"))
        .pinned()
      if (collectStats)
        touched += staged.filter(col("changed")).count()
      val changed = staged.filter(col("changed"))
      // pair-table update: remove the changed words' old pairs, add their
      // re-segmented pairs — everything else is untouched
      pairWeights(changed.select(col("cnt"), col("old_sym").as("sym")), -1L)
        .union(pairWeights(changed.select(col("cnt"), col("sym")), 1L))
        .groupBy("a", "b").agg(sum(col("w")).as("w"))
        .collect().foreach { r =>
          val k = (r.getString(0), r.getString(1))
          val nw = pairCnt.getOrElse(k, 0L) + r.getLong(2)
          if (nw > 0L) pairCnt(k) = nw else pairCnt.remove(k)
        }
      pairCntWarned = warnPairCount(pairCnt.size, pairCntWarned)
      vocab = staged.select(col("word"), col("cnt"), col("sym"))
    }
    val mergeTable = spark.createDataFrame(
      spark.sparkContext.parallelize(out.result().map(Row.fromTuple), 1),
      StructType(Seq(
        StructField("merge_rank", LongType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
    (mergeTable, vocab, touched.result())
  }

}
