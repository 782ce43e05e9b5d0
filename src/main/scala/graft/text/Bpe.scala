package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-training
  * step that turns the [[TextStats.vocab]] word-count pass into an actual
  * merge table.
  *
  * Algorithm, exactly the reference BPE trainer's shape: operate on the
  * WORD-TYPE table (distinct word, occurrence count), never the raw corpus —
  * at 100 TB the corpus has ~10¹² tokens but only ~10⁷ word types, so after
  * ONE corpus-wide token count every round touches |V| rows. Each round:
  *
  *  1. adjacent symbol pairs per word, weighted by the word's corpus count —
  *     a narrow per-row array transform + one tiny pair-keyed aggregate;
  *  2. the most frequent pair wins (ties: lexicographic (left, right) —
  *     deterministic across engines);
  *  3. every word's symbol list merges that pair greedily left-to-right
  *     (non-overlapping, the textbook scan) via a fold over its own symbols
  *     — narrow, no shuffle.
  *
  * The K winning pairs ARE the model (the merge table every BPE tokenizer
  * ships); collecting one (pair, freq) row per round to the driver is the
  * algorithm, not a scale compromise. The per-round vocab stays distributed
  * and localCheckpointed (bounded lineage across rounds).
  */
object Bpe {

  val DefaultMerges = 8

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

  private def run(docs: DataFrame, merges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var vocab = wordTypes(docs).localCheckpoint()
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      // single-symbol words carry no pair (and Spark's sequence(0, -1)
      // would run DESCENDING, fabricating null pairs — filter first)
      val best = vocab.filter(size(col("sym")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(sym) - 2), " +
            "i -> struct(sym[i] AS a, sym[i+1] AS b))")).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, f) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        rank += 1
        out += ((rank.toLong, a, b, a + b, f))
        vocab = vocab
          .withColumn("sym", expr(mergeExpr(a, b)))
          .localCheckpoint()
      }
    }
    val mergeTable = spark.createDataFrame(
      spark.sparkContext.parallelize(out.result().map(Row.fromTuple), 1),
      StructType(Seq(
        StructField("merge_rank", LongType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
    (mergeTable, vocab)
  }
}
