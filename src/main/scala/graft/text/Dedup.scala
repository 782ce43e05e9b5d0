package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.source.Checkpoint.PinOps

/** Deduplication operators over the documents table: exact, MinHash+LSH
  * banding with exact-Jaccard verification, SimHash with pigeonhole
  * candidate generation, and windowed char-n-gram Jaccard.
  *
  * Hashing is md5-based on BOTH the Spark and oracle sides: MinHash needs a
  * uniform hash with a total order, and fixed-width md5 hex strings compare
  * identically everywhere — no engine-specific hash (xxhash64/murmur) that
  * the oracle couldn't reproduce.
  *
  * Scale shape: per-document work (shingling, signatures, fingerprints) is
  * NARROW — higher-order array functions over the row's own text, zero
  * shuffle (document length is bounded upstream, so per-row arrays are too).
  * Only candidate generation shuffles, on (band|chunk) keys, and candidate
  * pairs are verified with a per-pair `array_intersect` instead of an
  * exploded gram join — the quadratic blowup is bounded by bucket sizes
  * (at 100 TB: salt hot buckets, cap bucket width).
  */
object Dedup {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4 // NumHashes / Bands

  /** SimHash width in bits (8 md5 hex digits) and pigeonhole chunking: any
    * pair within Hamming distance MaxDist=3 agrees on >= 1 of the 4 8-bit
    * chunks. 32 bits keeps 5k+ docs from saturating the space the way a
    * 16-bit hash does (where everything collides with everything). */
  val SimhashBits = 32
  val SimhashChunks = 4
  val SimhashMaxDist = 3

  /** Exact dedup: canonical (min) doc per identical text. Deterministic —
    * unlike dropDuplicates, which keeps an arbitrary row. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(md5(col("text")).as("text_md5"), col("canonical_id"), col("n_copies"))

  /** Cross-source duplication matrix: for every source pair, how many
    * distinct TEXTS they share verbatim — the provenance-contamination
    * readout that decides which crawls are re-dumps of each other before
    * mixture weighting. Distinct (text-hash, source) pairs first (one
    * groupBy collapses per-source copies), then a hash-keyed self-join
    * whose per-key group is bounded by |sources| (≤ quadratic in a SMALL
    * constant, never in documents). Exact integer counting end to end. */
  def crossSourceDups(docs: DataFrame): DataFrame = {
    val pairs = docs.select(md5(col("text")).as("h"), col("source")).distinct()
    val shared = pairs.as("a")
      .join(pairs.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    // dense matrix: every source pair reports, zero-filled — "no overlap"
    // is itself the answer the mixture-weighting step needs
    val srcs = docs.select(col("source")).distinct()
    srcs.select(col("source").as("source_a"))
      .join(srcs.select(col("source").as("source_b")),
        col("source_a") < col("source_b"))
      .join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }

  /** Normalization-aware exact dedup (C4-style): lowercase, strip
    * non-alphanumerics, collapse whitespace — THEN group. Catches the
    * near-trivial duplicates raw exact dedup misses (case changes,
    * punctuation re-flows, double spaces) without any similarity machinery;
    * `n_variants` counts how many distinct raw texts each normalized group
    * absorbed. Same one-shuffle groupBy shape as [[exact]]; the normalizer
    * is a narrow per-row regex chain shared verbatim with the oracle. */
  /** The C4-style text normalizer shared by [[exactNorm]],
    * [[bloomDecontam]], and the streaming exact-dedup twin
    * (graft.streaming.Streams.streamingDedupExact): lowercase, strip
    * non-alphanumerics, collapse whitespace. Narrow per-row regex chain,
    * replayed verbatim by the oracle. */
  def normText: Column = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))

  def exactNorm(docs: DataFrame): DataFrame = {
    val norm = normText
    docs.select(col("doc_id"), col("text"), norm.as("norm"))
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"),
        count_distinct(col("text")).as("n_variants"))
      .select(md5(col("norm")).as("norm_md5"), col("canonical_id"),
        col("n_copies"), col("n_variants"))
  }

  /** Distinct word-3-gram shingles of `text`, as a per-row array column —
    * narrow, no explode/shuffle. NOTE: only valid on a frame that has a
    * `_w = split(text, ' ')` column (see [[shingled]]); referencing the
    * words ATTRIBUTE keeps the split out of the transform lambda — inlining
    * `split` there re-splits the text once per shingle (O(words²) per doc,
    * measured 2.4s -> 0.6s on the signature pipeline at sf0.1). */
  private def shingleArray: Column =
    expr("array_distinct(transform(sequence(1, greatest(size(_w) - 2, 1)), " +
      "i -> concat_ws(' ', slice(_w, i, 3))))")

  /** (doc_id, sh: array<string>) — each document's distinct shingle set,
    * split evaluated once per row. */
  def shingled(docs: DataFrame): DataFrame =
    docs.withColumn("_w", split(col("text"), " "))
      .select(col("doc_id"), shingleArray.as("sh"))

  /** Exploded (doc_id, shingle) view — for callers that need the relational
    * shape; the operators below stay on the array form. */
  def shingles(docs: DataFrame): DataFrame =
    shingled(docs).select(col("doc_id"), explode(col("sh")).as("shingle"))

  /** Universal-hash family for MinHash: one md5 per shingle, decoded to an
    * integer v, then k-th hash = (A(k)·v + B(k)) mod P — the classic
    * (a·x+b) mod p construction. 16× fewer digest computations than hashing
    * per seed, and the per-seed work is codegen'd integer arithmetic inside
    * the partial aggregate. P = 2^31 − 1 keeps A·v < 2^62 (no overflow). */
  val HashP = 2147483647L
  def hashA(k: Int): Long = (2654435761L * (k + 1)) % HashP
  def hashB(k: Int): Long = (1013904223L * (k + 1) + 12345L) % HashP

  /** MinHash signature: per seed k, min over the doc's distinct shingles of
    * the k-th universal hash. Shape: explode (the array is already distinct
    * per row — no relational DISTINCT shuffle) → md5 once → 16 min()
    * aggregates with map-side partial combine; the only shuffle carries one
    * 17-column row per document. */
  /** Whole-signature-per-row form (graft.expr.MinHashSig): a narrow
    * projection with NO aggregation shuffle — each doc's 16 minima come out
    * of one pass over its own text. Value-identical to the relational
    * explode → md5 → conv → groupBy(16 × min) pipeline (the expression's
    * scaladoc spells out the equivalences), which remains what the DuckDB
    * oracle replays. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sig = graft.expr.MinHashSig.minhashSig(col("text"),
      (0 until NumHashes).map(hashA), (0 until NumHashes).map(hashB), HashP)
    // null-text docs: the relational pipeline (and the oracle) drops them at
    // the explode, whereas the expression would emit an all-null signature
    // row — filter to preserve the oracle's semantics
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), sig.as("_sig"))
      .select(col("doc_id") +:
        (0 until NumHashes).map(k => col("_sig")(k).as(s"mh_$k")): _*)
  }

  /** LSH banding: candidate pairs share at least one of the 4 bands of 4
    * hashes; candidates are then verified with exact shingle Jaccard
    * (per-pair array_intersect) and kept above `threshold`.
    * Returns (doc_a, doc_b, jaccard). */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // the signature branch is a narrow expression over the raw text; only
    // the verification branch needs the shingle-string arrays, and it reads
    // them twice (za/zb sides) — materialize once
    val sized = shingled(docs).pinned()
      .withColumn("n_sh", size(col("sh")).cast("long"))
    verifyJaccard(candidatePairs(minhashSignatures(docs)), sized, sized)
      .filter(col("jaccard") >= threshold)
  }

  /** Dedup threshold sweep over verified pairs (doc_a, doc_b, jaccard):
    * per threshold t10/10 in {0.5 … 0.9}, the pair count, distinct flagged
    * docs and exact Jaccard range among pairs clearing t. Each pair
    * explodes into the bins it clears (narrow, ≤5 rows per pair); the two
    * grouped aggregates use only count/distinct/min/max — order-free, so
    * the oracle matches bit-exactly with no float-sum caveat. */
  def thresholdSweep(pairs: DataFrame): DataFrame = {
    val sweep = pairs
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(expr("sequence(5L, 9L)")).as("t10"))
      .filter(col("jaccard") >= col("t10").cast("double") / 10)
    val perPair = sweep.groupBy("t10")
      .agg(count(lit(1)).as("n_pairs"), min(col("jaccard")).as("min_jaccard"),
        max(col("jaccard")).as("max_jaccard"))
    val perDoc = sweep.select(col("t10"), col("doc_a").as("doc"))
      .unionAll(sweep.select(col("t10"), col("doc_b").as("doc")))
      .groupBy("t10").agg(countDistinct(col("doc")).as("n_dup_docs"))
    perPair.join(perDoc, "t10")
      .select((col("t10").cast("double") / 10).as("threshold"),
        col("n_pairs"), col("n_dup_docs"), col("min_jaccard"),
        col("max_jaccard"))
  }

  /** Asymmetric containment pairs: for each LSH candidate pair, the exact
    * shingle containment in BOTH directions (|A∩B|/|A|, |A∩B|/|B|) next to
    * the symmetric Jaccard — the contamination-direction signal
    * (a benchmark document pasted inside a long training document has low
    * Jaccard but containment ≈ 1 on the small side). Kept are pairs whose
    * larger-direction containment clears `threshold`.
    *
    * Same scale shape as [[minhashPairs]]: narrow signatures, band-bucket
    * candidate join, one array_intersect per pair. Caveat, documented
    * honestly: candidate RECALL is still MinHash/Jaccard-driven — a pair
    * with high containment but near-zero Jaccard may never band-collide;
    * for guaranteed containment recall over a corpus, the shared-ngram
    * index ([[sharedNgramPairs]]) is the primitive to compose. */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sized = shingled(docs).pinned()
      .withColumn("n_sh", size(col("sh")).cast("long"))
    candidatePairs(minhashSignatures(docs))
      .join(sized.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sized.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("za.sh"), col("zb.sh"))).cast("long").as("n_inter"),
        col("za.n_sh").as("na"), col("zb.n_sh").as("nb"))
      .filter(col("n_inter") >= 1)
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / col("na")).as("containment_a"),
        (col("n_inter").cast("double") / col("nb")).as("containment_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
  }

  /** Exact shingle-Jaccard verification of candidate (doc_a, doc_b) pairs:
    * one `array_intersect` per pair against the per-doc distinct-shingle
    * arrays (`shA` for the a-side, `shB` for the b-side — the same frame for
    * self-dedup, per-corpus frames for cross-corpus pairs). Zero-overlap
    * candidates drop, matching the oracle's intersection join. */
  private def verifyJaccard(cand: DataFrame, shA: DataFrame,
      shB: DataFrame): DataFrame =
    cand
      .join(shA.as("za"), col("doc_a") === col("za.doc_id"))
      .join(shB.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("za.sh"), col("zb.sh"))).cast("long").as("n_inter"),
        col("za.n_sh").as("na"), col("zb.n_sh").as("nb"))
      .filter(col("n_inter") >= 1)
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter"))).as("jaccard"))

  /** Fully NARROW per-row band preparation — (doc_id, sh, n_sh,
    * bands: array<string> of the [[Bands]] band values): the shingle set,
    * its size, and the MinHash-signature band values all come out of one
    * projection over the row's own text, no shuffle, no aggregation, no
    * state. That makes this frame legal inside a STREAMING plan, which is
    * exactly what the incremental decontamination twin
    * (graft.streaming.Streams.streamingDecontamPairs) needs: the stream
    * side bands each arriving document per-row and equi-joins the static
    * trained corpus index. Values are identical to the batch pipeline's
    * ([[shingled]] + [[minhashSignatures]] + [[banded]]) by construction —
    * same expressions, same hash family. */
  def bandPrepared(docs: DataFrame): DataFrame = {
    val sig = graft.expr.MinHashSig.minhashSig(col("text"),
      (0 until NumHashes).map(hashA), (0 until NumHashes).map(hashB), HashP)
    docs.filter(col("text").isNotNull)
      .withColumn("_w", split(col("text"), " "))
      .withColumn("_sig", sig)
      .select(col("doc_id"), shingleArray.as("sh"),
        array((0 until Bands).map { b =>
          concat_ws("|",
            (0 until RowsPerBand).map(r => col("_sig")(b * RowsPerBand + r)): _*)
        }: _*).as("bands"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
  }

  /** (doc_id, band_idx, band_val) — the LSH banding of a signature frame. */
  def banded(sig: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      val hs = (0 until RowsPerBand).map(r => col(s"mh_${b * RowsPerBand + r}"))
      struct(lit(b).as("band_idx"), concat_ws("|", hs: _*).as("band_val"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_val"))
  }

  /** LSH band join: (doc_a, doc_b) sharing >= 1 band of the signature. */
  def candidatePairs(sig: DataFrame): DataFrame =
    bucketSelfPairs(banded(sig), Seq("band_idx", "band_val"))

  /** Cross-corpus near-dup pairs (train ⋈ eval) — the decontamination
    * primitive: an LLM training pipeline must drop training documents that
    * near-duplicate the evaluation/benchmark set, or the benchmark is
    * contaminated. Same banding + exact-Jaccard verify as [[minhashPairs]],
    * but the candidate join spans the two corpora (no doc_a < doc_b
    * self-join constraint) and each side verifies against its own shingle
    * frame. Scale shape: the band equi-join's per-bucket width is bounded
    * by the eval side, which is orders of magnitude smaller than train in
    * practice — Spark broadcasts it when small; an adversarially hot band
    * would take the same salt-replicate treatment as [[bucketSelfPairs]].
    *
    * @return (train_id, eval_id, jaccard) with jaccard >= threshold
    */
  def crossCorpusPairs(train: DataFrame, eval: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val szTrain = shingled(train).pinned()
      .withColumn("n_sh", size(col("sh")).cast("long"))
    val szEval = shingled(eval).pinned()
      .withColumn("n_sh", size(col("sh")).cast("long"))
    val cand = banded(minhashSignatures(train)).as("x")
      .join(banded(minhashSignatures(eval)).as("y"), Seq("band_idx", "band_val"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, szTrain, szEval)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a").as("train_id"), col("doc_b").as("eval_id"),
        col("jaccard"))
  }

  /** The decontaminated training set: `train` minus every document with a
    * near-duplicate (shingle Jaccard >= threshold) in `eval` — one LEFT ANTI
    * join against the contaminated-id set, keeping all train columns. */
  def decontaminate(train: DataFrame, eval: DataFrame,
      threshold: Double = 0.5): DataFrame =
    train.join(
      crossCorpusPairs(train, eval, threshold)
        .select(col("train_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Bloom-filter bits/hashes for [[bloomDecontam]]. `BloomBits` is
    * deliberately TINY (256) so the false-positive accounting is actually
    * exercised at test scale; a production run sizes m ≈ n·k/ln2 bits
    * (e.g. 10^8 eval docs × 4 hashes → ~55 MB of set positions — still one
    * broadcast). Past broadcast size, the same positions pack into a real
    * long[] bitmap; membership stays a narrow per-row check either way. */
  val BloomBits = 256
  val BloomHashes = 4

  /** The j-th bloom position of an md5 hex digest column: 8 hex chars
    * sliced per hash (md5's 32 hex chars yield exactly 4 independent 32-bit
    * values), decoded to an integer, mod m. Identical arithmetic in DuckDB
    * via ('0x'||substring)::BIGINT. */
  private def bloomPositions(h: Column, m: Int): Seq[Column] =
    (0 until BloomHashes).map { j =>
      conv(substring(h, j * 8 + 1, 8), 16, 10).cast("long") % m
    }

  /** Bloom-filter decontamination probe — the membership-test shape an
    * actual 100 TB run uses when the eval/benchmark set is too large to
    * string-join but its BITS fit in one broadcast: every eval document's
    * C4-normalized text is md5'd into [[BloomHashes]] positions of an
    * m-bit filter; a training document is a CANDIDATE when all of its
    * positions are set (no false negatives, by construction), and an exact
    * digest semi-join then resolves candidates into confirmed contamination
    * vs false positives — the measured FP accounting that tells an operator
    * whether m is sized right.
    *
    * Scale shape: the filter is ONE aggregate row (the sorted set-bit
    * positions), broadcast; the train side is a narrow scan + 4 integer
    * array_contains probes — no shuffle touches the training corpus. The
    * verify join's build side (eval digests) broadcasts.
    *
    * @return (doc_id, norm_md5, confirmed) — one row per bloom CANDIDATE;
    *         confirmed=0 rows are the filter's false positives
    */
  def bloomDecontam(train: DataFrame, eval: DataFrame,
      m: Int = BloomBits): DataFrame = {
    val norm = normText
    val evalH = eval.select(md5(norm).as("h"))
    val bloom = evalH
      .select(explode(array(bloomPositions(col("h"), m): _*)).as("p"))
      .agg(sort_array(collect_set(col("p"))).as("bits"))
    val trainH = train.select(col("doc_id"), md5(norm).as("h"))
    val hit = bloomPositions(col("h"), m)
      .map(p => array_contains(col("bits"), p)).reduce(_ && _)
    trainH.crossJoin(broadcast(bloom))
      .filter(hit)
      .join(evalH.distinct().withColumn("confirmed", lit(1)), Seq("h"), "left")
      .select(col("doc_id"), col("h").as("norm_md5"),
        coalesce(col("confirmed"), lit(0)).as("confirmed"))
  }

  /** How many rows a single LSH bucket may hold before the pair-generating
    * self-join routes it through the salt-replicate path, and how many
    * sub-keys a hot bucket is spread over. A bucket of width B yields B²/2
    * pairs on ONE reducer in a plain equi-join — at 100 TB a single viral
    * boilerplate band (millions of near-identical docs) is a guaranteed
    * straggler. The salted path cuts per-task work to ~B²/(2·salts) without
    * losing a pair. */
  val HotBucketCap = 4096
  val HotBucketSalts = 16

  /** Most hot keys the flagging join may BROADCAST. The hot-key list is
    * bounded only by total_rows / hotCap (~2.4e8 keys at 1e12 docs with the
    * default cap), which can exceed driver/broadcast limits at exactly the
    * scale the salting exists for — past this bound the flagging falls back
    * to a plain shuffle join (one extra exchange, no driver-side state). */
  val HotKeyBroadcastMax = 1000000L

  /** Unordered same-bucket pairs (doc_a < doc_b) from a self-join of
    * `rows` (doc_id + `keys` bucket columns), skew-safe: bucket widths are
    * counted first, buckets wider than `hotCap` join via salt-replicate
    * (probe side salted by hash(doc_id), build side replicated across all
    * `salts` sub-keys — every cross-bucket pair still meets on exactly one
    * sub-key, so the result is IDENTICAL to the plain join), narrow buckets
    * join plain. The hot-key list is broadcast and bounded by
    * total_rows / hotCap, so driver state stays O(#hot buckets).
    *
    * `carry` columns of `rows` (per-doc payload like the SimHash value) are
    * emitted from both sides as `<c>_a` / `<c>_b`, saving the caller two
    * re-joins against the signature frame. */
  def bucketSelfPairs(rowsIn: DataFrame, keys: Seq[String],
      hotCap: Int = HotBucketCap, salts: Int = HotBucketSalts,
      carry: Seq[String] = Nil): DataFrame = {
    // the input plan (e.g. MinHashSig over every doc) feeds FIVE consumers
    // below (width count + both sides of both joins) — materialize it once
    // instead of recomputing the signatures per consumer
    val rows = rowsIn.pinned()
    val k = keys.map(col)
    def pairCols(x: String, y: String) =
      col(s"$x.doc_id").as("doc_a") +: col(s"$y.doc_id").as("doc_b") +:
        carry.flatMap(c =>
          Seq(col(s"$x.$c").as(s"${c}_a"), col(s"$y.$c").as(s"${c}_b")))
    def selfJoin(df: DataFrame, joinKeys: Seq[String]): DataFrame =
      df.as("x").join(df.as("y"),
          joinKeys.map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
          col("x.doc_id") < col("y.doc_id"))
        .select(pairCols("x", "y"): _*)
    val hotKeys = rows.groupBy(k: _*).agg(count(lit(1)).as("_bw"))
      .filter(col("_bw") > hotCap).drop("_bw").pinned()
    val nHot = hotKeys.count()
    if (nHot == 0) {
      // common case: no skew — the plain join, no extra stages beyond the
      // width scan (one aggregate over the checkpointed blocks)
      selfJoin(rows, keys).distinct()
    } else {
      // flag hot rows: broadcast while the hot-key list is small; past
      // HotKeyBroadcastMax (extreme corpus-wide skew) fall back to a shuffle
      // join so the list never has to fit on the driver
      val hotFlag = hotKeys.withColumn("_hot", lit(true))
      val flagged =
        if (nHot <= HotKeyBroadcastMax) rows.join(broadcast(hotFlag), keys, "left")
        else rows.join(hotFlag, keys, "left")
      val cold = flagged.filter(col("_hot").isNull).drop("_hot")
      val hot = flagged.filter(col("_hot").isNotNull).drop("_hot")
      // deterministic salt (hash of doc_id, not rand()) keeps reruns identical
      val hotX = hot.withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(salts)))
      val hotY = hot.withColumn("_salt",
        explode(expr(s"sequence(0L, ${salts - 1}L)")))
      val hotPairs = hotX.as("x").join(hotY.as("y"),
          (keys :+ "_salt").map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
          col("x.doc_id") < col("y.doc_id"))
        .select(pairCols("x", "y"): _*)
      selfJoin(cold, keys).union(hotPairs).distinct()
    }
  }

  /** Blocked fuzzy entity resolution over a string attribute (edit-distance
    * record linkage): rows collapse to DISTINCT value TYPES first (the
    * vocabulary table — at any SF its size is bounded by the value
    * vocabulary, not the row count; exactly the move [[graft.text.TextStats]]
    * makes for BPE/vocab), then candidate type pairs come from equality on
    * `blockCols` (the standard ER blocking key) routed through
    * [[bucketSelfPairs]] so a hot block salt-replicates instead of landing
    * B²/2 pairs on one reducer, and only candidates within the block pay
    * the O(len²) Levenshtein DP. Emits one row per NEAR (0 < dist ≤
    * maxDist) type pair with the row-pair multiplicity `n_row_pairs` =
    * n_a·n_b it stands for — the per-row pair blowup (quadratic in type
    * frequency) stays virtual.
    *
    * `blockExprs` map the type value to its blocking key columns; recall is
    * bounded by the blocking choice as in any ER pipeline (a pair differing
    * in its block key is never compared — the documented tradeoff). */
  def fuzzyTypePairs(rows: DataFrame, value: Column,
      blockExprs: Map[String, Column => Column], maxDist: Int): DataFrame = {
    val types = rows.groupBy(value.as("doc_id"))
      .agg(count(lit(1)).as("n"))
    val withBlocks = blockExprs.foldLeft(types) { case (df, (name, f)) =>
      df.withColumn(name, f(col("doc_id")))
    }
    bucketSelfPairs(withBlocks, blockExprs.keys.toSeq, carry = Seq("n"))
      .withColumn("dist", levenshtein(col("doc_a"), col("doc_b")).cast("long"))
      .filter(col("dist") > 0 && col("dist") <= maxDist)
      .select(col("doc_a").as("name_a"), col("doc_b").as("name_b"),
        col("dist"), (col("n_a") * col("n_b")).as("n_row_pairs"))
  }

  /** Exact shared-window dedup (the gram-granular form of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": two
    * documents are duplicates iff they share a sufficiently long verbatim
    * token window — a DIFFERENT duplicate class from Jaccard similarity,
    * which a long quote inside otherwise-distinct documents does not move).
    * Emits (doc_a, doc_b, n_shared) for pairs sharing >= `minShared`
    * distinct exact windows of `w` consecutive tokens.
    *
    * Scale shape: per-doc DISTINCT gram md5s (narrow explode, bounded by
    * doc length), then the corpus-wide candidate join routes through
    * [[bucketSelfPairs]] keyed on the gram hash — a viral boilerplate gram
    * (site footers, license headers) is exactly the hot-bucket case the
    * salt-replicate path exists for. The gram rides along as a carry column
    * so each shared gram contributes one pair row to the final per-pair
    * count (one doc_id-keyed aggregate). */
  def sharedNgramPairs(docs: DataFrame, w: Int = 8, minShared: Int = 1): DataFrame = {
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(toks) - ${w - 1}), " +
          s"i -> md5(array_join(slice(toks, i, $w), ' '))))")).as("g"))
    bucketSelfPairs(grams, Seq("g"), carry = Seq("g"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Per-document inter-corpus duplication density: of the document's
    * DISTINCT w-token windows, the fraction that also occur in at least
    * one OTHER document — the linear-cost prefilter a dedup pipeline runs
    * before any pairwise stage (docs above a density threshold are the
    * near-dup suspects; [[sharedNgramPairs]] is the pairwise follow-up on
    * the survivors). Same md5 gram construction as the pairwise op.
    *
    * Scale shape: NO pair blowup anywhere — one gram-keyed aggregate
    * counting distinct docs per gram (map-side combinable; df is capped to
    * "2" since only df ≥ 2 matters, so a viral boilerplate gram costs the
    * same as any other), one doc-keyed aggregate for the fraction. Both
    * shuffles carry ≤ one row per distinct (doc, gram). */
  def duplicationDensity(docs: DataFrame, w: Int = 8): DataFrame = {
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(toks) - ${w - 1}), " +
          s"i -> md5(array_join(slice(toks, i, $w), ' '))))")).as("g"))
      .pinned() // feeds both the df count and the per-doc join
    val df = grams.groupBy("g")
      .agg((count(lit(1)) >= 2).as("_dup")) // distinct docs per gram: the
    // construction is already (doc, gram)-distinct, so a plain count IS
    // the document frequency; only the ≥2 bit is needed downstream
    grams.join(df, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("_dup").cast("long")).as("n_dup_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        (col("n_dup_grams").cast("double") /
          col("n_grams").cast("double")).as("dup_density"))
  }

  /** Source-scoped boilerplate detection — the template-removal pass of a
    * CCNet/RefinedWeb-style pipeline: an 8-token window is BOILERPLATE for
    * a source when it appears in ≥ `minFrac` of that source's (eligible)
    * docs and in ≥ `minDf` docs (navigation chrome, legal footers, scraper
    * artifacts repeat across a site; organic text does not). Emits each
    * doc's gram count, template-gram count, and boilerplate ratio. The
    * synthetic corpus has near-zero within-source duplication (max df = 2
    * at every SF), so the 5% default is what exercises the flagging path
    * there; DedupSpec plants a real 3-of-5-docs template to pin the
    * semantics.
    *
    * Scale shape: same (doc, gram)-distinct stream as
    * [[duplicationDensity]]; the doc-frequency aggregate is keyed by
    * (source, gram) so partial aggregation collapses repeats map-side, and
    * the per-source doc totals are an O(|sources|) broadcast. Nothing
    * pairwise, nothing corpus-width on the driver. */
  def boilerplate(docs: DataFrame, w: Int = 8, minDf: Int = 2,
      minFrac: Double = 0.05): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), col("source"), explode(expr(
        s"array_distinct(transform(sequence(1, size(toks) - ${w - 1}), " +
          s"i -> md5(array_join(slice(toks, i, $w), ' '))))")).as("g"))
      .pinned() // feeds both the df aggregate and the per-doc join
    val nDocs = docs
      .filter(size(split(col("text"), " ")) >= w)
      .groupBy("source").agg(count(lit(1)).as("_nd"))
    val tpl = grams.groupBy("source", "g").agg(count(lit(1)).as("_df"))
      .join(broadcast(nDocs), Seq("source"))
      .select(col("source"), col("g"),
        (col("_df") >= minDf &&
          col("_df").cast("double") >= lit(minFrac) * col("_nd").cast("double"))
          .as("_tpl"))
    grams.join(tpl, Seq("source", "g"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("_tpl").cast("long")).as("n_tpl_grams"))
      .select(col("doc_id"), col("source"), col("n_grams"), col("n_tpl_grams"),
        (col("n_tpl_grams").cast("double") /
          col("n_grams").cast("double")).as("boilerplate_ratio"))
  }

  /** 32-bit SimHash over the token multiset: bit b of md5's first 8 hex
    * digits votes +1/-1 per token occurrence; the sign of the vote sum sets
    * the output bit. Whole-fingerprint-per-row form (graft.expr.SimHashSig):
    * a narrow projection with NO aggregation shuffle. Value-identical to the
    * relational explode → md5 → digit-decode → groupBy(32 × sum) → sign-pack
    * pipeline (the expression's scaladoc spells out the equivalences), which
    * remains what the DuckDB oracle replays. Null-text docs are filtered to
    * match the relational form, which drops them at the explode. */
  def simhash(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.expr.SimHashSig.simhashSig(col("text")).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, generated by
    * the pigeonhole trick: split 32 bits into 4 chunks of 8 — any pair
    * within distance 3 must agree on >= 1 full chunk, so candidates come
    * from an equi-join on (chunk_idx, chunk_val) instead of all-pairs. 8-bit
    * chunks (256 values) keep the per-bucket width — and thus the quadratic
    * verify cost — two orders of magnitude below the 4-bit version's. */
  def simhashPairs(docs: DataFrame, maxDist: Int = SimhashMaxDist): DataFrame = {
    // pigeonhole completeness: a pair within maxDist shares >= 1 unchanged
    // chunk only when maxDist < number of chunks
    require(maxDist <= SimhashChunks - 1,
      s"pigeonhole candidate generation with $SimhashChunks chunks is only " +
        s"complete for maxDist <= ${SimhashChunks - 1}, got $maxDist")
    val sh = simhash(docs)
    val chunks = sh.select(col("doc_id"), col("simhash"),
        explode(expr(s"transform(sequence(0, ${SimhashChunks - 1}), c -> struct(c AS chunk_idx, " +
          "(simhash div CAST(pow(256, c) AS BIGINT)) % 256 AS chunk_val))")).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk_idx"), col("c.chunk_val"))
    // same skew-safe candidate join as MinHash banding: a viral fingerprint
    // chunk (millions of near-identical docs) salt-replicates instead of
    // landing on one reducer; the fingerprints ride along as carry columns
    bucketSelfPairs(chunks, Seq("chunk_idx", "chunk_val"),
        carry = Seq("simhash"))
      .withColumnRenamed("simhash_a", "sh_a")
      .withColumnRenamed("simhash_b", "sh_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Connected components over an undirected near-dup pair graph
    * (doc_a, doc_b): every document gets the minimum doc_id reachable from
    * it as its cluster id — the canonical representative a dedup pipeline
    * keeps. Iterative min-label propagation: each round, every node takes
    * the min of its own label and its neighbors'; converged when no label
    * changes (reached in <= diameter rounds; near-dup clusters are shallow).
    * Deterministic: the fixpoint is unique regardless of iteration order.
    *
    * Scale shape: the symmetric edge list is hash-partitioned on `dst` ONCE
    * and reused every round; the label table joins it broadcast while the
    * node count stays at or below [[HotKeyBroadcastMax]] (co-partitioned
    * shuffle fallback above — dedup graphs with >1M *connected* nodes are
    * the rare regime), so each round is ONE wide shuffle (the grouped min)
    * — no driver-side graph state (the driver only sees the converged-yet?
    * label sum). For graphs with deep chains at 100 TB, swap the per-hop
    * propagation for the large-star/small-star variant (O(log n) rounds);
    * near-dup graphs are overwhelmingly star-shaped, so plain propagation
    * stays cheap.
    *
    * @return (id, label) — one row per node appearing in `pairs`
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // materialize the pair plan ONCE before the symmetric union:
    // localCheckpoint (not cache) so every round's lineage starts at the
    // materialized blocks instead of re-walking the LSH+verify plan, and so
    // the RETURNED frame owns no cache entry the caller must unpersist —
    // checkpoint blocks are freed by the ContextCleaner when the RDD is
    // GC'd. (A prior version leaked the final labels cache.)
    val p = pairs.pinned()
    // raw symmetric edges pinned once; node set + node/edge counts come
    // from ONE grouped pass + one 1-row action (the r13 shape paid an
    // unconditional repartition+pin of the edges plus a separate distinct
    // + count). The dst-repartition is scale-gated like the Graph loops:
    // skipped on the broadcast-label path, applied once above it so every
    // round's join is co-partitioned.
    val e0 = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .pinned()
    val deg = e0.groupBy(col("src").as("id")).agg(count(lit(1)).as("_d"))
      .pinned()
    val cnts = deg.agg(count(lit(1)), sum(col("_d"))).head()
    val nNodes = cnts.getLong(0)
    val m = if (cnts.isNullAt(1)) 0L else cnts.getLong(1)
    var labels = deg.select(col("id"), col("id").as("label"))
    val edges =
      if (nNodes <= HotKeyBroadcastMax) graft.analytics.Graph.roundSized(e0, m)
      else e0.repartition(col("dst")).pinned()
    // Labels only ever decrease under min-propagation, so the label sum is
    // a strictly decreasing convergence measure: unchanged sum == fixpoint.
    // One tiny aggregate over the fresh checkpoint per round instead of a
    // join-and-count against the previous labeling. decimal(38,0) so id
    // sums cannot overflow at any scale.
    def labelSum(l: DataFrame): java.math.BigDecimal = {
      val d = l.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d // empty graph
    }
    var converged = false
    var iters = 0
    val rounds = new graft.source.Checkpoint.Rounds(pairs.sparkSession)
    // label-table-sized loop shuffles at the edge-count-derived partition
    // count — see [[graft.analytics.Graph.EdgeRowsPerShufflePartition]]
    labels = graft.analytics.Graph.withRoundShuffle(pairs.sparkSession, m) {
      var prevSum = labelSum(labels)
      while (!converged && iters < maxIters) {
        // eager local pin per round (one job, lineage truncated); durable
        // stride pins on a cluster
        val next = rounds.pin(ccRound(edges, labels, nNodes))
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
        iters += 1
      }
      rounds.seal(labels)
    }
    // Per-hop propagation needs diameter-many rounds; a component deeper
    // than the cap (adversarial chain-shaped dup graphs) falls back to
    // large-star/small-star, which converges in O(log² n) rounds
    // regardless of diameter — never return a non-minimum labeling.
    if (!converged) connectedComponentsStar(p) else labels
  }

  /** One min-label propagation round. Exposed pre-checkpoint so PlanSpec
    * can assert the shape: the label table joins the dst-partitioned edge
    * list broadcast at or below [[HotKeyBroadcastMax]] nodes (co-partitioned
    * shuffle fallback above); the grouped min is the round's one wide
    * shuffle. */
  private[graft] def ccRound(edges: DataFrame, labels: DataFrame,
      nNodes: Long): DataFrame = {
    val l = if (nNodes <= HotKeyBroadcastMax) broadcast(labels) else labels
    val viaNeighbor = edges.join(l, edges("dst") === l("id"))
      .select(edges("src").as("id"), col("label"))
    labels.union(viaNeighbor)
      .groupBy("id").agg(min("label").as("label"))
  }

  /** Connected components via alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * each round rewires edges toward per-neighborhood minima —
    *   large-star: every node u sends its strictly-larger neighbors to
    *     m = min(Γ(u) ∪ u);
    *   small-star: every node u (edges oriented child>parent) points itself
    *     and all its parents at m = min of them.
    * The edge set is a fixpoint iff every component is a star rooted at its
    * minimum node, and the alternation reaches it in O(log² n) rounds
    * independent of graph diameter — the deep-chain regime where per-hop
    * min-propagation needs diameter rounds. Same contract as
    * [[connectedComponents]]: (id, label = component-minimum id).
    *
    * Scale shape: each round is two grouped mins + two shuffle joins over
    * the edge list; no driver-side graph state (the driver sees only the
    * two convergence-digest counts per round).
    */
  def connectedComponentsStar(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val p = pairs.pinned()
    val nodes = p.select(col("doc_a").as("id"))
      .union(p.select(col("doc_b").as("id"))).distinct()
    // canonical undirected edges, oriented (u > v), self-loops dropped
    var edges = p.select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().pinned()
    var converged = edges.isEmpty // all-self-loop input: nothing to rewire
    var iters = 0
    while (!converged && iters < maxIters) {
      // large-star: m over the FULL symmetric neighborhood; emit (w, m) for
      // the larger-than-u neighbors w (m <= u < w keeps orientation)
      val nbr = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbr.groupBy("u").agg(min(col("v")).as("_mn"))
        .select(col("u"), least(col("u"), col("_mn")).as("m"))
      val ls = nbr.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: edges already (child u > parent v); point u and every
      // parent at the minimum parent
      val pm = ls.groupBy("u").agg(min(col("v")).as("m"))
      val withM = ls.join(pm, "u")
      val next = withM.select(col("u"), col("m").as("v"))
        .union(withM.select(col("v").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct().pinned()
      // fixpoint test on the exact edge set: both sides are distinct
      // canonical sets, so equal cardinality + empty one-sided difference
      // ⇔ set equality — one anti-join shuffle per round instead of two
      // (counts are cheap scans of the checkpointed sets)
      converged =
        next.count() == edges.count() && next.except(edges).isEmpty
      edges = next
      iters += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIters rounds — " +
        "edge set still changing (expected O(log² n) rounds)")
    // the final labeling left-join assumes the fixpoint is star-shaped
    // (exactly one parent per non-root node); convergence is only detected
    // on the composite large∘small fixpoint, so verify the assumption with
    // one cheap aggregate rather than letting a violation fan out duplicate
    // (id, label) rows silently
    val fanoutRow = edges.groupBy("u").agg(count(lit(1)).as("_n"))
      .agg(max(col("_n"))).head()
    val maxFanout = if (fanoutRow.isNullAt(0)) 0L else fanoutRow.getLong(0)
    if (maxFanout > 1) throw new IllegalStateException(
      s"connectedComponentsStar fixpoint is not star-shaped: a node keeps " +
        s"$maxFanout parents — labeling join would duplicate rows")
    nodes.join(edges.select(col("u").as("id"), col("v").as("_root")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("_root"), col("id")).as("label"))
  }

  /** Exact char-4-gram Jaccard over a bounded sliding candidate window
    * (doc_id, doc_id + d for d <= span) — the n-gram similarity operator
    * isolated from LSH candidate generation. Per-doc gram sets are narrow
    * per-row arrays; each candidate pair is verified with one
    * array_intersect — no exploded gram join, no per-pair re-aggregation. */
  def ngramJaccard(docs: DataFrame, span: Int = 3): DataFrame = {
    // packed-int gram sets: isomorphic to the oracle's string grams (the
    // pack is bijective on this single-byte corpus), so the Jaccard numbers
    // are identical while joins carry int arrays and the intersect compares
    // ints — see graft.expr.CharNGramCodes
    val gramArr = graft.expr.CharNGramCodes.charNGramCodes(col("text"), 4)
    val g = docs.select(col("doc_id"), gramArr.as("g"))
      .withColumn("n_g", size(col("g")).cast("long"))
    val cand = docs.select(col("doc_id").as("doc_a"),
        explode(expr(s"sequence(1, $span)")).as("_d"))
      .select(col("doc_a"), (col("doc_a") + col("_d")).as("doc_b"))
      .join(docs.select(col("doc_id").as("doc_b")), Seq("doc_b"))
    cand
      .join(g.as("a"), col("doc_a") === col("a.doc_id"))
      .join(g.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("a.g"), col("b.g"))).cast("long").as("n_inter"),
        col("a.n_g").as("na"), col("b.n_g").as("nb"))
      // parity with the oracle's intersection join: zero-overlap pairs drop
      .filter(col("n_inter") >= 1)
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
  }
}
