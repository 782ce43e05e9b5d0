package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.source.Checkpoint.PinOps

/** Similarity search over the embeddings table (`embedding: array<float>`):
  * brute-force cosine top-k as the exact baseline, and an IVF-style
  * bucketed variant as the scale path (probe only your coarse cell instead
  * of the full corpus).
  *
  * The dot product is a sequential left-to-right fold over exact
  * float×float products (`aggregate(zip_with(...))`), which the DuckDB
  * oracle reproduces bit-for-bit with `list_sum(list_transform(...))`.
  * Vector norms are computed ONCE per vector and joined into pair scoring
  * (3× fewer fold evaluations than naive per-pair cosine). No UDFs —
  * higher-order built-ins only.
  *
  * Scale shape: probes/centroids are broadcast; candidates never shuffle
  * until the per-probe top-k window (keyed by probe — at 100 TB, replace the
  * window with a partial top-k aggregate per partition + merge).
  */
object Similarity {

  /** Sequential-fold dot product — the codegen'd custom expression
    * (graft.expr.DotProduct), value-identical to the interpreted
    * `aggregate(zip_with(x, y, (p,q) -> p*q), 0D, +)` HOF form. */
  private def dot(x: String, y: String): Column =
    graft.expr.DotProduct.dot(col(x), col(y))

  /** cosine from a precomputed-norm pair: dot / (normA * normB). */
  private def cosPre(a: String, b: String, na: String, nb: String): Column =
    dot(a, b) / (col(na) * col(nb))

  /** (id, v: array<double>, n: norm) projection of the embeddings table. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      normCol: String): DataFrame =
    df.select(col("vec_id").as(idCol),
        col("embedding").cast("array<double>").as(vecCol))
      .withColumn(normCol, sqrt(dot(vecCol, vecCol)))

  /** Exact brute-force top-k: broadcast the probe set, scan the corpus once,
    * rank per probe. */
  def bruteTopK(embeddings: DataFrame, numProbes: Int = 10, k: Int = 5): DataFrame = {
    val probes = withNorm(embeddings.filter(col("vec_id") < numProbes), "probe_id", "p", "np")
    val cand = withNorm(embeddings, "neighbor_id", "v", "nv")
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(broadcast(probes), col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosPre("p", "v", "np", "nv"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Exact max-inner-product top-k (MIPS — the retrieval mode scoring
    * models actually use: unnormalized relevance, not angular closeness).
    * Same broadcast-probe scan shape as [[bruteTopK]], ranked on the raw
    * sequential-fold dot product (bit-portable, so the rank tie-break is
    * deterministic cross-engine). */
  def mipsTopK(embeddings: DataFrame, numProbes: Int = 10, k: Int = 5): DataFrame = {
    val probes = embeddings.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"),
        col("embedding").cast("array<double>").as("p"))
    val cand = embeddings.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("v"))
    val w = Window.partitionBy("probe_id").orderBy(col("ip").desc, col("neighbor_id"))
    cand.join(broadcast(probes), col("neighbor_id") =!= col("probe_id"))
      .withColumn("ip", dot("p", "v"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("ip"))
  }

  /** The MIPS→cosine reduction (Bachrach et al. 2014): append
    * √(M² − ‖v‖²) to every candidate (M = max candidate norm) and 0 to
    * every probe — all augmented candidates then share norm M, so cosine
    * order on the augmented space IS inner-product order, and any cosine
    * ANN index (IVF, LSH) serves MIPS unchanged. This is the scale path;
    * the spec proves rank equality against [[mipsTopK]]. */
  def mipsAugmentedTopK(embeddings: DataFrame, numProbes: Int = 10,
      k: Int = 5): DataFrame = {
    val vecs = withNorm(embeddings, "vec_id", "v", "nv")
    val mMax = vecs.agg(max(col("nv")).as("m"))
    val cand = vecs.crossJoin(broadcast(mMax))
      .select(col("vec_id").as("neighbor_id"),
        concat(col("v"), array(sqrt(col("m") * col("m") - col("nv") * col("nv"))))
          .as("v"),
        col("m").as("nv"))
    val probes = withNorm(embeddings.filter(col("vec_id") < numProbes),
        "probe_id", "p0", "np")
      .select(col("probe_id"), concat(col("p0"), array(lit(0.0))).as("p"),
        col("np"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(broadcast(probes), col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosPre("p", "v", "np", "nv"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Coarse IVF assignment: nearest of the TRAINED k-means centroids
    * ([[kmeansCentroids]] — first-`numCentroids` seed, one Lloyd update,
    * deterministic and oracle-replayable; see [[kmeans]] for the
    * bit-portability contract). Output keeps the per-vector norm for
    * downstream pair scoring. The assignment is the same map-side
    * struct-max as the k-means rounds — the shuffle carries n partial
    * maxima, never the n·k scored rows. */
  def ivfAssign(embeddings: DataFrame, numCentroids: Int = 16): DataFrame = {
    val cents = kmeansCentroids(embeddings, k = numCentroids)
    val vecs = withNorm(embeddings, "vec_id", "v", "nv")
    kmeansAssign(vecs, cents)
      .select(col("vec_id"), col("v"), col("nv"), col("cluster").as("bucket"))
  }

  /** ANN top-k: probes search only their own IVF bucket. */
  def ivfTopK(embeddings: DataFrame, numProbes: Int = 10, k: Int = 3,
      numCentroids: Int = 16): DataFrame = {
    val assigned = ivfAssign(embeddings, numCentroids)
    val probes = assigned.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("p"),
        col("nv").as("np"), col("bucket"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    assigned.select(col("vec_id").as("neighbor_id"), col("v"), col("nv"), col("bucket"))
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", cosPre("p", "v", "np", "nv"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Sign-LSH hyperplane family, shared with the DuckDB oracle: entry i of
    * plane k is +1.0 when the first hex digit of md5("lsh_<k>_<i>") is >= 8,
    * else -1.0 — a deterministic stand-in for Gaussian hyperplanes that both
    * engines can reproduce exactly (and ±1 entries keep the projection an
    * exact sum of float-in-double values, no rounding concerns). */
  def lshPlane(k: Int, dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val h = md.digest(s"lsh_${k}_$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
  }

  /** LSH table layout: `LshTables` independent hash tables of `LshBits`
    * sign-bits each. Candidates = union over tables of same-bucket vectors —
    * the standard multi-table trade (more tables -> higher recall, same
    * per-table bucket width). 6 bits = 64 buckets keeps buckets populated at
    * test scale; at corpus scale, raise bits to hold bucket width constant. */
  val LshTables = 4
  val LshBits = 6

  /** Per-vector LSH bucket ids: one row per (vec_id, table, bucket), plus
    * the vector and its norm for downstream scoring. Narrow: 24 codegen'd
    * dot products against literal ±1 planes, no shuffle. */
  def lshAssign(embeddings: DataFrame, tables: Int = LshTables,
      bits: Int = LshBits): DataFrame = {
    val vecs = withNorm(embeddings, "vec_id", "v", "nv")
    val bucketCols = (0 until tables).map { t =>
      val b = (0 until bits).map { j =>
        val plane = typedlit(lshPlane(t * bits + j, 64))
        when(graft.expr.DotProduct.dot(col("v"), plane) > 0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), b.as("bucket"))
    }
    vecs.select(col("vec_id"), col("v"), col("nv"),
        explode(array(bucketCols: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("nv"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** ANN top-k via multi-table sign-LSH: candidates share a bucket in ANY
    * table (distinct-ed before scoring so a pair colliding in two tables is
    * verified once), then exact cosine + per-probe rank. */
  def lshTopK(embeddings: DataFrame, numProbes: Int = 10, k: Int = 3): DataFrame = {
    val assigned = lshAssign(embeddings)
    val probes = assigned.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("tbl"), col("bucket"))
    val candIds = assigned.select(col("vec_id").as("neighbor_id"), col("tbl"), col("bucket"))
      .join(broadcast(probes), Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select("probe_id", "neighbor_id").distinct()
    val vecs = withNorm(embeddings, "vec_id", "v", "nv")
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    candIds
      .join(vecs.select(col("vec_id"), col("v"), col("nv")),
        col("neighbor_id") === col("vec_id")).drop("vec_id")
      .join(broadcast(vecs.select(col("vec_id"), col("v").as("p"), col("nv").as("np"))
          .filter(col("vec_id") < numProbes)),
        col("probe_id") === col("vec_id")).drop("vec_id")
      .withColumn("cos", cosPre("p", "v", "np", "nv"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Per-label centroids + their pairwise cosine matrix — the "how separable
    * are my classes" diagnostic. Element-wise mean via posexplode + grouped
    * scalar sums (shuffle-partitioned; no driver-side vectors), then the
    * same sequential-fold cosine as everywhere else. */
  /** Output width of [[randomProject]]; key offset keeps the projection
    * planes disjoint from the 24 LSH-table planes (same md5 derivation). */
  val RprojDims = 8
  private val RprojKeyBase = 100

  /** Johnson–Lindenstrauss-style random projection: reduce every embedding
    * to `dims` components via md5-derived ±1 hyperplanes, scaled by 1/√dims
    * (the sign-matrix JL construction — Achlioptas 2001). The cheap
    * dimensionality-reduction step before clustering or coarse ANN when 64
    * dims is still too wide to shuffle at corpus scale.
    *
    * Narrow per-row: `dims` codegen'd sequential-fold dot products against
    * literal planes, no shuffle anywhere; the oracle replays the identical
    * planes from the shared md5 derivation. */
  def randomProject(embeddings: DataFrame, dims: Int = RprojDims): DataFrame = {
    val vecs = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val scale = math.sqrt(dims.toDouble)
    val cols = (0 until dims).map { d =>
      val plane = typedlit(lshPlane(RprojKeyBase + d, 64))
      (graft.expr.DotProduct.dot(col("v"), plane) / scale).as(s"rp_$d")
    }
    vecs.select(col("vec_id") +: cols: _*)
  }

  val KmeansK = 8
  val KmeansIters = 2

  /** Deterministic Lloyd's k-means over the embedding corpus (cosine
    * assignment, arithmetic-mean update): seeded from the first `k`
    * vec_ids (the IVF convention), `iters` assignment rounds with a
    * centroid update between rounds. The embedding-clustering step a
    * curation pipeline runs for topic balancing / cluster-aware sampling —
    * the iterative complement to the one-shot [[ivfTopK]] assignment.
    *
    * Bit-portability of the DISCRETE output: an engine-ulp difference in a
    * computed mean could flip an argmax near a tie, so centroid means fold
    * sequentially over vec_id-sorted members (the charEntropy contract) —
    * the oracle replays `list_sum(list(x ORDER BY vec_id))` and every
    * downstream cosine compares identical doubles. At corpus scale, swap
    * the fold for a plain SUM (ulp-level assignment ties are noise there);
    * the fold is the oracle-checkable form. Empty clusters drop out of the
    * update identically on both sides. Per-iteration localCheckpoint cuts
    * the growing lineage like connected components does.
    *
    * The per-round argmax is a struct-max aggregate, NOT a row_number
    * window: the window form shuffles all n·k scored rows (each dragging
    * two d-dim arrays) to rank them, while max(struct(cos, −cent_id, …))
    * collapses the k candidates per vector map-side — the shuffle carries
    * n partial maxima. Tie-break identical by construction: struct
    * ordering compares cos first, then −cent_id (larger = smaller id), the
    * same winner as ORDER BY cos DESC, cent_id ASC. */
  def kmeans(embeddings: DataFrame, k: Int = KmeansK,
      iters: Int = KmeansIters): DataFrame = {
    require(k > 0 && iters > 0, s"kmeans: need k > 0, iters > 0 (got $k, $iters)")
    val vecs = withNorm(embeddings, "vec_id", "v", "nv")
    var cents = kmeansSeeds(vecs, k)
    var assigned: DataFrame = null
    for (round <- 1 to iters) {
      assigned = kmeansAssign(vecs, cents)
      if (round < iters) cents = kmeansUpdate(assigned)
    }
    assigned.select(col("vec_id"), col("cluster"), col("ccos").as("cos"))
  }

  /** TRAINED centroids only — the loop of [[kmeans]] stopped after its
    * last centroid update ((iters−1) Lloyd updates from the first-`k`
    * seed), checkpointed for reuse across every downstream assignment.
    * This is what [[ivfAssign]] buckets against: real cluster centers
    * instead of the first-N-vectors stand-in, same determinism contract
    * (the oracle replays the identical training chain). */
  /** Trained-centroid memo: one training per (session, input plan, k,
    * iters) — within a Verify/Bench session the whole sim_* family buckets
    * against the same embedding corpus, and retraining the identical
    * k×64-double table per query (twice inside sim_ann_recall: ivf + pq
    * legs) is pure waste. Keyed by the CANONICALIZED ANALYZED PLAN itself
    * (not its 32-bit semanticHash: two live corpora colliding on the hash
    * would overwrite each other's entry and thrash-retrain on every call,
    * and the collision re-check was racy across threads), so a different
    * corpus or projection trains fresh; values are localCheckpoint'ed
    * (valid for the life of their session) and centroid-table-sized.
    * Canonicalized plans implement value equality/hashCode, which is all
    * TrieMap needs; the map stays small (distinct corpora per session),
    * so holding plan trees as keys costs nothing. */
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[
      (org.apache.spark.sql.SparkSession,
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int),
      DataFrame]

  def kmeansCentroids(embeddings: DataFrame, k: Int = KmeansK,
      iters: Int = KmeansIters): DataFrame = {
    require(k > 0 && iters > 0, s"kmeansCentroids: need k > 0, iters > 0 (got $k, $iters)")
    // entries from stopped sessions are dead weight (their checkpointed
    // blocks died with the session's block manager) — drop them before
    // every lookup so a long-lived JVM cycling sessions cannot accumulate
    // SparkSession object graphs in this process-global map
    centroidCache.keySet.filter(_._1.sparkContext.isStopped)
      .foreach(centroidCache.remove)
    val plan = embeddings.queryExecution.analyzed.canonicalized
    val key = (embeddings.sparkSession, plan, k, iters)
    def train(): DataFrame = {
      val vecs = withNorm(embeddings, "vec_id", "v", "nv")
      var cents = kmeansSeeds(vecs, k)
      for (_ <- 1 until iters)
        cents = kmeansUpdate(kmeansAssign(vecs, cents))
      cents.pinned()
    }
    // the plan IS the key (value-equal canonicalized trees), so a cache
    // hit is a true plan match by construction — no hash-collision
    // re-check, no check-then-put race
    centroidCache.getOrElseUpdate(key, train())
  }

  private def kmeansSeeds(vecs: DataFrame, k: Int): DataFrame =
    vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nv").as("nc"))

  /** One assignment round: broadcast the centroids, struct-max argmax
    * (cos DESC, cent_id ASC — see [[kmeans]]'s scaladoc for why this beats
    * the row_number window at scale). Carries v and nv through the struct
    * (never compared: cent_id is unique) for downstream reuse. */
  private def kmeansAssign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("ccos", cosPre("v", "cv", "nv", "nc"))
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), (-col("cent_id")).as("_nid"),
        col("cent_id"), col("v"), col("nv"))).as("_b"))
      .select(col("vec_id"), col("_b.v").as("v"), col("_b.nv").as("nv"),
        col("_b.cent_id").as("cluster"), col("_b.ccos").as("ccos"))
      .pinned()

  /** One Lloyd centroid update: per-(cluster, dim) sequential-fold mean
    * (the oracle-replayable exact form — see [[kmeans]]); empty clusters
    * drop out. */
  private def kmeansUpdate(assigned: DataFrame): DataFrame = {
    val comps = assigned
      .select(col("cluster"), col("vec_id"),
        posexplode(col("v")).as(Seq("idx", "x")))
      .groupBy("cluster", "idx")
      .agg(count(lit(1)).as("cnt"),
        array_sort(collect_list(struct(col("vec_id"), col("x")))).as("s"))
      .select(col("cluster"), col("idx"),
        (expr("aggregate(s, 0D, (acc, e) -> acc + e.x)") /
          col("cnt")).as("m"))
    comps.groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("idx"), col("m")))).as("s"))
      .select(col("cluster").as("cent_id"),
        expr("transform(s, e -> e.m)").as("cv"))
      .withColumn("nc", sqrt(dot("cv", "cv")))
  }

  def labelCentroidCosines(embeddings: DataFrame): DataFrame = {
    val comps = embeddings.select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("idx", "v")))
      .groupBy("label", "idx").agg(avg(col("v")).as("m"))
    val cents = comps.groupBy("label")
      .agg(array_sort(collect_list(struct(col("idx"), col("m")))).as("s"))
      .select(col("label"), expr("transform(s, x -> x.m)").as("c"))
      .withColumn("nc", sqrt(dot("c", "c")))
    cents.as("x").join(cents.as("y"), col("x.label") < col("y.label"))
      .select(col("x.label").as("label_a"), col("y.label").as("label_b"),
        cosPre("x.c", "y.c", "x.nc", "y.nc").as("cos"))
  }

  /** Symmetric int8 scalar quantization: per vector, scale = 127/max|v_i|,
    * q_i = round(v_i · scale) — the 4× storage/bandwidth compression step an
    * embedding pipeline runs before ANN serving. Narrow per-row arithmetic;
    * emitted exploded (vec_id, idx, q) so the oracle checks every element. */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .withColumn("scale",
        when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(0.0)))
      .select(col("vec_id"), col("scale"), posexplode(col("v")).as(Seq("idx", "x")))
      .select(col("vec_id"), col("idx").cast("long").as("idx"),
        (round(col("x") * col("scale"), 0) + lit(0.0)).cast("long").as("q"),
        graft.queries.Core.r6(col("scale")).as("scale"))

  /** Embedding near-duplicate pairs: same IVF bucket, cosine >= threshold. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.25,
      numCentroids: Int = 16): DataFrame = {
    val assigned = ivfAssign(embeddings, numCentroids)
    assigned.as("x").join(assigned.as("y"),
        col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", cosPre("x.v", "y.v", "x.nv", "y.nv"))
      .filter(col("cos") >= threshold)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"), col("cos"))
  }

  /** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the embedding space coarsely (IVF buckets),
    * find within-bucket cosine near-duplicates, connect them into
    * components, and keep ONE canonical representative (minimum vec_id) per
    * semantic cluster — the embedding-space twin of MinHash dedup, catching
    * paraphrases exact/fuzzy text hashing cannot.
    *
    * Emits one row per vector: its semantic cluster id (itself when it has
    * no near-duplicate) and whether the dedup keeps it. Scale shape: pair
    * generation is bucket-local ([[nearDupPairs]] — never all-pairs),
    * clustering is the shared min-label-propagation engine
    * ([[graft.text.Dedup.connectedComponents]] — one shuffle join + grouped
    * min per round, large-star/small-star fallback past the round cap), and
    * the final labeling is one left join against the corpus. */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.25,
      numCentroids: Int = 16): DataFrame = {
    val pairs = nearDupPairs(embeddings, threshold, numCentroids)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val clusters = graft.text.Dedup.connectedComponents(pairs)
      .select(col("id").as("vec_id"), col("label"))
    embeddings.select(col("vec_id"))
      .join(clusters, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster_id"),
        (col("label").isNull || col("label") === col("vec_id"))
          .cast("int").as("kept"))
  }

  val PqM = 4
  val PqK = 8
  val PqIters = 2
  val PqDims = 64

  /** Squared L2 distance as the sequential fold over exact per-element
    * squared differences — bit-portable to the oracle's
    * `list_sum(list_transform(...))` for the same reason as the dot. */
  private def l2sq(x: String, y: String): Column =
    expr(s"aggregate(zip_with($x, $y, (p, q) -> (p - q) * (p - q)), " +
      "0D, (acc, e) -> acc + e)")

  /** Product quantization (Jégou et al. 2011): split each vector into `m`
    * subspaces, train a tiny per-subspace codebook (deterministic Lloyd —
    * first-k init, L2² assignment with (d, cent_id) tie-break,
    * order-canonicalized mean updates, exactly the [[kmeans]] recipe) and
    * emit each vector's per-subspace code plus its quantization error.
    * m log₂k bits per vector (here 4×3) instead of 64 floats — the memory
    * wall between "embeddings fit nowhere" and "codes fit in RAM" at
    * 100 TB corpus scale; qerr is the ADC diagnostic.
    *
    * Scale shape: ONE Lloyd loop for all subspaces at once — the exploded
    * (vector × subspace) frame joins a broadcast m·k-row codebook on the
    * subspace key, so each row scores only its own k centroids; mean
    * updates are a (subspace, code, dim)-keyed partial+final aggregate.
    * Per-iteration localCheckpoint cuts the growing lineage, like CC. */
  def pqEncode(embeddings: DataFrame, m: Int = PqM, k: Int = PqK,
      iters: Int = PqIters, dims: Int = PqDims): DataFrame =
    pqTrain(embeddings, m, k, iters, dims)._1
      .select(col("vec_id"), col("subspace"), col("code"), col("d").as("qerr"))

  /** The exploded (vector × subspace) frame: one row per (vec_id, subspace)
    * with the raw `dims/m`-wide subvector slice — the shared input of PQ
    * training and ADC probe-table construction. Narrow per-row. */
  private def subspaceSlices(embeddings: DataFrame, m: Int, dims: Int): DataFrame = {
    require(m > 0 && dims % m == 0, s"pq: $m subspaces must divide $dims dims")
    val sw = dims / m
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("subspace"), col("v"))
      .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
        expr(s"slice(v, subspace * $sw + 1, $sw)").as("sv"))
  }

  /** PQ training core: returns (codes, codebook) where `codes` is the final
    * per-(vec_id, subspace) assignment (with its L2² distance `d`) and
    * `codebook` is the (subspace, cent_id, cv) table that PRODUCED that
    * assignment — exactly the table an asymmetric-distance scan must build
    * its lookup rows against ([[ivfPqTopK]]). */
  private[graft] def pqTrain(embeddings: DataFrame, m: Int = PqM, k: Int = PqK,
      iters: Int = PqIters, dims: Int = PqDims): (DataFrame, DataFrame) = {
    val sub = subspaceSlices(embeddings, m, dims)
    var cents = sub.filter(col("vec_id") < k)
      .select(col("subspace"), col("vec_id").as("cent_id"), col("sv").as("cv"))
    var assigned: DataFrame = null
    for (round <- 1 to iters) {
      val w = Window.partitionBy("vec_id", "subspace")
        .orderBy(col("d"), col("cent_id"))
      assigned = sub.join(broadcast(cents), Seq("subspace"))
        .withColumn("d", l2sq("sv", "cv"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") === 1)
        .select(col("vec_id"), col("subspace"), col("sv"),
          col("cent_id").as("code"), col("d"))
        .pinned()
      if (round < iters) {
        val comps = assigned
          .select(col("subspace"), col("code"), col("vec_id"),
            posexplode(col("sv")).as(Seq("idx", "x")))
          .groupBy("subspace", "code", "idx")
          .agg(count(lit(1)).as("cnt"),
            array_sort(collect_list(struct(col("vec_id"), col("x")))).as("s"))
          .select(col("subspace"), col("code"), col("idx"),
            (expr("aggregate(s, 0D, (acc, e) -> acc + e.x)") /
              col("cnt")).as("c"))
        cents = comps.groupBy("subspace", "code")
          .agg(array_sort(collect_list(struct(col("idx"), col("c")))).as("s"))
          .select(col("subspace"), col("code").as("cent_id"),
            expr("transform(s, e -> e.c)").as("cv"))
      }
    }
    (assigned, cents)
  }

  /** IVF-PQ asymmetric-distance ANN search (Jégou et al. 2011's IVFADC):
    * the coarse IVF router restricts each probe to its own bucket, and
    * candidates are scored NOT against their raw vectors but against their
    * PQ codes via an asymmetric distance table — per probe, the exact L2²
    * from each of its m subvectors to each of the k sub-centroids (an m·k
    * lookup table), so a candidate's distance is m table lookups summed
    * instead of a d-dim float scan. This is the shape billion-vector
    * retrieval actually runs: raw vectors never leave storage; the scan
    * touches only codes (m·log₂k bits/vector) plus a broadcast codebook.
    *
    * Scale shape: codebook (m·k rows) and per-probe distance tables
    * (probes·m·k rows) broadcast; candidate generation is IVF-bucket-
    * restricted (never all-pairs); the per-pair sum over m subspaces
    * collapses map-side. The subspace sum folds sequentially over the
    * subspace-sorted lookups (the kmeans parity contract) so the oracle's
    * `list_sum(list(dsub ORDER BY subspace))` compares identical doubles;
    * ranking ties break on (adist, neighbor_id). Recall@k against the
    * brute-force truth is measured by the `pq` leg of sim_ann_recall — the
    * same accept/reject gate the IVF and LSH indexes carry. */
  def ivfPqTopK(embeddings: DataFrame, numProbes: Int = 10, k: Int = 3,
      numCentroids: Int = 16, m: Int = PqM, pqK: Int = PqK,
      iters: Int = PqIters, dims: Int = PqDims): DataFrame = {
    val assigned = ivfAssign(embeddings, numCentroids)
    val (codes, codebook) = pqTrain(embeddings, m, pqK, iters, dims)
    val probes = assigned.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("bucket"))
    // ADC lookup table: probes · m · k rows of exact subvector→centroid L2²
    val dtable = subspaceSlices(embeddings, m, dims)
      .filter(col("vec_id") < numProbes)
      .join(broadcast(codebook), Seq("subspace"))
      .select(col("vec_id").as("probe_id"), col("subspace"),
        col("cent_id").as("code"), l2sq("sv", "cv").as("dsub"))
    val cand = assigned.select(col("vec_id").as("neighbor_id"), col("bucket"))
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select("probe_id", "neighbor_id")
    val w = Window.partitionBy("probe_id").orderBy(col("adist"), col("neighbor_id"))
    cand
      .join(codes.select(col("vec_id").as("neighbor_id"),
        col("subspace"), col("code")), Seq("neighbor_id"))
      .join(broadcast(dtable), Seq("probe_id", "subspace", "code"))
      .groupBy("probe_id", "neighbor_id")
      .agg(array_sort(collect_list(struct(col("subspace"), col("dsub")))).as("s"))
      .select(col("probe_id"), col("neighbor_id"),
        expr("aggregate(s, 0D, (acc, e) -> acc + e.dsub)").as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adist"))
  }

  /** Hard-negative mining for contrastive training: for each probe, the
    * `k` highest-cosine corpus vectors carrying a DIFFERENT label — the
    * near-miss negatives that dominate the gradient signal (easy random
    * negatives are already far away). Same broadcast-probe scan shape as
    * [[bruteTopK]] with the label inequality pushed into the join
    * condition, so rejected same-label candidates never reach the scoring
    * projection. Ranked on the bit-portable sequential-fold cosine with
    * (cos DESC, neighbor_id) ties — deterministic cross-engine. */
  def hardNegatives(embeddings: DataFrame, numProbes: Int = 10,
      k: Int = 5): DataFrame = {
    val lab = embeddings.select(col("vec_id").as("id"), col("label"))
    val probes = withNorm(embeddings.filter(col("vec_id") < numProbes),
        "probe_id", "p", "np")
      .join(lab.select(col("id").as("probe_id"),
        col("label").as("probe_label")), Seq("probe_id"))
    val cand = withNorm(embeddings, "neighbor_id", "v", "nv")
      .join(lab.select(col("id").as("neighbor_id"),
        col("label").as("neighbor_label")), Seq("neighbor_id"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(broadcast(probes),
        col("neighbor_id") =!= col("probe_id") &&
          col("neighbor_label") =!= col("probe_label"))
      .withColumn("cos", cosPre("p", "v", "np", "nv"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("probe_label").cast("long").as("probe_label"),
        col("rank").cast("long").as("rank"), col("neighbor_id"),
        col("neighbor_label").cast("long").as("neighbor_label"), col("cos"))
  }

  /** Per-dimension corpus statistics of the embedding column — the
    * normalization/whitening pass a training pipeline runs before ANN,
    * clustering, or quantization (and the diagnostic that catches dead or
    * exploding dimensions). One narrow posexplode (n·dims rows, no fatter
    * than the corpus) into a dims-group aggregate with map-side partials.
    *
    * Exactness recipe (events_stationarity pattern): each component is
    * quantized to the exact integer floor(x·10⁶ + 0.5) — identical IEEE
    * ops both engines — so mean/std come from exact DECIMAL power sums
    * with only the final formula in doubles; min/max compare raw values
    * (comparison is exact). The 1e-6 quantization is the operator's
    * published contract (components are O(1), so the moment error is
    * ≤ 5e-7 — far inside the 6dp emit). */
  def dimStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x"),
        expr("CAST(floor(x * 1000000.0 + 0.5) AS DECIMAL(19,0))").as("kx"))
      .groupBy("dim")
      .agg(count(lit(1)).cast("double").as("nd"),
        sum(col("kx")).cast("double").as("sx"),
        sum(expr("kx * kx")).cast("double").as("sxx"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))
      .select(col("dim"), col("nd").cast("long").as("n"),
        expr("(sx / nd) / 1000000.0").as("mean"),
        expr("CASE WHEN nd <= 1.0 OR (nd * sxx - sx * sx) <= 0.0 THEN 0.0 " +
          "ELSE sqrt((nd * sxx - sx * sx) / (nd * (nd - 1.0))) / 1000000.0 " +
          "END").as("std"),
        col("mn").as("v_min"), col("mx").as("v_max"))

  /** Per-vector z-score whitening against [[dimStats]]' published (6dp)
    * per-dimension mean/std — zero-std dimensions map to 0. Emits the
    * before/after L2 norms (the whiteness check: a well-conditioned
    * whitened corpus has norm_z ≈ √dims). The stats table is O(dims) rows
    * — collected to one broadcast array row, the same scalar-side-only
    * cross-join shape as the PQ distance table; the corpus scan stays
    * narrow. `statRound` is the house 6dp rounding so both engines whiten
    * against the identical published stats. */
  def whiten(embeddings: DataFrame,
      statRound: Column => Column): DataFrame = {
    val stats = dimStats(embeddings)
      .select(col("dim"), statRound(col("mean")).as("m"),
        statRound(col("std")).as("s"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m"), col("s"))))
        .as("st"))
      .select(expr("transform(st, e -> e.m)").as("means"),
        expr("transform(st, e -> e.s)").as("stds"))
    embeddings
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(stats))
      .select(col("vec_id"), col("label"), col("v"),
        // indexed over the VECTOR's own length (not zip_with against the
        // global stats arrays, which would null-pad a shorter vector and
        // null-poison its norm) — the oracle iterates range(1, len(v))
        // with the same per-element expression
        // (size guard: Spark's sequence(1, 0) runs DESCENDING — an empty
        // vector must yield an empty z, like the oracle's empty range)
        expr("CASE WHEN size(v) = 0 THEN CAST(array() AS array<double>) " +
          "ELSE transform(sequence(1, size(v)), i -> " +
          "CASE WHEN element_at(stds, i) <= 0D THEN 0D " +
          "ELSE (element_at(v, i) - element_at(means, i)) / " +
          "element_at(stds, i) END) END").as("z"))
      .select(col("vec_id"), col("label"),
        sqrt(graft.expr.DotProduct.dot(col("v"), col("v"))).as("norm_raw"),
        sqrt(graft.expr.DotProduct.dot(col("z"), col("z"))).as("norm_z"))
  }
}
