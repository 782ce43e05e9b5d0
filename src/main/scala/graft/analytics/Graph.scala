package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph centrality over entity co-occurrence — the authority
  * ranking a large-scale curation pipeline runs over its link/citation
  * graph (web corpora rank domains by exactly this before sampling).
  *
  * Scale shape: the edge list is hash-partitioned once and reused every
  * round (persisted — ranks re-shuffle TO it, never the reverse); each
  * iteration is ONE shuffle join + ONE grouped sum, the same per-round
  * cost envelope as [[graft.text.Dedup]]'s connected components; ranks are
  * localCheckpoint'ed per round to truncate the 10-deep lineage. Driver
  * state is two scalars (node count, iteration counter) — never a
  * collected vertex set.
  */
object Graph {

  val PrDamping = 0.85
  val PrIters = 10

  /** Rank tables at or below this node count are broadcast to the edge
    * partitions each round (a hash table of ≤1M (string, double) rows);
    * above it, the round degrades to the co-partitioned shuffle join — the
    * web-scale path, where ranks and edges share one hashpartitioning and
    * the join needs no exchange at all. Same degrade-gracefully pattern as
    * [[graft.text.Dedup]]'s HotKeyBroadcastMax. */
  val RankBroadcastMaxNodes = 1000000L

  /** Edge count at or below which [[triangleCounts]] broadcasts the
    * oriented adjacency table to both attach joins (~8 packed longs per
    * edge → ≤64 MB); above it both joins degrade to co-partitioned
    * shuffles on u / v. */
  val AdjBroadcastMaxEdges = 8000000L

  /** PageRank with uniform teleport over a directed edge list
    * (`src`, `dst` string columns). Every node must appear as a source
    * (true for symmetrized graphs — no dangling-mass term needed).
    *
    *   rank_0(v)     = 1/N
    *   rank_{i+1}(v) = (1−d)/N + d · Σ_{u→v} rank_i(u) / outdeg(u)
    *
    * Each round is ONE wide shuffle: the rank join is broadcast (small
    * graphs) or co-partitioned with the checkpointed edge list (large
    * graphs — both sides hash-partitioned on their join key, no exchange),
    * and the teleport term folds into the contribution aggregate via a
    * narrow union of one zero-contribution row per node, so no second
    * join materializes. The per-node addend multiset is identical to the
    * textbook left-join formulation (the extra term is an exact +0.0), so
    * ranks are bit-stable against it to float-sum-order, which the
    * 6-decimal output rounding absorbs (see the oracle's note).
    */
  def pageRank(edges: DataFrame, iters: Int = PrIters,
      damping: Double = PrDamping): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — partitioned by src once, reused all rounds
    val e = edges.join(deg, "src").repartition(col("src")).localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val teleport = lit(1.0 - damping) / lit(n.toDouble)
    val zeros = nodes.select(col("node"), lit(0.0).as("c"))
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters)
      ranks = prRound(e, zeros, ranks, teleport, damping, n).localCheckpoint()
    ranks
  }

  /** One damped PageRank round. Exposed pre-checkpoint so PlanSpec can
    * assert the physical shape: ONE wide shuffle (the contribution
    * aggregate); the rank join broadcast below [[RankBroadcastMaxNodes]],
    * co-partitioned above it. */
  private[graft] def prRound(e: DataFrame, zeros: DataFrame, ranks: DataFrame,
      teleport: org.apache.spark.sql.Column, damping: Double, n: Long): DataFrame = {
    val r = if (n <= RankBroadcastMaxNodes) broadcast(ranks) else ranks
    e.join(r, e("src") === r("node"))
      .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
      .unionAll(zeros) // teleport floor for nodes with no inbound mass
      .groupBy("node")
      .agg((teleport + lit(damping) * sum(col("c"))).as("rank"))
  }

  /** The supplier↔part co-occurrence graph: one undirected (symmetrized)
    * edge per distinct supplier–part pair observed in lineitem, node ids
    * prefixed `s`/`p`. */
  def supplierPartEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.source.Tables.lineitem(s, dir)
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("a"),
        concat(lit("p"), col("l_partkey").cast("string")).as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Part co-purchase edges: undirected distinct (a < b) part-key pairs
    * co-occurring in at least one order. The per-order self-join group is
    * lines-per-order sized (≤7 in TPC-H), so the pair generation is a
    * bounded keyed expansion, never quadratic in the table. */
  def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = graft.source.Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.select(col("ok"), col("pk").as("a"))
      .join(li.select(col("ok"), col("pk").as("b")), Seq("ok"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Degree-oriented triangle counting (the compact-forward / node-
    * iterator++ algorithm; Schank & Wagner 2005): per-node triangle
    * participation counts over an undirected (a < b) edge list.
    *
    * Every edge is oriented from its lower to its higher endpoint in the
    * TOTAL order (degree, node) — so wedges are only generated at each
    * triangle's minimum-rank vertex, each triangle is found exactly once,
    * and per-node wedge fan-out is bounded by the oriented out-degree
    * (O(√m) on any graph of arboricity O(√m)), not by the raw degree.
    * That orientation is precisely what makes this survive hub nodes at
    * 100 TB where an id-ordered wedge join explodes on every high-degree
    * vertex. Comparing wedge endpoints by raw id against a degree-ordered
    * edge set silently drops about half the triangles (validated in the
    * spec).
    *
    * Each triangle u→v, u→w, v→w is found EXACTLY once, at its (u→v)
    * edge, as w ∈ out(u) ∩ out(v): out(u) ∋ w by the wedge, out(v) ∋ w by
    * the closing edge, and neither of the other two edges sees it (out(w)
    * contains neither peer; out(u)∩out(w) would need w→v). Intersecting
    * ORIENTED out-lists is what makes the adjacency-array form scale-safe:
    * the arrays are bounded by the oriented out-degree — O(√m), never the
    * raw hub degree — so a per-node row holds at most √m longs, and the
    * Θ(Σ min-degree) intersection work runs as codegen'd sorted-array ops
    * instead of materializing the wedge set through an exchange (the
    * wedge-join form shuffles ~41M rows at sf0.1; this shuffles the edge
    * list and the adjacency table only).
    *
    * Scale shape: degree aggregate, two keyed degree-attach joins, ONE
    * adjacency groupBy, two keyed joins to attach out(u)/out(v) (AQE
    * broadcasts the adjacency side on small graphs; co-partitioned
    * shuffle above), then narrow intersect + explode + final count
    * aggregate. No broadcast of anything data-sized, no driver state. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // materialize once: the edge list feeds the degree aggregate AND both
    // degree-attach joins, and the oriented list feeds the adjacency
    // aggregate plus the edge-iterator scan — without the checkpoints the
    // whole upstream (e.g. the co-purchase distinct self-join) re-executes
    // per consumer. O(m) rows of 2 longs, executor-local blocks.
    val e = edges.localCheckpoint()
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint()
    // materialized once (ObjectHashAggregate over collect_list is the
    // plan's most expensive stage — without the checkpoint it runs twice,
    // once per attach join); broadcast when the packed adjacency fits the
    // executor broadcast budget (~8 longs/edge → ≤64 MB), else the joins
    // degrade to co-partitioned shuffles — same pattern as
    // RankBroadcastMaxNodes / Dedup.HotKeyBroadcastMax.
    val adjRaw = o.groupBy("u")
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
      .localCheckpoint()
    val adj =
      if (e.count() <= AdjBroadcastMaxEdges) broadcast(adjRaw) else adjRaw
    val tris = o
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(col("u"), col("v"),
        array_intersect(col("nu"), col("nv")).as("ws"))
      .filter(size(col("ws")) > 0)
    tris
      .select(col("u"), col("v"), explode(col("ws")).as("w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
