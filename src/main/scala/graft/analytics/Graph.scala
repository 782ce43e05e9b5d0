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
}
