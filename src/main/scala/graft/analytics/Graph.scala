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

  /** PageRank with uniform teleport over a directed edge list
    * (`src`, `dst` string columns). Every node must appear as a source
    * (true for symmetrized graphs — no dangling-mass term needed).
    *
    *   rank_0(v)     = 1/N
    *   rank_{i+1}(v) = (1−d)/N + d · Σ_{u→v} rank_i(u) / outdeg(u)
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
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (teleport + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
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
