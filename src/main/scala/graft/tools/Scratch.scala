package graft.tools

import org.apache.spark.sql.functions._
import graft.analytics.Graph

/** Dev scratch: per-round L1 deltas of the pagerank-family recursions on
  * the real test graphs, to pick the early-exit tolerance. Deleted before
  * round close. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    import s.implicits._

    def deltas(name: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val e = edges.join(deg, "src").repartition(col("src")).localCheckpoint()
      val nodes = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node")))
        .distinct().localCheckpoint()
      val n = nodes.count()
      val dangling = nodes.join(
          edges.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
        .localCheckpoint()
      val nDangling = dangling.count()
      val teleport = lit(1.0 - 0.85) / lit(n.toDouble)
      val zeros = nodes.select(col("node"), lit(0.0).as("c"))
      var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      val dangOpt = if (nDangling == 0L) None else Some(dangling)
      println(s"[scratch] $name n=$n dangling=$nDangling")
      for (r <- 1 to 12) {
        val next = Graph.prRound(e, zeros, ranks, teleport, 0.85, n, dangOpt)
          .localCheckpoint()
        val d = next.join(ranks.select(col("node"), col("rank").as("_p")), "node")
          .agg(sum(abs(col("rank") - col("_p")))).head().getDouble(0)
        println(f"[scratch] $name round $r%2d L1 delta = $d%.3e")
        ranks = next
      }
    }

    def pprDeltas(): Unit = {
      val edges = Graph.customerPartEdges(s, dir)
      val seeds = graft.source.Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(concat(lit("c"), col("c_custkey").cast("string")).as("node"))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val e = edges.join(deg, "src").repartition(col("src")).localCheckpoint()
      val nodes0 = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
      val seedFlag = seeds.select(col("node")).distinct().withColumn("_seed", lit(true))
      val nSeeds = nodes0.join(seedFlag, Seq("node")).count()
      val nodes = nodes0.join(seedFlag, Seq("node"), "left")
        .select(col("node"),
          when(col("_seed").isNotNull, lit(1.0 / nSeeds)).otherwise(lit(0.0)).as("tp"))
        .repartition(col("node")).localCheckpoint()
      val dangling = nodes.select("node").join(
          edges.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
        .localCheckpoint()
      val zeros = nodes.select(col("node"), lit(0.0).as("c"))
      var ranks = nodes.select(col("node"), col("tp").as("rank"))
      for (r <- 1 to 12) {
        val contribs = e.join(broadcast(ranks), e("src") === ranks("node"))
          .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
          .unionAll(zeros)
          .groupBy("node").agg(sum(col("c")).as("_s"))
        val dm = ranks.join(dangling, "node")
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
        val next = contribs.crossJoin(broadcast(dm)).join(nodes, Seq("node"))
          .select(col("node"),
            (lit(0.15) * col("tp") +
              lit(0.85) * (col("_s") + col("_dm") * col("tp"))).as("rank"))
          .localCheckpoint()
        val d = next.join(ranks.select(col("node"), col("rank").as("_p")), "node")
          .agg(sum(abs(col("rank") - col("_p")))).head().getDouble(0)
        println(f"[scratch] ppr round $r%2d L1 delta = $d%.3e")
        ranks = next
      }
    }

    def hitsDeltas(): Unit = {
      val edges = Graph.customerPartEdges(s, dir)
      val e = edges.repartition(col("src")).localCheckpoint()
      val nodes = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct().localCheckpoint()
      val n = nodes.count()
      val zeros = nodes.select(col("node"), lit(0.0).as("x"))
      def l1(df: org.apache.spark.sql.DataFrame, c: String) = {
        val t = df.agg(sum(col(c)).as("_l1"))
        df.crossJoin(broadcast(t)).select(col("node"), (col(c) / col("_l1")).as(c))
      }
      def half(scores: org.apache.spark.sql.DataFrame, inCol: String,
          joinKey: String, outKey: String, outCol: String) = {
        val raw = e.join(broadcast(scores), e(joinKey) === scores("node"))
          .select(col(outKey).as("node"), col(inCol).as("x"))
          .unionAll(zeros).groupBy("node").agg(sum(col("x")).as(outCol))
        l1(raw, outCol)
      }
      var hub = nodes.select(col("node"), lit(1.0 / n).as("hub"))
      var auth: org.apache.spark.sql.DataFrame = null
      for (r <- 1 to 12) {
        val a2 = half(hub, "hub", "src", "dst", "auth").localCheckpoint()
        val h2 = half(a2, "auth", "dst", "src", "hub").localCheckpoint()
        val dh = h2.join(hub.select(col("node"), col("hub").as("_p")), "node")
          .agg(sum(abs(col("hub") - col("_p")))).head().getDouble(0)
        val da = if (auth == null) Double.NaN
          else a2.join(auth.select(col("node"), col("auth").as("_p")), "node")
            .agg(sum(abs(col("auth") - col("_p")))).head().getDouble(0)
        println(f"[scratch] hits round $r%2d hub delta = $dh%.3e auth delta = $da%.3e")
        hub = h2; auth = a2
      }
    }

    args.drop(1).headOption.getOrElse("all") match {
      case "pr" =>
        deltas("supplierPart(sym)", Graph.supplierPartEdges(s, dir))
        deltas("customerPart(dir)", Graph.customerPartEdges(s, dir))
      case _ => pprDeltas(); hitsDeltas()
    }
  }
}
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local()
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(s, args(0)).explain("formatted")
    }
  }
}
