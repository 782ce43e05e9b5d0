package graft
/** Dev probe: warm wall-time of the four iterative graph queries at sf0.1. */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("prof-graph")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val qs = Seq("graph_pagerank", "graph_ppr", "graph_pagerank_directed", "graph_hits")
    for (q <- qs) SparkEntry.queries(q)(spark, dir).count() // warm
    for (q <- qs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"[prof] $q ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
