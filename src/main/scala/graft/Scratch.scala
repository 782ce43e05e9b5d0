package graft

/** Throwaway dev probe: quantify cross-query debris in a long bench session
  * — does a heavy query slow down after 60 other queries ran, and does a
  * driver GC (ContextCleaner release of dead checkpoint blocks) restore it? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def run1(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def mem(label: String): Unit = {
      val sm = spark.sparkContext.getExecutorMemoryStatus.values.head
      val rt = Runtime.getRuntime
      println(f"[scratch] $label: heapUsed=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%d MB, " +
        f"storageFree=${sm._2 / (1 << 20)}%d/${sm._1 / (1 << 20)}%d MB, " +
        f"rddBlocks=${spark.sparkContext.getRDDStorageInfo.length}")
    }
    val probes = Seq("graph_linkpred", "sim_ann_recall", "topk_importance")
    probes.foreach(run1) // warm
    for (q <- probes) println(f"[scratch] fresh   $q = ${(1 to 2).map(_ => run1(q)).min}%.3f")
    mem("after fresh")
    // debris: run 60 assorted queries once each
    val tail = SparkEntry.queries.keys.toSeq.sorted.take(60)
    tail.foreach(run1)
    mem("after 60-query debris")
    for (q <- probes) println(f"[scratch] dirty   $q = ${(1 to 2).map(_ => run1(q)).min}%.3f")
    System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
    mem("after System.gc x2")
    for (q <- probes) println(f"[scratch] post-gc $q = ${(1 to 2).map(_ => run1(q)).min}%.3f")
    spark.stop()
  }
}
