package graft

/** Dev tool (r12 verdict #4): measure the RELIABLE-checkpoint premium under
  * load, not just prove row-identity in spec. Runs the iterative family
  * twice per policy (min-of-2 — cold JIT dominates the first run) with
  * `spark.graft.checkpoint=local` vs `=reliable` (+ a checkpoint dir), and
  * verifies the two policies emit hash-identical rows in the same run.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.CheckpointBench
  *          [sfDir] [queries…]"   (default sf0.1, the iterative family)
  * Output: one line per query — local/reliable best-of seconds and the
  * premium ratio a cluster operator pays for executor-loss safety.
  */
object CheckpointBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.toSeq.tail
      else Seq("graph_pagerank", "graph_ppr", "graph_kcore", "sim_kmeans")
    val spark = GraftSession.local("checkpoint-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString

    def canonHash(rows: Array[org.apache.spark.sql.Row]): Int =
      rows.map(_.toString).sorted.mkString("\n").hashCode

    for (q <- qs) {
      def once(mode: String): (Double, Int) = {
        spark.conf.set(graft.source.Checkpoint.ModeConf, mode)
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, sf).collect()
        ((System.nanoTime() - t0) / 1e9, canonHash(rows))
      }
      // local first (both runs), THEN configure the durable dir for the
      // reliable side — the dir is context-global and cannot be unset
      val l = Seq(once("local"), once("local"))
      spark.sparkContext.setCheckpointDir(ckpt)
      val r = Seq(once("reliable"), once("reliable"))
      val lBest = l.map(_._1).min
      val rBest = r.map(_._1).min
      val hashes = (l ++ r).map(_._2).distinct
      val ok = hashes.size == 1
      println(f"[ckpt-bench] $q local=$lBest%.2fs reliable=$rBest%.2fs " +
        f"premium=${rBest / lBest}%.2fx hash_equal=$ok")
      require(ok, s"$q: policies disagree on rows — hashes $hashes")
    }
    spark.stop()
  }
}
