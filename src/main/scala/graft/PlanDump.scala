package graft

/** Dev tool: write the formatted physical plan of the named queries (or a
  * built-in default set of the bench's heaviest) to files under an output
  * directory — one session for all of them, so a 20-query dump does not pay
  * 20 JVM+session startups. Iterative queries print their POST-loop plan
  * (checkpoint scans) — that is what `.explain` can see; the loop-internal
  * round shapes are pinned by PlanSpec instead.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query...]
  *   writes <outDir>/<query>_<suffix>.txt
  */
object PlanDump {
  val DefaultSet: Seq[String] = Seq(
    "graph_pagerank", "graph_ppr", "graph_hits", "graph_pagerank_directed",
    "graph_kcore", "graph_components", "graph_modularity", "graph_triangles",
    "graph_linkpred", "agg_bootstrap", "sim_ann_recall", "sim_ann_pq",
    "sim_ann_ivf", "sim_kmeans", "topk_importance", "class_balance",
    "ml_feature_bins", "feat_importance_corr", "lake_zorder",
    "dedup_canonical", "sim_semantic_dedup", "text_langid_ngram",
    "tokenizer_segment", "corpus_curriculum", "target_encode_oof",
    "tokenizer_bpe", "text_boilerplate", "ml_matrix", "ml_pr_auc")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else DefaultSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
