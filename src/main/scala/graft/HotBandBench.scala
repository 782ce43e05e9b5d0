package graft

import org.apache.spark.sql.functions._

/** Dev bench: the adversarial viral-band fixture (VERDICT r11 #7).
  *
  * Plants a documents corpus with one VIRAL near-duplicate cluster (same
  * boilerplate text with a per-doc numeric tail that leaves every MinHash
  * band identical) inside a larger benign corpus, then times LSH candidate
  * generation through `Dedup.bucketSelfPairs` twice:
  *   - PLAIN: hot-bucket valve disabled (hotCap = MaxValue) — the band
  *     equi-join enumerates the viral bucket's B²/2 pairs in ONE task
  *     (one join key = one reducer): the straggler the valve exists for.
  *   - SALTED: default valve — the same pair set, spread over
  *     HotBucketSalts sub-keys, so every core shares the quadratic work.
  *
  * Both paths must agree on the pair COUNT (the spec-level pair-identity
  * proof, re-checked here at adversarial scale). The pair-list contract is
  * inherently Θ(B²) in cluster width — no partitioning can shrink it, only
  * spread it; at true 100 TB virality the right contract switch is
  * cluster-emission (dedup_clusters) after exact-digest collapse
  * (dedup_exact), both registered queries.
  *
  * Usage: runMain graft.HotBandBench [viralWidth=20000] [benign=80000]
  */
object HotBandBench {
  def main(args: Array[String]): Unit = {
    val viral = if (args.length > 0) args(0).toInt else 20000
    val benign = if (args.length > 1) args(1).toInt else 80000
    val spark = GraftSession.local("hot-band-bench")
    spark.sparkContext.setLogLevel("WARN")

    // near-identical: shared 40-word boilerplate + unique tail. The tail
    // changes ONE shingle out of ~40, so all 4 bands of the 16-hash
    // signature almost surely agree across the cluster -> one viral bucket.
    // The benign corpus must be shingle-DIVERSE (every word doc-unique):
    // a first cut gave each benign doc a shared 3-word prefix, whose
    // shingle dominated the tiny MinHash sets and silently formed 65k-wide
    // BENIGN buckets - the measurement drowned in their distinct shuffle.
    val boiler = (1 to 40).map(i => s"boilerplate$i").mkString(" ")
    val benignWords = (0 until 12).map(j =>
      md5(concat(col("id").cast("string"), lit(s"_$j"))))
    val docs = spark.range(viral + benign).select(
      col("id").as("doc_id"),
      when(col("id") < viral, concat(lit(boiler + " tail"), col("id").cast("string")))
        .otherwise(concat_ws(" ", benignWords: _*)).as("text"))
      .localCheckpoint()

    import graft.text.Dedup
    val banded = Dedup.banded(Dedup.minhashSignatures(docs)).localCheckpoint()
    println(s"[hotband] corpus: $viral viral + $benign benign docs")
    val widths = banded.groupBy("band_idx", "band_val").count()
      .orderBy(desc("count")).limit(3).collect()
    widths.foreach(r => println(s"[hotband] bucket width: ${r.getLong(2)}"))

    def time(label: String, hotCap: Int): Long = {
      val t0 = System.nanoTime()
      val n = Dedup.bucketSelfPairs(banded, Seq("band_idx", "band_val"),
        hotCap = hotCap).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[hotband] $label%8s: $n%d pairs in $sec%.1f s")
      n
    }
    val nSalted = time("salted", graft.text.Dedup.HotBucketCap)
    val nPlain = time("plain", Int.MaxValue)
    require(nPlain == nSalted,
      s"pair sets diverge: plain $nPlain vs salted $nSalted")
    spark.stop()
  }
}
