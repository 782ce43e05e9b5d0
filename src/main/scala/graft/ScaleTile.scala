package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: tile the sf0.1 testdata to ~sf1/sf10 for the scale-validation
  * sweep (VERDICT r11 #1, FK fix per ADVICE r12). Each table is replicated
  * `copies`× with its keys offset per copy, and — critically — every
  * FOREIGN key is offset by the span of the DIMENSION it references, with
  * the dimension tiled by the same span. Copies are therefore disjoint AND
  * referentially intact: copy k's orders join copy k's customers, so join
  * selectivity at sf-K matches a true sf-K (the r12 tiling left dims
  * untiled, which made copies 1..K-1 dangle and join-family sweeps measure
  * K× scan at 1/K selectivity).
  *  - events ×K: user ids still fold onto the same 32 symbols, so each
  *    per-symbol window series is K× LONGER (the window-family test);
  *    per-event_type groups are K× larger (the aggregate-family test).
  *  - lineitem ×K with orderkey/partkey/suppkey offsets matching the
  *    orders/part/supplier tiling: the co-purchase graph gets K× nodes and
  *    K× edges (graph-family test) and dimension joins stay K-selective.
  *  - embeddings ×K with vec_id offsets: the ANN corpus is K× larger
  *    against the same probe set (vec_id < numProbes lives in copy 0).
  *  - nation/region/documents copied through (nationkeys are not offset,
  *    so customer/supplier FKs into them stay valid in every copy).
  *
  * Usage: runMain graft.ScaleTile <srcDir> <outDir> [copies=10]
  * Writes parquet; the outDir is a drop-in SPARK_GRAFT_SF_DIR for a
  * filtered Bench run.
  */
object ScaleTile {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("scale-tile")
    spark.sparkContext.setLogLevel("WARN")

    def table(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    // one span per KEY DOMAIN, computed on the table that owns the key and
    // shared by every table referencing it — offsets must agree or FKs dangle
    def span(t: String, c: String): Long =
      table(t).agg(max(col(c))).head().getLong(0) + 1L
    val spans = Map(
      "orderkey" -> span("orders", "o_orderkey"),
      "custkey" -> span("customer", "c_custkey"),
      "suppkey" -> span("supplier", "s_suppkey"),
      "partkey" -> span("part", "p_partkey"),
      "event_id" -> span("events", "event_id"),
      "user_id" -> span("events", "user_id"),
      "vec_id" -> span("embeddings", "vec_id"))

    def tiled(t: String, keys: (String, String)*): DataFrame = {
      val exploded = table(t).crossJoin(
        spark.range(copies).select(col("id").as("_copy")))
      keys.foldLeft(exploded) { case (d, (c, domain)) =>
        d.withColumn(c, col(c) + col("_copy") * spans(domain))
      }.drop("_copy")
    }

    def write(df: DataFrame, t: String): Unit = {
      // The tiled frame inherits the SOURCE's partition count (sf0.1 tables
      // are single small files -> 1 split), so a naive write produced ONE
      // 80 MB+ file per table and every downstream scan ran as ONE task —
      // an artifact of the fixture, not of scale (a true sf-K arrives as
      // many files). One output file per copy keeps scan parallelism
      // proportional to the tiled volume, like real data.
      df.repartition(math.max(8, copies))
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[tile] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    write(tiled("events", "event_id" -> "event_id", "user_id" -> "user_id"), "events")
    write(tiled("lineitem", "l_orderkey" -> "orderkey",
      "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"), "lineitem")
    write(tiled("orders", "o_orderkey" -> "orderkey",
      "o_custkey" -> "custkey"), "orders")
    write(tiled("customer", "c_custkey" -> "custkey"), "customer")
    write(tiled("supplier", "s_suppkey" -> "suppkey"), "supplier")
    write(tiled("part", "p_partkey" -> "partkey"), "part")
    write(tiled("embeddings", "vec_id" -> "vec_id"), "embeddings")
    for (t <- Seq("nation", "region", "documents"))
      write(table(t), t)
    spark.stop()
  }
}
