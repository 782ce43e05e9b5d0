package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: tile the sf0.1 testdata to ~sf1 for the scale-validation
  * sweep (VERDICT r11 #1). Each table is replicated `copies`× with its
  * PRIMARY KEYS offset per copy (disjoint copies — orderkeys, partkeys,
  * user/event ids, vec ids all shift by copy·(max+1)), which grows every
  * downstream working set honestly:
  *  - events ×K: user ids still fold onto the same 32 symbols, so each
  *    per-symbol window series is K× LONGER (the window-family test);
  *    per-event_type groups are K× larger (the aggregate-family test).
  *  - lineitem ×K with orderkey+partkey offsets: the co-purchase graph
  *    gets K× nodes and K× edges (the graph-family test — rounds stay
  *    fixed, per-round shuffles carry K× the volume).
  *  - embeddings ×K with vec_id offsets: the ANN corpus is K× larger
  *    against the same probe set (vec_id < numProbes lives in copy 0).
  *
  * Usage: runMain graft.ScaleTile <srcDir> <outDir> [copies=10]
  * Writes parquet; small dims are copied through unchanged so the outDir
  * is a drop-in SPARK_GRAFT_SF_DIR for a filtered Bench run.
  */
object ScaleTile {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("scale-tile")
    spark.sparkContext.setLogLevel("WARN")

    def tiled(table: String, keyCols: Seq[String]): DataFrame = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val offsets = keyCols.map { c =>
        c -> (df.agg(max(col(c))).head().getLong(0) + 1L)
      }
      val exploded = df.crossJoin(
        spark.range(copies).select(col("id").as("_copy")))
      offsets.foldLeft(exploded) { case (d, (c, span)) =>
        d.withColumn(c, col(c) + col("_copy") * span)
      }.drop("_copy")
    }

    def write(df: DataFrame, table: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[tile] $table: ${spark.read.parquet(s"$out/$table.parquet").count()} rows")
    }

    write(tiled("events", Seq("event_id", "user_id")), "events")
    write(tiled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(tiled("orders", Seq("o_orderkey", "o_custkey")), "orders")
    write(tiled("embeddings", Seq("vec_id")), "embeddings")
    for (t <- Seq("customer", "supplier", "part", "nation", "region", "documents"))
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    spark.stop()
  }
}
