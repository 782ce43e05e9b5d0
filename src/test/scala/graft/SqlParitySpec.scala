package graft

import org.apache.spark.sql.DataFrame

/** SQL-surface parity over the TPC-H block: the ANSI oracle statements in
  * [[graft.oracle.OracleSql]] are not just a DuckDB-side artifact — they
  * run verbatim on the engine itself (`spark.sql` over registered star
  * views) and agree with the registered DataFrame plans value-for-value.
  * A user can therefore drive every TPC-H shape through either API.
  *
  * Exactness: the block's arithmetic is engineered order-free (exact
  * integer cents / integer-valued quantity sums before any division, the
  * guarded floor-round on outputs), so the two Spark plans must agree
  * BIT-for-bit — the comparison is exact string equality on sorted rows,
  * no tolerance. A disagreement here means one side's expression tree
  * drifted (the same contract CORRECTNESS enforces against DuckDB).
  *
  * Scope: pinned to the TPC-H block, the flagship ANSI surface. A full
  * registry scan (`graft.SqlParityScan`) shows 66/321 oracle statements
  * are engine-portable (the 22 here plus the plain join/agg/drift/dq
  * families); the rest use DuckDB-dialect features BY DESIGN — recursive
  * CTEs replaying window recursions, the list/md5 function family — the
  * oracle's job is to mirror Spark semantics in DuckDB, not to be
  * dialect-neutral. The block below is the set a SQL user would actually
  * port, and it stays exact.
  */
class SqlParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val tpch = Seq(
    "q1_pricing", "q2_min_unit_cost", "q3_shipping", "q4_priority_count",
    "q5_local_supplier", "q6_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q12_return_priority", "q13_customer_distribution",
    "q14_promo_effect", "q15_top_supplier", "q16_part_variety",
    "q17_small_quantity", "q18_large_orders", "q19_discounted_revenue",
    "q20_excess_stock", "q21_sole_return", "q22_wealthy_idle")

  /** Rows rendered engine-neutrally (timestamps in UTC seconds, doubles
    * via toString — both sides are Spark, so equal doubles print equal),
    * sorted for order-insensitive comparison. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(_.toSeq.map {
        case null => "∅"
        case t: java.sql.Timestamp => (t.getTime / 1000L).toString
        case t: java.time.LocalDateTime => t.toString
        case x => x.toString
      }.mkString("|"))
      .toSeq.sorted
  }

  test("every TPC-H oracle statement runs on spark.sql and matches the DataFrame plan exactly") {
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "nation", "region"))
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    val bad = tpch.flatMap { q =>
      val viaDf = canon(SparkEntry.queries(q)(spark, dir))
      // `AS MATERIALIZED` is DuckDB's CTE-inlining hint (q17 uses it to
      // mirror the Spark side's persist) — a no-op semantically, and the
      // only dialect token in the block; Spark's parser doesn't take it
      val sql = SparkEntry.oracleSql(q).replace(" AS MATERIALIZED (", " AS (")
      val viaSql = canon(spark.sql(sql))
      if (viaDf == viaSql) None
      else Some(s"$q: ${viaDf.size} df rows vs ${viaSql.size} sql rows; " +
        s"first diff: ${viaDf.zipAll(viaSql, "<missing>", "<missing>")
          .find { case (a, b) => a != b }.getOrElse(("", ""))}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
