package graft
import org.apache.spark.sql.functions._
/** Dev drive: bucketed co-located join + SQL ewma with ignoreNulls. */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("bucket-demo")
    val dir = "/root/testdata/sf0.01"
    graft.source.Storage.writeBucketed(
      graft.source.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "demo_li", "l_orderkey", 8)
    graft.source.Storage.writeBucketed(
      graft.source.Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "demo_ord", "o_orderkey", 8)
    val j = spark.table("demo_li").join(spark.table("demo_ord"),
      col("l_orderkey") === col("o_orderkey"))
    val exchanges = j.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    println(s"[demo] bucketed join rows=${j.count()} exchanges=$exchanges")
    spark.sql("SELECT 1").createOrReplaceTempView("dual")
    graft.source.Bars.bars(spark, dir).createOrReplaceTempView("demo_bars")
    val e = spark.sql("""
      SELECT round(ewma(close, 0.2, true, false)
        OVER (PARTITION BY symbol ORDER BY datetime, event_id), 4) AS y
      FROM demo_bars LIMIT 3""").collect().map(_.getDouble(0)).toSeq
    println(s"[demo] sql ewma(ignoreNulls=false) sample=$e")
    spark.stop()
  }
}
