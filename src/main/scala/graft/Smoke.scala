package graft

/** Dev smoke: replicates the driver's t1 check — `SparkEntry.entry` on
  * sf0.001 must return rows, and each registered query must produce rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n schema_cols=${SparkEntry.entry(spark).columns.length}")
    require(n > 0, "entry() returned no rows")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val c = fn(spark, dir).count()
      println(s"[smoke] $name rows=$c")
    }
    // Terminal marker gate.sh greps for — only reached if every query ran.
    println("[smoke] ALL OK")
    spark.stop()
  }
}
