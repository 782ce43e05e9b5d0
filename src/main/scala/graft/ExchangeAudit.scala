package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print per-query Exchange counts (shuffle + broadcast) across
  * the whole registry, highest first. Usage: runMain graft.ExchangeAudit */
object ExchangeAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("graft-exchange-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val shuffles = "(?m)^\\s*(?:[+:|-]*\\s*)*Exchange ".r
        .findAllIn(plan).size
      val bcasts = "BroadcastExchange".r.findAllIn(plan).size
      (name, shuffles, bcasts)
    }
    counts.sortBy(-_._2).take(25).foreach { case (n, s, b) =>
      println(f"[xaudit] $n%-32s shuffles=$s%2d broadcasts=$b%2d")
    }
    println(s"[xaudit] max shuffles = ${counts.map(_._2).max}")
    spark.stop()
  }
}
