package graft

/** Dev tool: print the formatted physical plan of one registered query.
  * Usage: runMain graft.Explain <query> [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-explain")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
