package graft
/** Dev tool: print the Spark-dialect candidate statement for given names. */
object DumpSql {
  def main(args: Array[String]): Unit =
    args.foreach { q =>
      println(s"========== $q")
      println(graft.oracle.SparkSql.candidate(q).getOrElse("<none>"))
    }
}
