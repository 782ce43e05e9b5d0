package graft
/** Dev scan: which registered queries run on `spark.sql` through the
  * Spark-dialect surface (graft.oracle.SparkSql — the dialect-bridged
  * oracle text or a hand-written override) and match the DataFrame plan
  * value-for-value. Prints one line per query; the OK set feeds the
  * curated list SqlParitySpec pins.
  *
  * Round-11 result (verbatim oracle text, no bridge): 66/321. Round 12
  * adds the mechanical dialect bridge + overrides; run this to regenerate
  * the coverage list after touching either.
  */
object SqlParityScan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("sql-parity-scan")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem","orders","customer","supplier","part","nation","region","events","documents","embeddings"))
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(org.apache.spark.sql.functions.col): _*).collect()
        .map(_.toSeq.map {
          case null => "∅"
          case t: java.sql.Timestamp => (t.getTime / 1000L).toString
          // NTZ (raw parquet view) and session-tz (engine reader) render
          // differently but mean the same UTC instant in this engine —
          // compare on the instant
          case t: java.time.LocalDateTime =>
            t.toEpochSecond(java.time.ZoneOffset.UTC).toString
          case x => x.toString
        }.mkString("|")).toSeq.sorted
    }
    val wanted: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet
    // A DuckDB-shaped statement can plan pathologically on Spark (the
    // oracle never promises an efficient Spark plan) — bound each query
    // with a watchdog so one degenerate plan can't stall the whole scan
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    for ((q, _) <- SparkEntry.oracleSql.toSeq.sortBy(_._1) if wanted(q)) {
      val sql = graft.oracle.SparkSql.statement(q).get
      def attempt(): String = try {
        spark.sparkContext.setJobGroup(q, q, interruptOnCancel = true)
        val viaSql = canon(spark.sql(sql))
        try {
          val viaDf = canon(SparkEntry.queries(q)(spark, dir))
          if (viaDf == viaSql) "OK" else "MISMATCH"
        } catch { case e: Throwable => s"DF_FAIL ${e.getClass.getSimpleName}" }
      } catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException => "PARSE_FAIL"
        case e: Throwable => s"EXEC_FAIL ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(80)}"
      }
      val res =
        try Await.result(Future(attempt()), 90.seconds)
        catch { case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(q); "TIMEOUT"
        }
      println(s"[parity] $q $res")
    }
    spark.stop()
  }
}
