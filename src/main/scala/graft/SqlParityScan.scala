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
          // microsecond resolution, same canon as SqlParitySpec — a bridge
          // rule that shifts an instant sub-second must show up in the scan
          case t: java.sql.Timestamp =>
            (t.getTime / 1000L * 1000000L + t.getNanos / 1000L).toString
          // NTZ (raw parquet view) and session-tz (engine reader) render
          // differently but mean the same UTC instant in this engine —
          // compare on the instant
          case t: java.time.LocalDateTime =>
            (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              t.getNano / 1000L).toString
          // the engines may type the same exact value DECIMAL vs DOUBLE
          // (e.g. a decimal-accumulated column divided out) — compare on
          // the double value when exact, else fail loud via plain string
          case d: java.math.BigDecimal =>
            val dd = d.doubleValue()
            if (new java.math.BigDecimal(dd).compareTo(d) == 0) dd.toString
            else d.stripTrailingZeros.toPlainString
          case x => x.toString
        }.mkString("|")).toSeq.sorted
    }
    val wanted: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet
    // A DuckDB-shaped statement can plan pathologically on Spark (the
    // oracle never promises an efficient Spark plan) — bound each query
    // with a watchdog so one degenerate plan can't stall the whole scan.
    // The watchdog must INTERRUPT the worker thread, not just abandon it:
    // cancelJobGroup stops cluster jobs, but a recursive-CTE replay keeps
    // burning the DRIVER between jobs, and abandoned workers pile up until
    // the JVM grinds (observed: 6 zombie recursions made ingest_bars_csv
    // "time out").
    for ((q, _) <- SparkEntry.oracleSql.toSeq.sortBy(_._1) if wanted(q)) {
      val sql = graft.oracle.SparkSql.candidate(q).get
      def attempt(): String = try {
        spark.sparkContext.setJobGroup(q, q, interruptOnCancel = true)
        val viaSql = canon(spark.sql(sql))
        try {
          val viaDf = canon(SparkEntry.queries(q)(spark, dir))
          if (viaDf == viaSql) "OK"
          else {
            val diff = viaDf.zipAll(viaSql, "<missing>", "<missing>")
              .find { case (a, b) => a != b }
            s"MISMATCH rows ${viaDf.size}/${viaSql.size} first-diff " +
              diff.map { case (a, b) => s"df=[${a.take(120)}] sql=[${b.take(120)}]" }.getOrElse("")
          }
        } catch { case e: Throwable => s"DF_FAIL ${e.getClass.getSimpleName}" }
      } catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          s"PARSE_FAIL ${Option(e.getMessage).getOrElse("").linesIterator
            .filter(_.nonEmpty).take(3).mkString(" | ").take(220)}"
        case e: Throwable => s"EXEC_FAIL ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(80)}"
      }
      val t0 = System.nanoTime()
      @volatile var out: String = "TIMEOUT"
      val worker = new Thread(() => {
        val r = try attempt() catch { case _: InterruptedException => "TIMEOUT"
          case e: Throwable => s"EXEC_FAIL ${e.getClass.getSimpleName}" }
        out = r
      }, s"parity-$q")
      worker.setDaemon(true)
      worker.start()
      worker.join(sys.env.getOrElse("SPARK_GRAFT_PARITY_TIMEOUT_MS", "90000").toLong)
      if (worker.isAlive) {
        spark.sparkContext.cancelJobGroup(q)
        worker.interrupt()
        worker.join(10000L)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[parity] $q $out%s t=$sec%.1f")
    }
    spark.stop()
  }
}
