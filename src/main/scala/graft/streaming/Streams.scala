package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (north star: the reference's batched REST
  * polling re-imagined as real streams — SURVEY.md §1.5/§2.6). The same
  * transforms as the batch path, over `readStream`:
  *
  *  - file-source ingestion of event parquet with the ns-timestamp
  *    normalization the batch source applies;
  *  - watermarked tumbling-window aggregation (late data dropped after 1h);
  *  - stateful gap-sessionization via flatMapGroupsWithState.
  *
  * Streaming output is checked by StreamingSpec against the equivalent batch
  * queries (same totals), not by the DuckDB oracle.
  */
object Streams {

  /** Raw events schema as the parquet file source needs it (ts read as long
    * nanos — the same nanosAsLong normalization as Bars.readEvents). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Spark's file stream source requires a directory; the shared corpus is a
    * single parquet file. Stage a per-sfDir symlink directory under /tmp
    * (idempotent, read-only view of the shared data). */
  private def stagedEventsDir(sfDir: String): String = {
    val target = java.nio.file.Paths.get(sfDir, "events.parquet").toAbsolutePath
    val dir = java.nio.file.Paths.get("/tmp",
      s"graft-stream-${Integer.toHexString(target.toString.hashCode)}")
    java.nio.file.Files.createDirectories(dir)
    val link = dir.resolve("events.parquet")
    // NOFOLLOW: a dangling link (target regenerated elsewhere) must be
    // detected and replaced, not silently treated as absent
    if (java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        !java.nio.file.Files.exists(link)) {
      java.nio.file.Files.delete(link)
    }
    if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      try java.nio.file.Files.createSymbolicLink(link, target)
      catch { case _: java.nio.file.FileAlreadyExistsException => () } // concurrent creator won
    }
    dir.toString
  }

  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(EventsSchema)
      .parquet(stagedEventsDir(sfDir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling counts — the streaming twin of
    * TimeWindows.tumbling. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("value_sum"))

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  case class SessState(lastTs: Long, sessions: Long, events: Long)

  /** Stateful gap-sessionization: per user, count sessions split on >30 min
    * gaps. Demonstrates flatMapGroupsWithState with explicit state; events
    * within a micro-batch are sorted in the group function (streaming
    * iterators are unordered). A production variant would use event-time
    * timeout to emit closed sessions incrementally. */
  def sessionCounts(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events.select(col("user_id"), col("ts"), col("event_id")).as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SessState]) =>
          // full µs precision: getTime() alone truncates to ms, which would
          // disagree with the batch twin's unix_micros gap arithmetic
          def micros(ts: java.sql.Timestamp): Long =
            (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val t = micros(e.ts)
            val newSession = st.lastTs == Long.MinValue || t - st.lastTs > gapUs
            st = SessState(t, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(SessionSummary(uid, st.sessions, st.events))
      }
  }
}
