package graft

import graft.analytics.Ranking
import graft.features.Frames
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized-property invariants — the identities the engine's scale
  * formulations rely on, checked against the naive formulations they
  * replace over seeded random inputs (deterministic, reproducible runs):
  * the cum−lag rolling identity vs Spark's native sliding frame, bucketed
  * global numbering vs the single-partition window, gapfill
  * density/coverage.
  */
class PropSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0x67726166L) // "graf", fixed seed

  test("property: cum−lag rolling sum == native sliding-frame sum (random series/windows)") {
    for (_ <- 1 to 8) {
      val n = 1 + rnd.nextInt(60)
      val w = 1 + rnd.nextInt(25)
      val xs = Seq.fill(n)((rnd.nextDouble() - 0.5) * 2e6)
      val df = barsOf(xs)
      val cums = Frames.withCums(df, Map("_c" -> col("close")))
      val got = column(cums.select(col("symbol"), col("event_id"),
        when(Frames.cumCountGate("_c", w), Frames.cumRolling("_c", w)).as("r")), "r")
      val frame = Frames.bySymbol.rowsBetween(-(w - 1), 0)
      val naive = column(df.select(col("symbol"), col("event_id"),
        when(count(col("close")).over(frame) === w,
          sum(col("close")).over(frame)).as("r")), "r")
      assert(got.length == naive.length)
      got.zip(naive).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.isDefined == b.isDefined, s"row $i gate mismatch: $a vs $b")
        // identical reals, different association order: fp slack scaled to
        // the partial-sum magnitudes
        a.zip(b).foreach { case (x, y) =>
          assert(math.abs(x - y) <= 1e-6,
            s"n=$n w=$w row $i: cum−lag $x vs native $y")
        }
      }
    }
  }

  test("property: bucketed global row numbering == single-partition window (random keys)") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 6) {
      val n = 1 + rnd.nextInt(200)
      val buckets = 2 + rnd.nextInt(8)
      val keys = Seq.fill(n)(rnd.nextInt(20).toLong) // heavy duplicate keys
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("event_id", "k")
      val (got, total) = Ranking.withGlobalRowNumber(
        df, col("k"), Seq(col("k"), col("event_id")), buckets = buckets)
      assert(total == n.toLong)
      val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("k"), col("event_id"))).cast("long"))
      assert(got.select("event_id", "rn").orderBy("event_id").collect().toSeq ==
        want.select("event_id", "rn").orderBy("event_id").collect().toSeq,
        s"n=$n buckets=$buckets")
    }
  }

  test("property: gapfill output is dense, ordered, and preserves observed closes") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 6) {
      val hours = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(100).toLong)
        .distinct.sorted
      val rows = hours.map(h => h -> (1.0 + rnd.nextInt(999)))
      val hourly = rows.map { case (h, c) => ("A", h, c, 1L) }
        .toDF("symbol", "h", "close", "n_ticks")
        .withColumn("bar_start",
          timestamp_micros(col("h") * 3600L * 1000000L).cast("timestamp_ntz"))
        .drop("h")
      val got = graft.analytics.TimeWindows.gapfill(hourly)
        .orderBy("bar_start").collect()
      val span = rows.last._1 - rows.head._1 + 1
      assert(got.length == span, s"grid not dense: ${got.length} vs $span")
      assert(got.forall(!_.isNullAt(2)), "forward fill left a null close")
      // every observed hour keeps its own close, gaps carry the previous one
      val byHour = rows.toMap
      var lastClose = rows.head._2
      got.zipWithIndex.foreach { case (r, i) =>
        val h = rows.head._1 + i
        byHour.get(h).foreach(c => lastClose = c)
        assert(r.getDouble(2) == lastClose, s"hour $h: wrong fill")
        assert(r.getInt(3) == (if (byHour.contains(h)) 0 else 1), s"hour $h: gap flag")
      }
    }
  }
}
