package graft

import graft.features._
import org.apache.spark.sql.functions._

/** Invariant checks for the built-in-window feature operators
  * (SURVEY.md §5.2.3): null gating (Polars min_samples), band ordering,
  * sign agreement, target domain, split conservation. Property-style over
  * deterministic seeded samples (the scalatest/scalacheck bridge artifact is
  * not on the offline classpath).
  */
class FeatureSpec extends SparkSpec {

  private def samples(n: Int, len: Int): Seq[List[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(List.fill(len)(1.0 + rnd.nextDouble() * 499.0))
  }

  private def forAll(gen: Seq[List[Double]])(body: List[Double] => Unit): Unit =
    gen.foreach(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  test("rolling features are null exactly until the window fills") {
    val df = Momentum.withMomentum(barsOf((1 to 60).map(_.toDouble)))
    for (p <- Params.MomentumPeriods) {
      val sma = column(df, s"sma_$p")
      assert(sma.take(p - 1).forall(_.isEmpty), s"sma_$p should be null before row $p")
      assert(sma.drop(p - 1).forall(_.isDefined), s"sma_$p should be non-null from row $p")
      // lag-based features null for exactly the first p rows
      val ret = column(df, s"return_$p")
      assert(ret.take(p).forall(_.isEmpty) && ret.drop(p).forall(_.isDefined))
    }
    val v = Volatility.withVolatility(barsOf((1 to 70).map(_.toDouble)))
    for (w <- Params.VolatilityWindows) {
      val vol = column(v, s"volatility_$w")
      // returns has a leading null → window fills one row later
      assert(vol.take(w).forall(_.isEmpty) && vol.drop(w).forall(_.isDefined))
    }
  }

  test("bollinger band ordering: lower <= middle <= upper, rsi in [0,100]") {
    forAll(samples(5, 70)) { cs =>
      whenever(cs.length >= 21) {
        val t = Technical.withTechnical(barsOf(cs))
        val rows = t.select("bb_lower", "bb_middle", "bb_upper", "rsi")
          .collect()
        rows.foreach { r =>
          if (!r.isNullAt(0)) {
            assert(r.getDouble(0) <= r.getDouble(1) + 1e-9)
            assert(r.getDouble(1) <= r.getDouble(2) + 1e-9)
          }
          if (!r.isNullAt(3)) {
            val rsi = r.getDouble(3)
            assert(rsi >= -1e-9 && rsi <= 100 + 1e-9)
          }
        }
      }
    }
  }

  test("return_p sign agrees with momentum_p sign") {
    forAll(samples(5, 70)) { cs =>
      whenever(cs.length >= 51) {
        val m = Momentum.withMomentum(barsOf(cs))
        for (p <- Params.MomentumPeriods) {
          column(m, s"return_$p").zip(column(m, s"momentum_$p")).foreach {
            case (Some(r), Some(mo)) => assert(math.signum(r) == math.signum(mo) || mo == 0.0)
            case (a, b) => assert(a.isEmpty == b.isEmpty)
          }
        }
      }
    }
  }

  test("classification target is {0,1} and drops exactly the last row per symbol") {
    val df = Targets.withTarget(barsOf((1 to 30).map(_.toDouble)), targetType = "classification")
    assert(df.count() == 29)
    val vals = df.select("target").distinct().collect().map(_.getByte(0)).toSet
    assert(vals.subsetOf(Set(0: Byte, 1: Byte)))
  }

  test("temporal split preserves rows and is 80/20 by time order") {
    val split = graft.queries.Core.temporalSplit(spark, "/root/testdata/sf0.001")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") + counts("test") == 1000)
    assert(counts("train") == 800)
  }

  test("feature pipeline composes to the reference's 49 features + target") {
    val out = Targets.withTarget(Features.computeAllFeatures(barsOf((1 to 80).map(_.toDouble))))
    val featureCols = out.columns.toSet --
      Set("symbol", "event_id", "datetime", "open", "high", "low", "close", "volume", "target")
    assert(featureCols == Features.FeatureCols.toSet)
    assert(Features.FeatureCols.length == 49)
  }

  test("ichimoku: midpoints from rolling extrema, spans lagged 26, nulls until frames fill") {
    // 100 bars so the 52-frame + 26-shift senkou_b goes non-null (i >= 77)
    val close = (1 to 100).map(i => 100.0 + 10 * math.sin(i / 5.0))
    val out = Market.withIchimoku(barsOf(close))
    val highs = close.map(_ * 1.01)
    val lows = close.map(_ * 0.99)
    def mid(n: Int, i: Int): Option[Double] =
      if (i < n - 1) None
      else Some((highs.slice(i - n + 1, i + 1).max +
        lows.slice(i - n + 1, i + 1).min) / 2)
    def cmp(got: Seq[Option[Double]], want: Int => Option[Double], tag: String): Unit =
      got.zipWithIndex.foreach { case (g, i) =>
        val w = want(i)
        assert(g.isDefined == w.isDefined, s"$tag null gate at $i: $g vs $w")
        g.zip(w).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"$tag at $i: $a vs $b") }
      }
    cmp(column(out, "ichimoku_tenkan"), mid(9, _), "tenkan")
    cmp(column(out, "ichimoku_kijun"), mid(26, _), "kijun")
    cmp(column(out, "ichimoku_senkou_a"), i =>
      for (t <- mid(9, i - 26); k <- mid(26, i - 26)) yield (t + k) / 2,
      "senkou_a")
    cmp(column(out, "ichimoku_senkou_b"), i =>
      if (i - 26 < 0) None else mid(52, i - 26), "senkou_b")
  }
}
