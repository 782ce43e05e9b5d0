package graft

import graft.text.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) equivalence tests for the round-5
  * operators: each fast/scalable implementation must be value-identical to
  * the straightforward relational form it replaced, on inputs the curated
  * testdata doesn't exercise (random graphs, random bucket skew, random
  * token streams with empty/duplicate tokens).
  */
class EquivSpec extends SparkSpec {

  private val vocab = Array("the", "quick", "brown", "fox", "jumps", "over",
    "lazy", "dog", "and", "runs", "far", "away", "", "x1", "x2")

  private def randomDocs(seed: Long, n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val base = (1 to n).map { i =>
      val len = 1 + rnd.nextInt(12)
      (i.toLong, (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    // plant exact duplicates so signatures collide like real near-dup data
    val dups = base.take(n / 5).map { case (id, t) => (id + 10000L, t) }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("connectedComponentsStar == min-label propagation on random graphs") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = (1 to 70).map(_ =>
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
      val pairs = edges.toDF("doc_a", "doc_b")
      val prop = Dedup.connectedComponents(pairs, maxIters = n)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val star = Dedup.connectedComponentsStar(pairs)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(star == prop, s"seed $seed: star vs propagation labels differ")
    }
  }

  test("bucketSelfPairs salted path == plain path on randomly skewed buckets") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7L, 8L)) {
      val rnd = new scala.util.Random(seed)
      // few bucket values over many docs → guaranteed hot buckets at cap 5
      val rows = (1 to 120).map(i =>
        (i.toLong, rnd.nextInt(2), s"v${rnd.nextInt(4)}", i * 7L))
        .toDF("doc_id", "band_idx", "band_val", "payload")
      def run(cap: Int, salts: Int) =
        Dedup.bucketSelfPairs(rows, Seq("band_idx", "band_val"), cap, salts,
            carry = Seq("payload"))
          .orderBy("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val plain = run(Int.MaxValue, 4)
      // carry columns are the per-doc payload from each side
      plain.foreach { case (a, b, pa, pb) =>
        assert(pa == a * 7L && pb == b * 7L)
      }
      assert(run(5, 4) == plain, s"seed $seed: salted pair set differs")
      assert(run(5, 1) == plain, s"seed $seed: degenerate single-salt differs")
    }
  }

  test("SimHashSig expression == relational explode/groupBy/sign-pack pipeline") {
    val docs = randomDocs(11L, 150)
    val relToks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val withDigits = (1 to 8).foldLeft(relToks)((df, k) =>
      df.withColumn(s"d_$k",
        (instr(lit("0123456789abcdef"), substring(col("h"), k, 1)) - 1).cast("long")))
    val bitSigns = (0 until 32).map { b =>
      val k = b / 4 + 1
      val j = b % 4
      sum(expr(s"2 * ((d_$k div ${1 << j}) % 2) - 1")).as(s"s_$b")
    }
    val summed = withDigits.groupBy("doc_id").agg(bitSigns.head, bitSigns.tail: _*)
    val value = (0 until 32).map(b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val rel = summed.select(col("doc_id"), value.as("rel_sh"))
    val fast = Dedup.simhash(docs)
    val joined = fast.join(rel, Seq("doc_id")).collect()
    assert(joined.length == 180)
    joined.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}"))
  }

  test("windowMedian interpolation is the two-product quantile_cont form, bit-exactly") {
    // The oracle (DuckDB quantile_cont) interpolates lower·(⌈h⌉−h) +
    // upper·(h−⌊h⌋); the algebraically-equal lerp lower + f·(upper−lower)
    // is 1 ulp apart on ~10% of partial frames — enough to flip the
    // floor-form rounding. Replay the exact two-product arithmetic driver-
    // side and require BIT equality (==, not a tolerance) on every row.
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val w = Window.partitionBy("symbol")
      .orderBy(col("datetime"), col("event_id")).rowsBetween(-20, 0)
    val frames = graft.source.Bars.bars(spark, dir).select(
      col("symbol"), col("event_id"),
      sort_array(collect_list(col("close")).over(w)).as("arr"))
    val out = graft.queries.Analytics.windowMedian(spark, dir)
    def r6Ref(x: Double): Double =
      if (math.abs(x) > 9.0e9) x else math.floor(x * 1e6 + 0.5) / 1e6
    def interpRef(a: Seq[Double], q: Double): Double = {
      val h = (a.length - 1).toDouble * q
      val lo = math.floor(h)
      val hi = math.ceil(h)
      val lower = a(lo.toInt)
      val upper = a(hi.toInt)
      if (lo == hi) lower else lower * (hi - h) + upper * (h - lo)
    }
    val joined = frames.join(out, Seq("symbol", "event_id"))
      .select("arr", "med_close", "p25_close", "p75_close").collect()
    assert(joined.length == 1000)
    joined.foreach { r =>
      val arr = r.getSeq[Double](0)
      for ((q, i) <- Seq(0.5 -> 1, 0.25 -> 2, 0.75 -> 3))
        assert(r.getDouble(i) == r6Ref(interpRef(arr, q)),
          s"q=$q: ${r.getDouble(i)} != ${r6Ref(interpRef(arr, q))} on n=${arr.length}")
    }
  }

  test("GuardedFloorRound: interpreted == codegen == Column form, bit-exactly") {
    // Every oracle query flows through this expression, and it ships two
    // independent eval paths (nullSafeEval + doGenCode); the oracle suite
    // only ever exercises the codegen path. Assert all three implementations
    // — interpreted eval, whole-stage codegen, and the pre-r6 Column form it
    // replaced — agree to the BIT on the values the guard logic branches on:
    // NaN/±Inf (Spark orders NaN above all finites), null, the ±guard
    // boundary ±1 ulp, half-ties, ±0.0, and beyond-guard magnitudes the
    // zero-denominator roc rows actually reach.
    import graft.expr.GuardedFloorRound
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.DoubleType
    val s = spark
    import s.implicits._
    def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)
    val edges: Seq[java.lang.Double] = Seq[Double](
      0.0, -0.0, 1.0, -1.0, 123.456789123, -987.000000499999,
      1.0000005, -1.0000005, 0.9999995, 2.5e-7, -2.5e-7, 1.5e-6,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      9.0e9, -9.0e9, Math.nextUp(9.0e9), Math.nextDown(9.0e9),
      Math.nextUp(-9.0e9), Math.nextDown(-9.0e9),
      9.0e11, -9.0e11, Math.nextUp(9.0e11), Math.nextDown(9.0e11),
      8.999999999e9, 5.0e13, -5.0e13, Double.MinPositiveValue
    ).map(java.lang.Double.valueOf) :+ (null: java.lang.Double)
    val df = edges.toDF("x")
    val variants: Seq[(Column => Column, Double, Double)] = Seq(
      ((c: Column) => GuardedFloorRound.round6(c), 1e6, 9.0e9),
      ((c: Column) => GuardedFloorRound.round4(c), 1e4, 9.0e11))
    for ((fast, scale, guard) <- variants) {
      // the Column form this expression replaced (r5 and earlier)
      val ref = when(abs(col("x")) > lit(guard), col("x"))
        .otherwise(floor(col("x") * lit(scale) + lit(0.5)) / lit(scale))
      val rows = df.select(col("x"), fast(col("x")).as("fast"), ref.as("ref"))
        .collect()
      assert(rows.length == edges.length)
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(0) && r.isNullAt(2) == r.isNullAt(0),
          s"null passthrough broken at ${r.get(0)}")
        if (!r.isNullAt(0)) {
          val x = r.getDouble(0)
          assert(bits(r.getDouble(1)) == bits(r.getDouble(2)),
            s"codegen vs Column form at $x: ${r.getDouble(1)} != ${r.getDouble(2)}")
          val interp = GuardedFloorRound(Literal(x, DoubleType), scale, guard)
            .eval(null).asInstanceOf[Double]
          assert(bits(interp) == bits(r.getDouble(1)),
            s"interpreted vs codegen at $x: $interp != ${r.getDouble(1)}")
        }
      }
      // interpreted null passthrough (UnaryExpression.eval short-circuits)
      assert(GuardedFloorRound(Literal(null, DoubleType), scale, guard)
        .eval(null) == null)
    }
  }

  test("GuardedFloorRound rejects non-finite or non-positive parameters") {
    import graft.expr.GuardedFloorRound
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.DoubleType
    val one = Literal(1.0, DoubleType)
    // codegen interpolates scale/guard as Java literals — Infinity/NaN would
    // emit uncompilable Java, so construction must fail loudly instead
    intercept[IllegalArgumentException](GuardedFloorRound(one, Double.NaN, 9e9))
    intercept[IllegalArgumentException](
      GuardedFloorRound(one, 1e6, Double.PositiveInfinity))
    intercept[IllegalArgumentException](GuardedFloorRound(one, -1e6, 9e9))
    intercept[IllegalArgumentException](GuardedFloorRound(one, 0.0, 9e9))
  }

  test("MinHashSig expression == relational shingle/md5/conv/min pipeline") {
    val docs = randomDocs(13L, 150)
    val k = Dedup.NumHashes
    val rel = Dedup.shingles(docs)
      .withColumn("v",
        expr("CAST(conv(substring(md5(shingle), 1, 8), 16, 10) AS BIGINT)")
          % Dedup.HashP)
      .groupBy("doc_id")
      .agg((0 until k).map(h => min(
        (lit(Dedup.hashA(h)) * col("v") + lit(Dedup.hashB(h))) % Dedup.HashP)
        .as(s"rel_$h")).head,
        (0 until k).map(h => min(
          (lit(Dedup.hashA(h)) * col("v") + lit(Dedup.hashB(h))) % Dedup.HashP)
          .as(s"rel_$h")).tail: _*)
    val fast = Dedup.minhashSignatures(docs)
    val joined = fast.join(rel, Seq("doc_id")).collect()
    assert(joined.length == 180)
    joined.foreach { r =>
      (0 until k).foreach(h => assert(
        r.getLong(1 + h) == r.getLong(1 + k + h),
        s"doc ${r.getLong(0)} hash $h"))
    }
  }

  test("CharCounts expression == split/distinct/replace count form, bit-exactly") {
    val s = spark
    import s.implicits._
    // random ASCII docs + targeted edge cases: single char, all-same,
    // whole-alphabet, and chars around the histogram's fast-path border
    val rnd = new scala.util.Random(41L)
    val alpha = (' ' to '~').mkString
    val cases = Seq("a", "aaaa", alpha, alpha + alpha.reverse, " ~") ++
      (1 to 40).map(_ => (1 to (1 + rnd.nextInt(200)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val docs = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
      graft.expr.CharCounts.charCounts(col("text")).as("fast"),
      expr("transform(array_sort(filter(array_distinct(split(text, '')), c -> c != '')), " +
        "c -> CAST(length(text) - length(replace(text, c, '')) AS DOUBLE))").as("rel"))
    both.collect().foreach { r =>
      assert(r.getSeq[Double](1) == r.getSeq[Double](2),
        s"doc ${r.getLong(0)}: histogram vs replace counts differ")
    }
    // the full charEntropy doubles must be bit-equal to the pre-rewrite form
    val ent = graft.text.TextStats.charEntropy(docs)
    val old = docs
      .select(col("doc_id"), col("text"),
        expr("array_sort(filter(array_distinct(split(text, '')), c -> c != ''))").as("_cs"))
      .select(col("doc_id"),
        (log2(length(col("text"))) -
          expr("aggregate(transform(_cs, " +
            "c -> CAST(length(text) - length(replace(text, c, '')) AS DOUBLE)), " +
            "0D, (acc, x) -> acc + x * log2(x))") /
          length(col("text"))).as("old_entropy"))
    ent.join(old, Seq("doc_id")).collect().foreach { r =>
      val a = r.getAs[Double]("char_entropy")
      val b = r.getAs[Double]("old_entropy")
      assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b),
        s"doc ${r.getLong(0)}: entropy bits differ ($a vs $b)")
    }
  }

  private def randomWalk(seed: Long, n: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    var v = 100.0
    (1 to n).map { _ => v += rnd.nextGaussian() * 3.0; v }
  }

  test("Supertrend expression == straight-loop recursion on random walks") {
    val M = graft.features.Market
    for (seed <- Seq(11L, 12L, 13L)) {
      val close = randomWalk(seed, 120)
      val got = M.withSupertrend(barsOf(close), n = 5, m = 2.0)
        .orderBy("event_id").select("supertrend", "st_trend").collect()
      val high = close.map(_ * 1.01); val low = close.map(_ * 0.99)
      val tr = close.indices.map { i =>
        if (i == 0) high(0) - low(0)
        else math.max(high(i) - low(i), math.max(
          math.abs(high(i) - close(i - 1)), math.abs(low(i) - close(i - 1))))
      }
      var fub = 0.0; var flb = 0.0; var trd = 0.0; var started = false
      close.indices.foreach { i =>
        if (i < 4) assert(got(i).isNullAt(0))
        else {
          val atr = tr.slice(i - 4, i + 1).sum / 5
          val hl2 = (high(i) + low(i)) / 2.0
          val (ub, lb) = (hl2 + 2.0 * atr, hl2 - 2.0 * atr)
          if (!started) { fub = ub; flb = lb; trd = 1.0; started = true }
          else {
            val pc = close(i - 1)
            val nfub = if (ub < fub || pc > fub) ub else fub
            val nflb = if (lb > flb || pc < flb) lb else flb
            trd = if (trd == 1.0) { if (close(i) < nflb) -1.0 else 1.0 }
              else { if (close(i) > nfub) 1.0 else -1.0 }
            fub = nfub; flb = nflb
          }
          val want = if (trd == 1.0) flb else fub
          assert(math.abs(got(i).getDouble(0) - want) < 1e-6 &&
            got(i).getInt(1) == trd.toInt, s"seed $seed row $i")
        }
      }
    }
  }

  test("Psar expression == straight-loop recursion on random walks") {
    val M = graft.features.Market
    val (a0, inc, mx) = (0.02, 0.02, 0.2)
    for (seed <- Seq(21L, 22L, 23L)) {
      val close = randomWalk(seed, 120)
      val got = M.withPsar(barsOf(close)).orderBy("event_id")
        .select("psar", "psar_trend").collect()
      val high = close.map(_ * 1.01); val low = close.map(_ * 0.99)
      var sar = 0.0; var ep = 0.0; var af = 0.0; var tr = 0.0
      close.indices.foreach { i =>
        if (i == 0) { sar = low(0); ep = high(0); af = a0; tr = 1.0 }
        else {
          val sp = sar + af * (ep - sar)
          val flip = (tr == 1.0 && low(i) < sp) || (tr != 1.0 && high(i) > sp)
          val newext = (tr == 1.0 && high(i) > ep) || (tr != 1.0 && low(i) < ep)
          val nsar = if (flip) ep else sp
          val nep = if (flip) { if (tr == 1.0) low(i) else high(i) }
            else if (newext) { if (tr == 1.0) high(i) else low(i) } else ep
          val naf = if (flip) a0 else if (newext) math.min(af + inc, mx) else af
          tr = if (flip) { if (tr == 1.0) -1.0 else 1.0 } else tr
          sar = nsar; ep = nep; af = naf
        }
        assert(math.abs(got(i).getDouble(0) - sar) < 1e-9 &&
          got(i).getInt(1) == tr.toInt, s"seed $seed row $i")
      }
    }
  }

  test("ThresholdReset expression == straight-loop bucket numbering on random ticks") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(31L, 32L)) {
      val rnd = new scala.util.Random(seed)
      val xs = (1 to 200).map(_ => (rnd.nextInt(3) - 1).toDouble) // -1/0/+1
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("event_id", "x")
      val got = df.select(col("event_id"),
          graft.expr.ThresholdReset.over(col("x"), 3.0,
            Seq(lit(1)), Seq(col("event_id"))).as("b"))
        .orderBy("event_id").collect().map(_.getLong(1)).toSeq
      var acc = 0.0; var id = 0L
      val want = xs.map { x =>
        val cur = id
        acc += x
        if (math.abs(acc) >= 3.0) { id += 1; acc = 0.0 }
        cur
      }
      assert(got == want, s"seed $seed")
    }
  }

  test("nearestJoin == brute per-row nearest on random event sets") {
    val s = spark
    import s.implicits._
    def frame(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("event_id", "user_id", "ts_us")
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    for (seed <- Seq(11L, 12L, 13L)) {
      val rnd = new scala.util.Random(seed)
      // coarse second-granular times force plenty of exact ties
      val left = (1 to 80).map(i =>
        (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(300).toLong * 1000000L))
      val right = (101 to 160).map(i =>
        (i.toLong, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(300).toLong * 1000000L))
      val got = graft.analytics.Relational
        .nearestJoin(frame(left), frame(right), "user_id", "ts", "ts",
          "event_id", Seq("event_id"))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          (Option(r.getAs[java.lang.Long]("nearest_dt_us")).map(_.toLong),
            Option(r.getAs[java.lang.Long]("nearest_event_id")).map(_.toLong)))
        .toMap
      left.foreach { case (id, u, t) =>
        val cands = right.filter(_._2 == u)
        val back = cands.filter(_._3 <= t).sortBy(c => (c._3, c._1)).lastOption
        val fwd = cands.filter(_._3 >= t).sortBy(c => (c._3, c._1)).headOption
        val want: (Option[Long], Option[Long]) = (back, fwd) match {
          case (None, None) => (None, None)
          case (Some(b), None) => (Some(-(t - b._3)), Some(b._1))
          case (None, Some(f)) => (Some(f._3 - t), Some(f._1))
          case (Some(b), Some(f)) =>
            if (t - b._3 <= f._3 - t) (Some(-(t - b._3)), Some(b._1))
            else (Some(f._3 - t), Some(f._1))
        }
        assert(got(id) == want, s"seed $seed left=$id: ${got(id)} vs $want")
      }
    }
  }
}
