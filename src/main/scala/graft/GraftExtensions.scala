package graft

import graft.expr.{AHashChunk, Burst2, CharCounts, CharNGramCodes, CondProd,
  Cusum, DotProduct, Ewma, Holt, Kama, LinearRec, MinGramMd5, MinHashSig,
  PsarDir, PsarLine, Renko, SimHashSig, SupertrendDir, SupertrendLine,
  ThresholdReset, TrigramCounts, TrigramTopK, ZigZag}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, LambdaFunction, Literal, UnresolvedNamedLambdaVariable}

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * with the session's FunctionRegistry so they are usable from SQL, e.g.
  *
  *   SELECT ewma(close, 0.2, false)
  *          OVER (PARTITION BY symbol ORDER BY datetime) FROM bars
  *
  * Activate via `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (done by [[GraftSession]]).
  *
  * Also registers a DUCKDB-COMPAT function family (`string_split`,
  * `list_sum`, `list_min/max`, `list_transform/filter`, `arg_min/max`,
  * `unnest`, `quantile_cont`, `generate_series`, `array_to_string`,
  * `json_extract_string`) — thin aliases onto Spark's own expressions, so
  * SQL written against the DuckDB dialect (including this repo's oracle
  * corpus) runs on the engine unchanged. None of these names exist in
  * Spark's builtin registry, so the aliases are purely additive.
  * SqlParitySpec enforces value equality between these statements and the
  * registered DataFrame plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    // SQL decimal literals (e.g. `0.2`) arrive as Catalyst Decimal
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"ewma $what must be a literal number, got $other")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"ewma $what must be a literal boolean, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ewma"),
      new ExpressionInfo(classOf[Ewma].getName, "ewma"),
      (args: Seq[Expression]) => args match {
        case Seq(child, alpha, adjust) =>
          Ewma(child, doubleLit(alpha, "alpha"), boolLit(adjust, "adjust"))
        case Seq(child, alpha, adjust, ignoreNulls) =>
          Ewma(child, doubleLit(alpha, "alpha"), boolLit(adjust, "adjust"),
            boolLit(ignoreNulls, "ignoreNulls"))
        case _ => throw new IllegalArgumentException(
          "usage: ewma(col, alpha, adjust[, ignoreNulls])")
      }))
    ext.injectFunction((
      FunctionIdentifier("cusum"),
      new ExpressionInfo(classOf[Cusum].getName, "cusum"),
      (args: Seq[Expression]) => args match {
        case Seq(child, drift) => Cusum(child, doubleLit(drift, "drift"))
        case _ => throw new IllegalArgumentException(
          "usage: cusum(col, drift) OVER (PARTITION BY ... ORDER BY ...)")
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "usage: dot_product(array<double>, array<double>)")
      }))

    // ---- graft window recursions as SQL functions (r13) ----
    // Every custom AggregateWindowFunction the DataFrame API uses is also a
    // SQL window function, so the Spark-dialect statements in
    // graft.oracle.SparkSql can express the recurrence families:
    //   SELECT ewma_span(close, 12, true) OVER (PARTITION BY symbol
    //          ORDER BY datetime, event_id) ...
    // Numeric parameters must be literals (the recursion coefficients are
    // compile-time constants of the generated update tree). ewma_span
    // computes alpha = 2/(span+1) in Scala — the SAME IEEE division the
    // DataFrame-side Ewma.ewmaSpanOver performs — so SQL and DataFrame
    // plans agree bit-for-bit.
    def fnName(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    def dl(e: Expression, what: String): Double = doubleLit(e, what)

    fnName("ewma_span") {
      case Seq(x, span, adjust) =>
        Ewma(x, 2.0 / (dl(span, "span") + 1.0), boolLit(adjust, "adjust"))
      case Seq(x, span, adjust, ignoreNulls) =>
        Ewma(x, 2.0 / (dl(span, "span") + 1.0), boolLit(adjust, "adjust"),
          boolLit(ignoreNulls, "ignoreNulls"))
      case _ => throw new IllegalArgumentException(
        "usage: ewma_span(col, span, adjust[, ignoreNulls])")
    }
    fnName("holt") {
      case Seq(x, a, b) => Holt(x, dl(a, "alpha"), dl(b, "beta"))
      case _ => throw new IllegalArgumentException("usage: holt(col, alpha, beta)")
    }
    fnName("kama_rec") {
      case Seq(x, alpha) => Kama(x, alpha)
      case _ => throw new IllegalArgumentException("usage: kama_rec(col, alphaCol)")
    }
    fnName("linear_rec") {
      case Seq(x, c0, c1, c2, base) =>
        LinearRec(x, dl(c0, "c0"), dl(c1, "c1"), dl(c2, "c2"), dl(base, "base"))
      case _ => throw new IllegalArgumentException(
        "usage: linear_rec(col, c0, c1, c2, base)")
    }
    fnName("threshold_reset") {
      case Seq(x, t) => ThresholdReset(x, dl(t, "threshold"))
      case _ => throw new IllegalArgumentException(
        "usage: threshold_reset(col, threshold)")
    }
    fnName("cond_prod") {
      case Seq(c, f, base) => CondProd(c, f, dl(base, "base"))
      case _ => throw new IllegalArgumentException(
        "usage: cond_prod(condCol, factorCol, base)")
    }
    fnName("burst2") {
      case Seq(gap, lam, ratio, gamma) =>
        Burst2(gap, lam, dl(ratio, "ratio"), dl(gamma, "gamma"))
      case _ => throw new IllegalArgumentException(
        "usage: burst2(gapCol, lamCol, ratio, gamma)")
    }
    fnName("renko") {
      case Seq(x, brick) => Renko(x, dl(brick, "brick"))
      case _ => throw new IllegalArgumentException("usage: renko(col, brick)")
    }
    fnName("psar_line") {
      case Seq(h, l, af0, inc, mx) =>
        PsarLine(h, l, dl(af0, "af0"), dl(inc, "inc"), dl(mx, "afMax"))
      case _ => throw new IllegalArgumentException(
        "usage: psar_line(high, low, af0, inc, afMax)")
    }
    fnName("psar_dir") {
      case Seq(h, l, af0, inc, mx) =>
        PsarDir(h, l, dl(af0, "af0"), dl(inc, "inc"), dl(mx, "afMax"))
      case _ => throw new IllegalArgumentException(
        "usage: psar_dir(high, low, af0, inc, afMax)")
    }
    fnName("supertrend_line") {
      case Seq(ub, lb, c, pc) => SupertrendLine(ub, lb, c, pc)
      case _ => throw new IllegalArgumentException(
        "usage: supertrend_line(ub, lb, close, prevClose)")
    }
    fnName("supertrend_dir") {
      case Seq(ub, lb, c, pc) => SupertrendDir(ub, lb, c, pc)
      case _ => throw new IllegalArgumentException(
        "usage: supertrend_dir(ub, lb, close, prevClose)")
    }
    fnName("zigzag") {
      case Seq(x, theta) => ZigZag(x, dl(theta, "theta"))
      case _ => throw new IllegalArgumentException("usage: zigzag(col, theta)")
    }

    // ---- graft scalar expressions as SQL functions (r13) ----
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
    fnName("char_counts") {
      case Seq(s) => CharCounts(s)
      case _ => throw new IllegalArgumentException("usage: char_counts(str)")
    }
    fnName("char_ngram_codes") {
      case Seq(s, n) => CharNGramCodes(s, intLit(n, "n"))
      case _ => throw new IllegalArgumentException("usage: char_ngram_codes(str, n)")
    }
    fnName("trigram_topk") {
      case Seq(s, k) => TrigramTopK(s, intLit(k, "k"))
      case _ => throw new IllegalArgumentException("usage: trigram_topk(str, k)")
    }
    fnName("trigram_counts") {
      case Seq(s) => TrigramCounts(s)
      case _ => throw new IllegalArgumentException("usage: trigram_counts(str)")
    }
    fnName("min_gram_md5") {
      case Seq(s, n) => MinGramMd5(s, intLit(n, "gramLen"))
      case _ => throw new IllegalArgumentException("usage: min_gram_md5(str, gramLen)")
    }
    // the engine's MinHash signature with its production seed family
    // (graft.text.Dedup.hashA/hashB/HashP) — SQL gets the same 16 minima
    fnName("minhash_sig") {
      case Seq(s) => MinHashSig(s,
        (0 until graft.text.Dedup.NumHashes).map(graft.text.Dedup.hashA),
        (0 until graft.text.Dedup.NumHashes).map(graft.text.Dedup.hashB),
        graft.text.Dedup.HashP)
      case _ => throw new IllegalArgumentException("usage: minhash_sig(str)")
    }
    fnName("simhash_sig") {
      case Seq(s) => SimHashSig(s)
      case _ => throw new IllegalArgumentException("usage: simhash_sig(str)")
    }
    fnName("ahash_chunk") {
      case Seq(b) => AHashChunk(b)
      case _ => throw new IllegalArgumentException("usage: ahash_chunk(binary)")
    }
    // DuckDB xor(a, b) — Spark spells it `a ^ b`; the corpus calls the
    // function form
    fnName("xor") {
      case Seq(a, b) =>
        org.apache.spark.sql.catalyst.expressions.BitwiseXor(a, b)
      case _ => throw new IllegalArgumentException("usage: xor(a, b)")
    }
    // the engine's oracle-parity rounding (graft.queries.Core.r6/r4) as SQL
    // functions — Spark-dialect statements round through the IDENTICAL
    // codegen'd expression the DataFrame plans use
    def dcast(x: Expression) = org.apache.spark.sql.catalyst.expressions.Cast(
      x, org.apache.spark.sql.types.DoubleType)
    fnName("r6") {
      case Seq(x) => graft.expr.GuardedFloorRound(dcast(x), 1e6, 9.0e9)
      case _ => throw new IllegalArgumentException("usage: r6(x)")
    }
    fnName("r4") {
      case Seq(x) => graft.expr.GuardedFloorRound(dcast(x), 1e4, 9.0e11)
      case _ => throw new IllegalArgumentException("usage: r4(x)")
    }

    // ---- DuckDB-compat aliases (additive; none shadow a Spark builtin) ----
    import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate,
      ArrayFilter, ArrayJoin, ArrayMax, ArrayMin, ArrayTransform, Add,
      Explode, GetJsonObject, Sequence, StringSplit, Subtract}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy, Percentile}

    def alias(name: String)(builder: PartialFunction[Seq[Expression], Expression]): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (args: Seq[Expression]) => builder.applyOrElse(args,
          (a: Seq[Expression]) => throw new IllegalArgumentException(
            s"$name: unsupported argument list (${a.size} args)"))))

    // DuckDB string_split takes a LITERAL separator; Spark's split takes a
    // regex — quote literal separators so metacharacters split literally
    alias("string_split") { case Seq(s, sep) =>
      val quoted = sep match {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
          Literal(java.util.regex.Pattern.quote(v.toString))
        case other => other // non-literal: caller owns regex-escaping
      }
      StringSplit(s, quoted, Literal(-1))
    }
    // list_sum = the LEFT-TO-RIGHT sequential fold with a 0.0 seed — the
    // exact association order of the engine's DataFrame-side
    // `aggregate(l, 0D, (acc, x) -> acc + x)`, so SQL and DataFrame sums
    // agree bit-for-bit on floats (DuckDB's own list_sum skips NULL
    // elements; the corpus never feeds it one, and the spec would catch it)
    alias("list_sum") { case Seq(l) =>
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      ArrayAggregate(l, Literal(0.0),
        LambdaFunction(Add(acc, x), Seq(acc, x)),
        LambdaFunction(fin, Seq(fin)))
    }
    alias("list_min") { case Seq(l) => ArrayMin(l) }
    alias("list_max") { case Seq(l) => ArrayMax(l) }
    // both engines: 1-based, first occurrence (DuckDB yields NULL when
    // absent vs Spark's 0 — the corpus only probes present elements)
    alias("list_position") { case Seq(l, x) =>
      org.apache.spark.sql.catalyst.expressions.ArrayPosition(l, x)
    }
    alias("list_reverse") { case Seq(l) =>
      org.apache.spark.sql.catalyst.expressions.Reverse(l)
    }
    alias("list_transform") { case Seq(l, f: LambdaFunction) => ArrayTransform(l, f) }
    alias("list_filter") { case Seq(l, f: LambdaFunction) => ArrayFilter(l, f) }
    alias("arg_min") { case Seq(v, o) => MinBy(v, o) }
    alias("arg_max") { case Seq(v, o) => MaxBy(v, o) }
    alias("unnest") { case Seq(l) => Explode(l) }
    alias("quantile_cont") { case Seq(x, p) => new Percentile(x, p) }
    alias("array_to_string") { case Seq(l, sep) => ArrayJoin(l, sep, None) }
    alias("json_extract_string") { case Seq(j, p) => GetJsonObject(j, p) }
    // DuckDB ord(): codepoint of the first character — Spark's ascii()
    // (equal on the single-char ASCII probes the corpus feeds it)
    alias("ord") { case Seq(s) =>
      org.apache.spark.sql.catalyst.expressions.Ascii(s)
    }
    alias("list_contains") { case Seq(l, x) =>
      org.apache.spark.sql.catalyst.expressions.ArrayContains(l, x)
    }
    alias("list_sort") { case Seq(l) =>
      org.apache.spark.sql.catalyst.expressions.SortArray(l, Literal(true))
    }
    alias("list_prepend") { case Seq(x, l) =>
      org.apache.spark.sql.catalyst.expressions.ArrayPrepend(l, x)
    }
    // DuckDB regexp_matches(s, p): true when the regex matches ANYWHERE —
    // exactly Spark's RLIKE (not regexp_full_match semantics)
    alias("regexp_matches") { case Seq(s, p) =>
      org.apache.spark.sql.catalyst.expressions.RLike(s, p)
    }
    // DuckDB error(msg): throw — Spark's raise_error
    alias("error") { case Seq(m) =>
      org.apache.spark.sql.catalyst.expressions.RaiseError(
        org.apache.spark.sql.catalyst.expressions.Cast(
          m, org.apache.spark.sql.types.StringType))
    }
    // DuckDB list_reduce(l, f): NO initial value — the first element seeds
    // the fold over the rest. Spark's aggregate() demands a zero; build
    //   aggregate(slice(l, 2, size(l) - 1), l[1], f)
    alias("list_reduce") { case Seq(l, f: LambdaFunction) =>
      import org.apache.spark.sql.catalyst.expressions.{ElementAt, Size, Slice}
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      ArrayAggregate(
        Slice(l, Literal(2), Subtract(Size(l, legacySizeOfNull = false), Literal(1))),
        ElementAt(l, Literal(1)),
        f,
        LambdaFunction(fin, Seq(fin)))
    }
    // DuckDB list(x) aggregate = collect_list (input order; statements
    // relying on a SPECIFIC order use `list(x ORDER BY y)`, which is a
    // parser-level construct Spark lacks — those need a hand override)
    alias("list") { case Seq(x) =>
      org.apache.spark.sql.catalyst.expressions.aggregate.CollectList(x)
    }
    // DuckDB len() works on strings AND lists — dispatch on the resolved
    // child type (GraftLen below)
    alias("len") { case Seq(x) => GraftLen(x) }
    // scalar generate_series(a, b): INCLUSIVE ascending list (DuckDB); an
    // empty-range call (a > b) would descend in Spark's sequence — the
    // corpus never emits one, and the guard would need type plumbing
    alias("generate_series") {
      case Seq(a, b) => new Sequence(a, b)
      // inclusive end with an explicit step (e.g. INTERVAL '1 hour') —
      // both engines include the end when the step lands on it
      case Seq(a, b, s) => Sequence(a, b, Some(s))
    }
    // DuckDB list_slice(l, a, b): 1-based INCLUSIVE bounds → Spark's
    // slice(l, start, length)
    alias("list_slice") { case Seq(l, a, b) =>
      org.apache.spark.sql.catalyst.expressions.Slice(
        l, a, Add(Subtract(b, a), Literal(1)))
    }
    // DuckDB time_bucket(INTERVAL, ts): epoch-aligned flooring (DuckDB's
    // default origin 2000-01-03 00:00 is itself epoch-aligned for the
    // whole-minute buckets the corpus uses). Interval must be a literal.
    alias("time_bucket") { case Seq(Literal(us: java.lang.Long,
        _: org.apache.spark.sql.types.DayTimeIntervalType), ts) =>
      val t = org.apache.spark.sql.catalyst.expressions.UnixMicros(
        org.apache.spark.sql.catalyst.expressions.Cast(
          ts, org.apache.spark.sql.types.TimestampType))
      org.apache.spark.sql.catalyst.expressions.MicrosToTimestamp(
        Subtract(t, org.apache.spark.sql.catalyst.expressions.Pmod(
          t, Literal(us.longValue()))))
    }
    // DuckDB epoch_us(ts): µs since epoch. Cast first so TIMESTAMP_NTZ
    // inputs (raw parquet views) resolve — the session zone is UTC
    // everywhere in this engine, so NTZ→TZ is value-preserving
    alias("epoch_us") { case Seq(x) =>
      org.apache.spark.sql.catalyst.expressions.UnixMicros(
        org.apache.spark.sql.catalyst.expressions.Cast(
          x, org.apache.spark.sql.types.TimestampType))
    }
    // hex-string → BIGINT (the dialect bridge rewrites DuckDB's
    // ('0x' || hex)::BIGINT idiom to hex_to_long(hex); Spark's CAST does
    // not parse 0x-prefixed strings, conv() is its hex decoder)
    alias("hex_to_long") { case Seq(s) =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Conv(
          s, Literal(16), Literal(10)),
        org.apache.spark.sql.types.LongType)
    }
    // DuckDB scalar range(): EXCLUSIVE end — range(n) = [0, n), range(a, b)
    // = [a, b), range(a, b, s) steps by s below b. Same empty-range caveat
    // as generate_series above.
    alias("range") {
      case Seq(n) => new Sequence(Literal(0L), Subtract(n, Literal(1)))
      case Seq(a, b) => new Sequence(a, Subtract(b, Literal(1)))
      case Seq(a, b, s) => Sequence(a, Subtract(b, Literal(1)), Some(s))
    }
    // table-valued generate_series(a, b) — `FROM generate_series(5, 9) t(x)`
    ext.injectTableFunction((
      FunctionIdentifier("generate_series"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "generate_series"),
      (args: Seq[Expression]) => args match {
        case Seq(Literal(a: Integer, _), Literal(b: Integer, _)) =>
          org.apache.spark.sql.catalyst.plans.logical.Range(
            a.longValue(), b.longValue() + 1L, 1L, None)
        case _ => throw new IllegalArgumentException(
          "generate_series table function needs two integer literals")
      }))
  }
}

/** DuckDB-compat `len()`: length for strings, size for lists — the
  * dispatch happens at analysis time on the resolved child type
  * (RuntimeReplaceable, so execution sees the plain Spark expression). */
case class GraftLen(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: org.apache.spark.sql.types.ArrayType =>
      org.apache.spark.sql.catalyst.expressions.Size(child, legacySizeOfNull = false)
    case _ => org.apache.spark.sql.catalyst.expressions.Length(child)
  }
  override def prettyName: String = "len"
  override protected def withNewChildInternal(newChild: Expression): GraftLen =
    copy(child = newChild)
}
