package graft

import graft.expr.{Cusum, DotProduct, Ewma}
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
