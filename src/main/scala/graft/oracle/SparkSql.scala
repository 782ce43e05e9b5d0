package graft.oracle

/** Spark-dialect SQL surface for the registered queries.
  *
  * The oracle statements in [[OracleSql]]/[[TextSimSql]] are written for
  * DuckDB (the cross-engine correctness gate). Most of them are ANSI
  * enough to run on `spark.sql` unchanged; the rest differ only in
  * PARSER-level tokens (DuckDB's bare `VARCHAR`, the `//` integer-division
  * operator, `IGNORE NULLS` inside the call parens) or in routine NAMES
  * (`epoch_us` vs `unix_micros`). [[dialect]] bridges exactly those
  * mechanical gaps, so one statement text serves both engines; queries
  * whose oracle uses genuinely DuckDB-only constructs (list literals,
  * in-aggregate ORDER BY, recursive-CTE replays of window recurrences)
  * get a hand-written Spark statement in [[overrides]] instead.
  *
  * The contract for every statement this object serves: byte-for-byte
  * value equality with the registered DataFrame plan, enforced by
  * SqlParitySpec over the curated [[SqlParity.covered]] list — a SQL user
  * and a DataFrame user of the engine get the same rows.
  */
object SparkSql {

  /** Mechanical DuckDB→Spark dialect bridge. Every rule is a parser-level
    * or routine-name substitution with identical semantics on the oracle
    * corpus (value equality is separately enforced per query by
    * SqlParitySpec — a rule that ever changed a value would fail there):
    *  - `AS MATERIALIZED` — DuckDB CTE-inlining hint, semantically void.
    *  - bare `VARCHAR` — Spark's parser demands a length; STRING is the
    *    same type.
    *  - `epoch_us(ts)` → `unix_micros(ts)` — same µs-since-epoch (the
    *    session zone is UTC everywhere in this engine).
    *  - ` // ` → ` div ` — integer division operator.
    *  - `x IGNORE NULLS)` → `x) IGNORE NULLS` — same window modifier,
    *    Spark wants it outside the call parens.
    */
  def dialect(sql: String): String = sql
    .replace(" AS MATERIALIZED (", " AS (")
    .replace(" AS VARCHAR)", " AS STRING)")
    .replace("epoch_us(", "unix_micros(")
    .replace(" // ", " div ")
    .replace(" IGNORE NULLS)", ") IGNORE NULLS")

  /** Hand-written Spark statements for queries whose oracle text uses
    * DuckDB-only constructs. Keyed by registry name; each must produce
    * the registered DataFrame plan's rows exactly. */
  val overrides: Map[String, String] = Map.empty

  /** The Spark-dialect statement for a registry query: the override when
    * one exists, else the dialect-bridged oracle text. */
  def statement(name: String): Option[String] =
    overrides.get(name)
      .orElse(graft.SparkEntry.oracleSql.get(name).map(dialect))
}
