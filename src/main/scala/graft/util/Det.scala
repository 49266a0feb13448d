package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for DuckDB-oracle parity.
  *
  * Doubles summed across partitions are order-dependent; the oracle
  * compare hashes values, so money/quantity aggregates are computed in
  * exact integer cents: `floor(x*100 + 0.5)` is a pure IEEE-double op
  * sequence that is bit-identical in Spark and DuckDB, and LONG sums are
  * associative (exact). Distances are rounded to 6 dp after computing in
  * double. Outputs avoid raw timestamps (Spark writes instant-adjusted
  * parquet, DuckDB naive) — use dates or epoch seconds.
  */
object Det {
  /** x (double) → exact integer cents, bit-identical to
    * `CAST(floor(x*100+0.5) AS BIGINT)` in DuckDB. */
  def cents(c: Column): Column = floor(c * lit(100) + lit(0.5)).cast("long")

  /** SQL fragment mirroring [[cents]]. */
  def centsSql(expr: String): String = s"CAST(floor(($expr)*100+0.5) AS BIGINT)"

  /** Round a double column to 6 dp (distance outputs). */
  def r6(c: Column): Column = round(c, 6)

  /** Typed integral division (SQL `a div b` — Catalyst `IntegralDivide`,
    * always LONG). `call_function` resolves the registered "div" function
    * without string parsing, so call sites stay typed columns. */
  def idiv(a: Column, b: Column): Column = call_function("div", a, b)
  def idiv(a: Column, b: Long): Column = idiv(a, lit(b))

  /** Typed shiftleft where the shift amount is itself a Column (the
    * `functions.shiftleft` overload only takes a literal Int). */
  def shl(a: Column, b: Column): Column = call_function("shiftleft", a, b)

  /** Avalanche hash-coin over an integer id — the ORDER-FREE
    * deterministic sampling rank for "pick a representative subset"
    * decisions (nng entry points, IVF seeds): rank by this then cut,
    * and the selected set depends only on id VALUES, never on corpus
    * layout — unlike `vec_id < k` or `orderBy(id).limit(k)`, which
    * select whatever the ingest happened to write first (at 100 TB
    * "the first k ids" is an arbitrary, possibly one-source slice).
    * Same bounded two-round multiply-xor mixer as the LSH planes
    * (every intermediate < 2^62, so DuckDB BIGINT replays it
    * bit-for-bit); the input is salted (id·31 + 7) so the stream is
    * distinct from the init-offset mixer's (src·K + j) domain. */
  def hashCoin(id: Column): Column = {
    val x0 = (id * 31L + 7L) % 2147483648L
    val h1 = (x0 * 2654435761L) % 2147483648L
    val h2 = (h1.bitwiseXOR(shiftright(h1, 16)) * 2246822519L) % 2147483648L
    h2.bitwiseXOR(shiftright(h2, 13))
  }

  /** Driver/test-side mirror of [[hashCoin]] on a plain Long — used by
    * specs that re-derive a hash-coin seed pick independently and by
    * bounded driver-side rank checks. All intermediates stay in
    * [0, 2^31) for non-negative ids, so `>>` (arithmetic) and DuckDB's
    * `//` floor division agree with Spark's shiftright. */
  def hashCoinLong(id: Long): Long = {
    require(id >= 0L, s"hashCoinLong expects a non-negative id, got $id")
    val x0 = (id * 31L + 7L) % 2147483648L
    val h1 = (x0 * 2654435761L) % 2147483648L
    val h2 = ((h1 ^ (h1 >> 16)) * 2246822519L) % 2147483648L
    h2 ^ (h2 >> 13)
  }

  /** SQL mirror of [[hashCoin]] as one scalar expression (`expr` is
    * textually repeated — fine on the id-sized frames this ranks). */
  def hashCoinSql(expr: String): String = {
    val h1 = s"((((($expr) * 31 + 7) % 2147483648) * 2654435761) % 2147483648)"
    val h2 = s"((xor($h1, $h1 // 65536) * 2246822519) % 2147483648)"
    s"xor($h2, $h2 // 8192)"
  }

  /** Optimizer barrier for an expensive computed column that downstream
    * code references many times (esp. inside higher-order-function
    * lambdas). CollapseProject inlines plain `Project` aliases into every
    * reference — including through Filter and RepartitionByExpression —
    * turning an O(len) tokenize into O(len·refs). Wrapping the expression
    * in a single-element explode puts a `Generate` node in the plan, which
    * projections cannot collapse across, so the value is computed exactly
    * once per row. Zero shuffle, negligible overhead. */
  def materializedColumn(df: org.apache.spark.sql.DataFrame, name: String, c: Column): org.apache.spark.sql.DataFrame =
    df.withColumn(name, explode(array(c)))
}
