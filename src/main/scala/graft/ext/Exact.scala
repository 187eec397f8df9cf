package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact cross-row folds for bounded doubles — the round-11 q196
  * doctrine: ZERO unordered float folds may reach a rounded output
  * cell. A mean/sum over doubles is thread-schedule-dependent at the
  * ULP level in BOTH engines (DuckDB's own parallel AVG flipped
  * q196's 6th decimal run-to-run at sf0.1 — flake artifact, round
  * 11), so any such fold whose result lands on a round(6) grid is a
  * latent gate flake. The fix is the q266 nanoMean pattern, shared
  * here: snap each term to the 1e-9 grid (three decimal orders below
  * the 1e-6 output grid — semantics unchanged away from measure-zero
  * boundaries), fold EXACT BIGINTs (associative, order-free), and
  * divide/round once at the edge.
  *
  * Overflow budget: |term| ≤ T over n rows needs T·n < 9.2e9 (the
  * int64 ceiling at 1e-9 grid) — all current uses are O(100)-bounded
  * terms over ≤ 1e6 rows. At 1000× the rows, drop the grid to 1e6
  * (micro) or widen to Spark DECIMAL / DuckDB HUGEINT internally; the
  * output contract is unchanged.
  */
object Exact {

  /** Σ round(c·1e9) as an exact BIGINT — integer nano-units. */
  def sum9(c: Column): Column =
    sum(round(c * 1e9, 0).cast("long"))

  /** Σ round(c·grid) as an exact BIGINT — for terms too large for the
    * nano grid (pick the coarsest grid whose quantization error stays
    * ≥3 orders below the output rounding; budget |term|·grid·n <
    * 9.2e18 AND |term|·grid < 2^53, the round()-through-double
    * ceiling). */
  def sumG(c: Column, grid: Double): Column =
    sum(round(c * grid, 0).cast("long"))

  def sumGSql(expr: String, grid: String): String =
    s"CAST(SUM(CAST(round(($expr) * $grid) AS BIGINT)) AS BIGINT)"

  /** Σ round(c·grid) folded as exact DECIMAL(38,0) — for budgets past
    * the int64 sum ceiling (Spark sum(long) WRAPS silently there while
    * DuckDB promotes to HUGEINT and errors on the cast back — a
    * cross-engine divergence at exactly the documented bound). The
    * per-row quantization still requires |term|·grid < 2^53 so the
    * double-side round() is exact; the FOLD is unbounded to 38 digits
    * and order-free on both engines. Cast to double once at the edge. */
  def sumGDec(c: Column, grid: Double): Column =
    sum(round(c * grid, 0).cast("decimal(38,0)"))

  def sumGDecSql(expr: String, grid: String): String =
    s"SUM(CAST(round(($expr) * $grid) AS DECIMAL(38,0)))"

  /** Mean of a bounded double column, rounded to 6 dp, with no
    * unordered float fold: integer nano-sum / count / 1e9.
    * PRECONDITION: `c` is non-null on every row — the divisor is
    * count(*), not count(c), so on a nullable column this is NOT the
    * AVG it replaces (sum skips nulls, the divisor would not). Every
    * current call site feeds a computed non-null expression; if a
    * nullable column ever needs this, filter or coalesce it first. */
  def mean9(c: Column): Column =
    round(sum9(c).cast("double") / count(lit(1)).cast("double") / 1e9, 6)

  /** The DuckDB twins of [[sum9]]/[[mean9]] — interpolate with the
    * SAME expression text both engines evaluate per row. */
  def sum9Sql(expr: String): String =
    s"CAST(SUM(CAST(round(($expr) * 1e9) AS BIGINT)) AS BIGINT)"

  def mean9Sql(expr: String): String =
    s"round(CAST(${sum9Sql(expr)} AS DOUBLE) " +
      s"/ CAST(COUNT(*) AS DOUBLE) / 1e9, 6)"
}
