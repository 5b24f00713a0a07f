package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable standard-normal CDF for DATA-DEPENDENT arguments —
  * the piece the sequential-monitoring readouts (conditional power,
  * B-values) need in-engine, where the frozen-literal discipline of
  * the boundary solvers (AlphaSpending — driver-side, data-free)
  * cannot apply.
  *
  * Libm's erf/erfc differ by last-ulp across engines, so Φ is instead
  * the Abramowitz-Stegun 26.2.17 rational approximation: only +, ·, /
  * (IEEE-exact single operations in a FIXED order the SQL mirror
  * repeats verbatim) and ONE exp — the one libm call the codebase
  * already trusts cross-engine under a round(6) readout (the
  * Nelson-Aalen survival precedent, Events.scala:926). |ε| < 7.5e-8
  * absolute — two decades under the 5e-7 half-ulp of a 6-decimal
  * readout; and because BOTH engines evaluate the SAME polynomial,
  * approximation error cannot split a hash, only (absent) bitwise
  * divergence could.
  *
  * The x<0 branch routes through Φ(−x) (the standard reflection —
  * 26.2.17 is stated for x ≥ 0), with the branch predicate on the raw
  * double so both engines take the same arm.
  */
object Normal {
  private val P = 0.2316419
  private val B1 = 0.319381530
  private val B2 = -0.356563782
  private val B3 = 1.781477937
  private val B4 = -1.821255978
  private val B5 = 1.330274429
  private val InvSqrt2Pi = 0.3989422804014327 // 1/sqrt(2*pi), frozen literal

  /** Φ(x) for x ≥ 0 — Horner order pinned: ((((b5·t + b4)·t + b3)·t
    * + b2)·t + b1)·t.
    */
  private def cdfPos(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(P) * x)
    val poly = ((((lit(B5) * t + lit(B4)) * t + lit(B3)) * t + lit(B2)) * t
      + lit(B1)) * t
    lit(1.0) - lit(InvSqrt2Pi) * exp(lit(-0.5) * x * x) * poly
  }

  def cdf(x: Column): Column =
    when(x >= 0.0, cdfPos(x)).otherwise(lit(1.0) - cdfPos(lit(0.0) - x))

  /** DuckDB mirror of [[cdf]] — same constants, same Horner order,
    * same reflection branch. `x` must be a (pure) SQL expression; it
    * is textually repeated, so pass a column or a cheap arithmetic
    * expression, never a subquery.
    */
  def cdfSql(x: String): String = {
    def pos(v: String): String = {
      val t = s"(1e0 / (1e0 + $P * $v))"
      val poly = s"((((($B5 * $t + ($B4)) * $t + $B3) * $t + ($B2)) * $t + $B1) * $t)"
      s"(1e0 - $InvSqrt2Pi * EXP(-0.5 * $v * $v) * $poly)"
    }
    s"(CASE WHEN $x >= 0e0 THEN ${pos(x)} ELSE (1e0 - ${pos(s"(0e0 - $x)")}) END)"
  }
}
