package graft

import org.scalatest.funsuite.AnyFunSuite

/** The signed-zero oracle rewrite (VERDICT r8 items 1–2): every
  * `round(...)` in oracle SQL must be wrapped so DuckDB can never emit
  * a bitwise `-0.0` where Spark's BigDecimal-backed `round` emits
  * `+0.0`. Pure string checks plus a JVM bit-level demonstration of
  * the class being closed on the engine side. */
class SignedZeroNormSpec extends AnyFunSuite {

  import Queries.signedZeroNorm

  test("wraps a simple round in the type-preserving CASE form") {
    val out = signedZeroNorm("SELECT round(x - y, 6) AS d FROM t")
    assert(out == "SELECT (CASE WHEN round(x - y, 6) = 0 THEN " +
      "0.0 ELSE round(x - y, 6) END) AS d FROM t")
  }

  test("handles nested parens and nested rounds innermost-first") {
    val out = signedZeroNorm("round(ln(a / (b + c)), 4)")
    assert(out.contains("round(ln(a / (b + c)), 4)"))
    assert(out.startsWith("(CASE WHEN "))
    val nested = signedZeroNorm("round(round(x, 8), 6)")
    // the inner round is itself wrapped inside the outer's argument
    assert(nested.contains("round((CASE WHEN round(x, 8) = 0"))
  }

  test("does not rewrite inside single-quoted literals or identifiers") {
    val lit = "SELECT regexp_replace(s, 'round(', '') FROM t"
    assert(signedZeroNorm(lit) == lit)
    val ident = "SELECT wround(x) FROM t" // word boundary required
    assert(signedZeroNorm(ident) == ident)
  }

  test("every published oracle has zero unwrapped round( calls") {
    // After normalization, each round( must sit inside the
    // "(CASE WHEN round(" / "ELSE round(" frame — i.e. every
    // emission point is guarded.
    Queries.oracleSql.foreach { case (k, sql) =>
      var i = sql.indexOf("round(")
      while (i >= 0) {
        val pre = sql.substring(math.max(0, i - 11), i)
        assert(pre.endsWith("CASE WHEN ") || pre.endsWith("ELSE "),
          s"$k: unguarded round( at offset $i: ...${pre}round(...")
        i = sql.indexOf("round(", i + 1)
      }
    }
  }

  test("the crafted tiny-negative case: JVM round emits +0.0 bitwise") {
    // Spark's Round goes through BigDecimal: a tiny negative that
    // rounds to zero loses its sign. This is the engine-side half of
    // the contract; the oracle-side half is the CASE-literal wrap
    // (DuckDB's abs(-0.0) is still -0.0, so the THEN branch emits the
    // literal 0.0 instead), checked end-to-end by the driver gate.
    val tiny = -3.2e-7
    val rounded = BigDecimal(tiny)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(java.lang.Double.doubleToRawLongBits(rounded) ==
      java.lang.Double.doubleToRawLongBits(0.0),
      "JVM BigDecimal round must yield +0.0, not -0.0")
    // and the raw IEEE fact the r8 failure hinged on:
    assert(java.lang.Double.doubleToRawLongBits(-0.0) !=
      java.lang.Double.doubleToRawLongBits(0.0))
    assert(math.abs(-0.0) == 0.0 &&
      java.lang.Double.doubleToRawLongBits(math.abs(-0.0)) ==
        java.lang.Double.doubleToRawLongBits(0.0))
  }
}
