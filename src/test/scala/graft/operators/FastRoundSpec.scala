package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Pins `Guards.fastRound(x, s)` bit-for-bit to Catalyst's
  * `round(x, s)` — the proof obligation for swapping the catalog's
  * per-row dsum rounds onto the arithmetic fast path (the MmdFold
  * precedent). Adversarial set: exact decimal ties at every tested
  * scale (where HALF_UP direction is decided by the SHORTEST-DECIMAL
  * rendering, not the binary expansion), values one ulp either side
  * of ties, negatives, signed zeros, subnormals, huge magnitudes past
  * the 2^51 guard, NaN and ±Inf, plus a broad pseudo-random sweep
  * across magnitudes. */
class FastRoundSpec extends SparkSpecBase {

  private def adversarial(scale: Int): Seq[Double] = {
    val p = math.pow(10, scale)
    val base = Seq(0.0, -0.0, 1.0, -1.0, 0.5 / p, -0.5 / p,
      1.5 / p, -1.5 / p, 2.5 / p, -2.5 / p,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue,
      2.251799813685248e15, 2.2517998136852475e15, 4.5e15, 9.3e18,
      1e300, -1e300)
    // decimal ties k + 0.5 in scaled space, and one-ulp neighbors:
    // these are EXACTLY where shortest-decimal vs binary can disagree
    val ties = (0 until 400).flatMap { i =>
      val k = i * 37 + 3
      val t = (k + 0.5) / p
      Seq(t, -t, Math.nextUp(t), Math.nextDown(t),
        -Math.nextUp(t), -Math.nextDown(t))
    }
    // broad magnitude sweep, deterministic
    val sweep = (0 until 120000).map { i =>
      val m = math.sin(i * 0.7391) * math.pow(10, (i % 31) - 15)
      if (i % 17 == 0) -m else m
    }
    // values built FROM doubles whose shortest rendering ends in …5
    // at the (scale+1)-th digit (string-constructed, so the rendering
    // is pinned, not approximated)
    val rendered = (0 until 300).map { i =>
      val head = i * 13 + 7
      java.lang.Double.parseDouble(s"$head.${"1" * scale}5")
    }
    base ++ ties ++ sweep ++ rendered ++ rendered.map(-_)
  }

  for (scale <- Seq(0, 4, 6, 9, 12)) {
    test(s"fastRound(x, $scale) is bit-identical to round(x, $scale) " +
        "over adversarial and random values") {
      import spark.implicits._
      val df = adversarial(scale).toDF("x").repartition(7)
      val bad = df.select(col("x"),
          Guards.fastRound(col("x"), scale).as("fast"),
          round(col("x"), scale).as("ref"))
        // string rendering distinguishes -0.0/0.0 and NaN; <=> makes
        // the comparison total
        .filter(expr("not (cast(fast as string) <=> cast(ref as string))"))
        .collect()
      assert(bad.isEmpty,
        s"fastRound/round mismatch at scale=$scale: " +
          bad.take(10).mkString(", "))
    }
  }

  for ((scale, dt) <- Seq(
      (6, org.apache.spark.sql.types.DecimalType(18, 6)),
      (9, org.apache.spark.sql.types.DecimalType(28, 9)),
      (9, org.apache.spark.sql.types.DecimalType(18, 9)))) {
    test(s"fastRoundDec(x, $scale, $dt) is value- and null-identical " +
        s"to round(x, $scale).cast($dt)") {
      import spark.implicits._
      // values where the REFERENCE itself throws under ANSI (overflow
      // of dt, NaN/Inf decimal cast) are excluded: fastRoundDec routes
      // every one of them to the bit-identical reference expression
      // (they all fail the fast-path guard), so behavior there is
      // equal by construction, error included
      val lim = math.pow(10, dt.precision - dt.scale)
      val df = adversarial(scale)
        .filter(v => java.lang.Double.isFinite(v) && math.abs(v) < lim)
        .toDF("x").repartition(7)
      val bad = df.select(col("x"),
          Guards.fastRoundDec(col("x"), scale, dt).as("fast"),
          round(col("x"), scale).cast(dt).as("ref"))
        // decimal cast to string is scale-exact; <=> totalizes NULLs
        // (huge magnitudes overflow the target decimal to NULL)
        .filter(expr("not (cast(fast as string) <=> cast(ref as string))"))
        .collect()
      assert(bad.isEmpty,
        s"fastRoundDec mismatch at scale=$scale dt=$dt: " +
          bad.take(10).mkString(", "))
    }
  }

  for (dt <- Seq(
      org.apache.spark.sql.types.DecimalType(27, 12),
      org.apache.spark.sql.types.DecimalType(18, 6))) {
    test(s"fastCastDec(x, $dt) is value- and null-identical to " +
        s"x.cast($dt)") {
      import spark.implicits._
      val lim = math.pow(10, dt.precision - dt.scale)
      val df = adversarial(dt.scale)
        .filter(v => java.lang.Double.isFinite(v) && math.abs(v) < lim)
        .toDF("x").repartition(7)
      val bad = df.select(col("x"),
          Guards.fastCastDec(col("x"), dt).as("fast"),
          col("x").cast(dt).as("ref"))
        .filter(expr("not (cast(fast as string) <=> cast(ref as string))"))
        .collect()
      assert(bad.isEmpty,
        s"fastCastDec mismatch at dt=$dt: " + bad.take(10).mkString(", "))
    }
  }

  test("fastRound bit-compare on the driver against the BigDecimal " +
      "reference (exact doubleToLongBits, no SQL-cast canonicalization)") {
    import spark.implicits._
    val vals = Seq(4, 6, 9).flatMap(adversarial)
    for (scale <- Seq(4, 6, 9)) {
      val got = vals.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("i", "x")
        .select(col("i"), Guards.fastRound(col("x"), scale).as("f"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      vals.zipWithIndex.foreach { case (v, i) =>
        val ref =
          if (v.isNaN || v.isInfinite) v
          else java.math.BigDecimal.valueOf(v)
            .setScale(scale, java.math.RoundingMode.HALF_UP)
            .doubleValue()
        val f = got(i)
        assert(java.lang.Double.doubleToLongBits(f) ==
          java.lang.Double.doubleToLongBits(ref),
          s"scale=$scale x=$v fast=$f ref=$ref")
      }
    }
  }
}
