package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

class MmdFoldSpec extends SparkSpecBase {

  private val dim = 8 // small lattice: 36 cells, hand-checkable scale

  /** The expression-fold reference: posexplode of the upper-triangle
    * lattice, round(p·10¹², 0) → div/% split, long sums — the shape
    * the DuckDB oracle replays. */
  private def explodeCells(df: org.apache.spark.sql.DataFrame) = {
    val tri = concat((0 until dim).map(i =>
      transform(slice(col("e"), i + 1, dim - i),
        x => element_at(col("e"), i + 1) * x)): _*)
    df.select(col("g"), posexplode(tri).as(Seq("k", "p")))
      .select(col("g"), col("k"),
        round(col("p") * lit(1e12), 0).cast(LongType).as("p12"))
      .groupBy(col("g"), col("k"))
      .agg(sum(expr("p12 div 1000000")).as("sh"),
        sum(col("p12") % 1000000L).as("sl"),
        count(lit(1)).as("n"))
  }

  test("mmdCellsAgg equals the explode fold cell for cell, across " +
      "partitionings (merge path covered)") {
    import spark.implicits._
    // deterministic pseudo-random vectors in [-1, 1], incl. values
    // whose products land near rounding boundaries
    val rows = (0 until 60).map { r =>
      val g = r % 3
      val e = (0 until dim).map(d =>
        math.sin(r * 37 + d * 11) * (if ((r + d) % 7 == 0) 1e-7 else 1.0))
      (g, e)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "e").repartition(parts)
        .select(col("g"), col("e").cast(ArrayType(DoubleType)).as("e"))
      val packed = df.groupBy(col("g"))
        .agg(MmdFold.mmdCellsAgg(col("e"), dim).as("x"))
        .select(col("g"), col("x.n").as("na"),
          posexplode(arrays_zip(col("x.sh").as("sh"),
            col("x.sl").as("sl"))).as(Seq("k", "c")))
        .select(col("g"), col("k"), col("c.sh").as("sh"),
          col("c.sl").as("sl"), col("na"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val ref = explodeCells(df).collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(packed.keySet == ref.keySet,
        s"cell key sets differ at parts=$parts")
      val bad = ref.collect {
        case (k, v) if packed(k) != v => (k, v, packed(k))
      }
      assert(bad.isEmpty,
        s"parts=$parts: ${bad.take(3).mkString("; ")}")
    }
  }

  test("addRow matches Spark round(double, 0) semantics on boundary " +
      "products (shortest-decimal HALF_UP, not floor(x+0.5))") {
    import spark.implicits._
    // products whose p·1e12 sits at/near .5 in shortest-decimal form
    val vs = Seq(0.5000000000005, -0.5000000000005, 0.9999999999995,
      1e-13, -1e-13, 0.25)
    val d2 = 2
    val df = vs.map(v => Seq(v, 0.0)).toDF("e")
      .select(lit(0).as("g"), col("e").cast(ArrayType(DoubleType)).as("e"))
    val viaAgg = df.groupBy(col("g"))
      .agg(MmdFold.mmdCellsAgg(col("e"), d2).as("x"))
      .select(col("x.sh").getItem(0), col("x.sl").getItem(0))
      .collect()(0)
    val tri = concat((0 until d2).map(i =>
      transform(slice(col("e"), i + 1, d2 - i),
        x => element_at(col("e"), i + 1) * x)): _*)
    val viaExpr = df.select(posexplode(tri).as(Seq("k", "p")))
      .filter(col("k") === 0)
      .select(round(col("p") * lit(1e12), 0).cast(LongType).as("p12"))
      .agg(sum(expr("p12 div 1000000")), sum(col("p12") % 1000000L))
      .collect()(0)
    assert(viaAgg.getLong(0) == viaExpr.getLong(0) &&
      viaAgg.getLong(1) == viaExpr.getLong(1),
      s"agg $viaAgg vs expr $viaExpr")
  }

  test("roundHalfUpToLong is bit-for-bit the BigDecimal shortest-" +
      "decimal HALF_UP round it replaced (adversarial + random)") {
    def ref(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    // exact half-integer ties (both signs, small and large), the
    // largest-double-below-.5 family, the (-1, 0) region where
    // x - floor(x) can round ONTO 0.5, magnitudes where binary
    // near-tie sums misround floor(x + 0.5), zeros, integral giants
    val adversarial = Seq(
      0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 3.5, -3.5,
      1e12 + 0.5, -(1e12 + 0.5), 4503599627370495.5,
      0.49999999999999994, -0.49999999999999994,
      -0.9999999999999999, 0.9999999999999999,
      -0.5000000000000001, 0.5000000000000001,
      1e12 + 0.49993896484375, -(1e12 + 0.49993896484375),
      0.0, -0.0, 1e-300, -1e-300, 1.0, -1.0,
      9.007199254740992e15, -9.007199254740992e15,
      123456789012345.5, -123456789012345.5)
    adversarial.foreach { x =>
      assert(MmdFold.roundHalfUpToLong(x) == ref(x),
        s"adversarial x=$x (bits ${java.lang.Double.doubleToLongBits(x)})")
    }
    val rnd = new scala.util.Random(20260819)
    (1 to 200000).foreach { _ =>
      // mix magnitudes across the lattice's realistic p·1e12 range
      val mag = math.pow(10, rnd.nextDouble() * 16 - 2)
      val x = (rnd.nextDouble() * 2 - 1) * mag
      assert(MmdFold.roundHalfUpToLong(x) == ref(x),
        s"random x=$x (bits ${java.lang.Double.doubleToLongBits(x)})")
      // and the exact-tie neighborhood at this magnitude
      val t = Math.floor(x) + 0.5
      if (t == Math.floor(t) + 0.5)
        assert(MmdFold.roundHalfUpToLong(t) == ref(t), s"tie x=$t")
    }
    // non-finite stays loud, as BigDecimal.valueOf did
    intercept[ArithmeticException](
      MmdFold.roundHalfUpToLong(Double.NaN))
    intercept[ArithmeticException](
      MmdFold.roundHalfUpToLong(Double.PositiveInfinity))
  }
}
