package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class HllSketchSpec extends SparkSpecBase {

  private def hashed(n: Int, distinct: Int) =
    spark.range(n)
      .select(md5(pmod(col("id") * 37L, lit(distinct.toLong))
        .cast("string").cast("binary")).as("v"))
      .select(lit("g").as("grp"),
        KmvSketch.uniformize(GraftFunctions.polyHash(col("v"))).as("h"))

  test("rho: hand-pinned register ranks from the bin-length identity") {
    import spark.implicits._
    // h = j alone (window 0) saturates at 23; h = 256·w has
    // rho = 23 − bitlength(w)
    val rows = Seq(5L, 256L, 256L * 5, 256L * (1L << 21)).toDF("h")
      .select(HllSketch.bucket(col("h")).as("j"),
        HllSketch.rho(col("h")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(0) == (5L, 23L))  // w = 0
    assert(rows(1) == (0L, 22L))  // w = 1, bin "1"
    assert(rows(2) == (0L, 20L))  // w = 5, bin "101"
    assert(rows(3) == (0L, 1L))   // w = 2^21, bitlength 22
  }

  test("registers merge by per-register max: the folded global frame " +
    "equals the registers of the union") {
    import spark.implicits._
    val df = spark.range(4000)
      .select(md5(col("id").cast("string").cast("binary")).as("v"),
        (col("id") % 4).cast("string").as("grp"))
      .select(col("grp"),
        KmvSketch.uniformize(GraftFunctions.polyHash(col("v"))).as("h"))
    val perGroup = HllSketch.registers(df, col("grp"), col("h"))
    val merged = perGroup.groupBy(col("j")).agg(max(col("m")).as("m"))
      .select(col("j"), col("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = HllSketch
      .registers(df, lit("all"), col("h"))
      .select(col("j"), col("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == direct)
  }

  test("raw branch: estimate within 20% of 5000 distincts") {
    val regs = HllSketch.registers(hashed(20000, 5000),
      col("grp"), col("h"))
    val r = HllSketch.estimate(regs).collect()(0)
    val est = r.getDouble(3)
    assert(est > 5000 * 0.8 && est < 5000 * 1.2, s"estimate $est")
  }

  test("linear-counting branch fires on a sparse register file and " +
    "lands near the exact count") {
    val regs = HllSketch.registers(hashed(500, 40), col("grp"), col("h"))
    val r = HllSketch.estimate(regs).collect()(0)
    val nOcc = r.getLong(1)
    val est = r.getDouble(3)
    // 40 keys occupy ≤ 40 of 256 registers → raw < 640 → linear branch
    assert(nOcc <= 40L)
    val v = 256L - nOcc
    val expect = math.rint(256.0 * math.log(256.0 / v) * 1e6) / 1e6
    assert(est == expect, s"est $est vs linear-count $expect")
    assert(est > 40 * 0.7 && est < 40 * 1.3, s"estimate $est vs 40")
  }

  test("zsum is the exact dyadic integer: one key pins it") {
    import spark.implicits._
    val one = Seq(("g", 256L * 5)).toDF("grp", "h") // rho = 20, j = 0
    val regs = HllSketch.registers(one, col("grp"), col("h"))
    val r = HllSketch.estimate(regs).collect()(0)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == (1L << 3) + 255L * (1L << 23))
  }
}
