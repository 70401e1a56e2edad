package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class KmvSketchSpec extends SparkSpecBase {

  test("below k the sketch is the exact distinct count") {
    import spark.implicits._
    val df = (1 to 200).map(i => i % 50).toDF("v")
      .select(xxhash64(col("v")).as("h"))
    val r = df.agg(KmvSketch.kmvAgg(col("h"), 64).as("kmv"))
      .select(col("kmv.n"), KmvSketch.estimate(col("kmv"), 64, 1000000007L))
      .collect()(0)
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 50.0)
  }

  test("at or above k the sketch equals the sort-based formulation " +
    "regardless of partitioning") {
    import spark.implicits._
    // 5000 values, ~1200 distinct, hashed by the portable family
    val vals = spark.range(5000)
      .select(pmod(col("id") * 37L, lit(1201L)).cast("string").as("v"))
    val hashed = vals.select(
      KmvSketch.uniformize(GraftFunctions.polyHash(col("v"))).as("h"))
    val expected = hashed.distinct()
      .orderBy(col("h").asc).limit(64)
      .agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .collect()(0)
    for (parts <- Seq(1, 7, 32)) {
      val got = hashed.repartition(parts)
        .agg(KmvSketch.kmvAgg(col("h"), 64).as("kmv"))
        .select(col("kmv.n"), col("kmv.kth"))
        .collect()(0)
      assert(got.getLong(0) == 64L && expected.getLong(0) == 64L)
      assert(got.getLong(1) == expected.getLong(1), s"kth at parts=$parts")
    }
  }

  test("estimate is within 25% of truth at k=64 on 1201 distincts") {
    import spark.implicits._
    // md5 strings: polyHash of sequential short strings is lattice-
    // structured (equally spaced mod M), which biases the kth-minimum;
    // real corpus values behave like the mixed case
    val vals = spark.range(5000)
      .select(md5(pmod(col("id") * 37L, lit(1201L)).cast("string")
        .cast("binary")).as("v"))
    val est = vals.select(
      KmvSketch.uniformize(GraftFunctions.polyHash(col("v"))).as("h"))
      .agg(KmvSketch.kmvAgg(col("h"), 64).as("kmv"))
      .select(KmvSketch.estimate(col("kmv"), 64, 1000000007L))
      .collect()(0).getDouble(0)
    assert(est > 1201 * 0.75 && est < 1201 * 1.25, s"estimate $est")
  }

  test("mergeability: union-and-trim of group sketches equals the " +
    "sketch of the whole set") {
    import spark.implicits._
    val hashed = spark.range(5000)
      .select((col("id") % 10).as("g"),
        KmvSketch.uniformize(GraftFunctions.polyHash(
          pmod(col("id") * 37L, lit(1201L)).cast("string"))).as("h"))
    // merge per-group sketch ARRAYS relationally: explode → distinct →
    // 64 smallest — never re-reading the data
    val merged = hashed.groupBy(col("g"))
      .agg(KmvSketch.kmvSketchAgg(col("h"), 64).as("sk"))
      .select(explode(col("sk")).as("h")).distinct()
      .orderBy(col("h").asc).limit(64)
      .agg(count(lit(1)), max(col("h"))).collect()(0)
    val whole = hashed.agg(KmvSketch.kmvAgg(col("h"), 64).as("kmv"))
      .select(col("kmv.n"), col("kmv.kth")).collect()(0)
    assert(merged.getLong(0) == whole.getLong(0))
    assert(merged.getLong(1) == whole.getLong(1))
  }
}
