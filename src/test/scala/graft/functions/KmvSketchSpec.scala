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

  test("intersection vote: under-full union sketch degrades to exact " +
    "set arithmetic; a known overlap estimates within sketch error") {
    import spark.implicits._
    def sketch(ids: Seq[Long], k: Int): Set[Long] = {
      val hashed = ids.toDF("id")
        .select(KmvSketch.uniformize(GraftFunctions.polyHash(
          col("id").cast("string"))).as("h"))
        .agg(KmvSketch.kmvSketchAgg(col("h"), k).as("sk"))
        .select(explode(col("sk")).as("h"))
      hashed.collect().map(_.getLong(0)).toSet
    }
    // two 40-element sets sharing 20: under k=64 both sketches are
    // the full sets, so the membership vote IS the intersection
    val a = (0L until 40L)
    val b = (20L until 60L)
    val ska = sketch(a, 64); val skb = sketch(b, 64)
    val union = (ska ++ skb).toSeq.sorted.take(64).toSet
    val c = union.count(h => ska(h) && skb(h))
    assert(c == 20, s"exact-regime vote must equal the overlap: $c")
    // 2000-vs-2000 with 1000 shared, k=64: the rho vote lands within
    // 4 SDs of the true Jaccard 1/3 (deterministic hash - this is a
    // fixed number, the bound just documents the magnitude)
    val bigA = (0L until 2000L)
    val bigB = (1000L until 3000L)
    val sa = sketch(bigA, 64); val sb = sketch(bigB, 64)
    val uk = (sa ++ sb).toSeq.sorted.take(64)
    val rho = uk.count(h => sa(h) && sb(h)).toDouble / 64.0
    val sd = math.sqrt(1.0 / 3.0 * (2.0 / 3.0) / 64.0)
    assert(math.abs(rho - 1.0 / 3.0) < 4 * sd,
      s"rho $rho too far from 1/3")
  }
}
