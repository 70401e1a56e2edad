package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SketchesSpec extends SparkSpecBase {

  test("cms: estimates never undercount, and a wide sketch over few " +
    "keys is exact") {
    import spark.implicits._
    // 5 distinct keys, width 1024: collision-free with overwhelming
    // certainty for THIS fixed hash family (deterministic, checked by
    // the assertion itself) -> every estimate equals the truth
    val items = Seq.tabulate(100)(i => s"k${i % 5}").toDF("w")
    val out = Sketches.cmsHeavyHitterAudit(items, col("w"), k = 5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("c_true"), r.getAs[Long]("c_est"),
          r.getAs[Long]("overcount"))).toMap
    assert(out.size == 5)
    out.foreach { case (w, (t, e, o)) =>
      assert(t == 20L, s"$w true $t")
      assert(e == t && o == 0L, s"$w must be collision-free: est $e")
    }
    // narrow sketch (width 16) over 200 keys: collisions are forced,
    // but the one-sided bound must hold for every key
    val many = Seq.tabulate(2000)(i => s"t${i % 200}").toDF("w")
    val tight = Sketches.cmsHeavyHitterAudit(many, col("w"),
      k = 50, width = 16)
      .collect()
    assert(tight.length == 50)
    tight.foreach { r =>
      assert(r.getAs[Long]("c_est") >= r.getAs[Long]("c_true"),
        s"CMS undercounted: $r")
    }
  }

  test("cms: shard states merge to the whole-input state cell for " +
    "cell (the tree-reduce contract)") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i => (s"w${i % 30}", i.toLong))
      .toDF("w", "id")
    def state(d: org.apache.spark.sql.DataFrame) = {
      val keyed = d.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .select(Dedup.polyHash(col("w")).as("h"), col("c"))
      Sketches.cmsState(keyed, col("h"), col("c"), width = 64)
    }
    val a = state(df.filter(col("id") % 2 === 0))
    val b = state(df.filter(col("id") % 2 === 1))
    val merged = Sketches.cmsMerge(a, b)
    val whole = state(df)
    def asMap(s: org.apache.spark.sql.DataFrame) =
      s.collect().map(r => (r.getAs[Int]("__row"),
        r.getAs[Long]("__bucket")) -> r.getAs[Long]("__cnt")).toMap
    assert(asMap(merged) == asMap(whole))
  }
}
